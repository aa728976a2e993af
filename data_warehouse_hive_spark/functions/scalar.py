"""Scalar function families — SURVEY.md §2.8 (HiveQL builtin library; every
family maps to same-name `pyspark.sql.functions` builtins, JVM-side inside
whole-stage codegen — never Python UDFs).

Cross-engine notes encoded below (each one is a real Spark↔DuckDB dialect
divergence handled explicitly):
  * DuckDB CAST(double AS INT) rounds; Spark truncates → oracle uses TRUNC.
  * DuckDB floor()/ceil() return DOUBLE; Spark return BIGINT → oracle casts.
  * DuckDB sign() returns INT for ints; Spark returns DOUBLE → cast both.
  * ln/log10 go through libm variants that may differ in the last ulp
    (JVM intrinsic vs glibc) → rounded to 9 decimals on both sides.
  * DuckDB has no pmod() → ((a % b) + b) % b in the oracle.
  * Spark date_format pattern 'yyyy-MM-dd' ≙ DuckDB strftime '%Y-%m-%d'.
  * Spark datediff(end, start) ≙ DuckDB date_diff('day', start, end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_hive_spark.registry import query
from data_warehouse_hive_spark.tables import t


@query(
    "q_fn_string",
    oracle=r"""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           lower(p_type) AS type_l,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substr(p_name, 1, 8) AS name_prefix,
           concat_ws('|', p_brand, p_type) AS brand_type,
           trim(concat(' ', p_name, ' ')) AS trimmed,
           regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, ' ', '_', 'g') AS snake_name,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           array_to_string(string_split(p_type, ' '), ',') AS type_words
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: concat/concat_ws, substr, upper/lower, trim, length,
    regexp_extract, regexp_replace, split, lpad."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.regexp_extract("p_brand", r"#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", " ", "_").alias("snake_name"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        # serialized (not raw array): collection cells are hostile to
        # cross-engine value-hash comparators — join to a scalar on both sides
        F.array_join(F.split("p_type", " "), ",").alias("type_words"),
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus_30d,
           strftime(CAST(o_orderdate AS DATE) - 7, '%Y-%m-%d') AS minus_7d,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract fields, date_add/sub, datediff, trunc,
    date_format, unix_timestamp.  Session timezone is pinned to UTC so
    epoch conversions agree with DuckDB's naive timestamps.  DATE-typed
    outputs are projected to ISO strings on BOTH sides: the two engines'
    pandas bridges represent DATE differently (datetime.date vs
    datetime64), which a value-hash comparator may not normalize."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus_30d"),
        F.date_format(F.date_sub(d.cast("date"), 7), "yyyy-MM-dd").alias("minus_7d"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).cast("long").alias(
            "days_to_y2k"
        ),
        F.date_format(F.trunc(d.cast("date"), "month"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
        F.unix_timestamp(d).alias("epoch_s"),
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT c_custkey,
           round(c_acctbal, 1) AS bal_r1,
           CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
           CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
           abs(c_acctbal - 5000.0) AS dist_from_5k,
           pow(CAST(c_nationkey AS DOUBLE), 2.0) AS nation_sq,
           sqrt(abs(c_acctbal)) AS bal_sqrt,
           round(ln(abs(c_acctbal) + 1.0), 9) AS bal_ln,
           round(log10(abs(c_acctbal) + 1.0), 9) AS bal_log10,
           ((CAST(c_custkey AS BIGINT) % 7) + 7) % 7 AS key_mod7,
           CAST(sign(c_acctbal - 5000.0) AS DOUBLE) AS bal_sign
    FROM customer
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round, floor, ceil, abs, pow, sqrt, ln, log10, pmod,
    sign (transcendentals rounded to 9 dp — see module docstring)."""
    c = t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.round(bal, 1).alias("bal_r1"),
        F.floor(bal).alias("bal_floor"),
        F.ceil(bal).alias("bal_ceil"),
        F.abs(bal - 5000.0).alias("dist_from_5k"),
        F.pow(F.col("c_nationkey").cast("double"), 2.0).alias("nation_sq"),
        F.sqrt(F.abs(bal)).alias("bal_sqrt"),
        F.round(F.log(F.abs(bal) + 1.0), 9).alias("bal_ln"),
        F.round(F.log10(F.abs(bal) + 1.0), 9).alias("bal_log10"),
        F.pmod(F.col("c_custkey"), F.lit(7)).alias("key_mod7"),
        F.signum(bal - 5000.0).alias("bal_sign"),
    )


@query(
    "q_fn_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(TRUNC(l_quantity) AS INT) AS qty_int,
           CAST(CAST(l_quantity AS DECIMAL(10,2)) AS DOUBLE) AS qty_dec,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_day,
           strftime(CAST(strftime(l_shipdate, '%Y-%m-%d') AS DATE), '%Y-%m-%d') AS ship_day_via_str
    FROM lineitem
    """,
)
def q_fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST matrix: double→int (truncating — DuckDB's rounding cast is
    neutralized with TRUNC in the oracle), double→decimal, int↔string,
    timestamp→date, string→date round-trip."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_quantity").cast("decimal(10,2)").cast("double").alias("qty_dec"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd").alias("ship_day"),
        F.date_format(
            F.to_date(F.date_format("l_shipdate", "yyyy-MM-dd")), "yyyy-MM-dd"
        ).alias("ship_day_via_str"),
    )


@query(
    "q_fn_array",
    oracle="""
    SELECT p_partkey,
           array_to_string(
             list_transform([CAST(p_size AS DOUBLE), p_retailprice],
                            x -> CAST(CAST(round(x * 100) AS BIGINT) AS VARCHAR)),
             ',') AS sz_price,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
           string_split(p_name, ' ')[1] AS first_word,
           array_contains(string_split(p_type, ' '), 'BRASS') AS is_brass,
           array_to_string(map_keys(MAP(['brand'], [p_brand])), ',') AS mk,
           array_to_string(map_values(MAP(['brand'], [p_brand])), ',') AS mv
    FROM part
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/map construction + access: array literal, size, element_at,
    array_contains, create_map (+keys/values — DuckDB map element access
    returns a list, so keys/values arrays are the portable comparison).

    Collection outputs are serialized to scalar strings on both engines:
    array cells break cross-engine value-hash comparators, and double
    formatting differs between engines, so doubles ride the exact
    cents-carrier (round(x*100) as int) before joining."""
    p = t(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    sz_price = F.array(F.col("p_size").cast("double"), F.col("p_retailprice"))
    return p.select(
        "p_partkey",
        F.array_join(
            F.transform(sz_price, lambda x: F.round(x * 100).cast("long").cast("string")),
            ",",
        ).alias("sz_price"),
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_contains(F.split("p_type", " "), "BRASS").alias("is_brass"),
        F.array_join(
            F.map_keys(F.create_map(F.lit("brand"), F.col("p_brand"))), ","
        ).alias("mk"),
        F.array_join(
            F.map_values(F.create_map(F.lit("brand"), F.col("p_brand"))), ","
        ).alias("mv"),
    )


@query(
    "q_fn_explode",
    oracle="""
    SELECT l.p_partkey, l.pos, l.word
    FROM (
      SELECT p.p_partkey,
             CAST(u.i AS INT) AS pos,
             u.w AS word
      FROM part p,
           LATERAL (SELECT unnest(string_split(p.p_name, ' ')) AS w,
                           unnest(range(len(string_split(p.p_name, ' ')))) AS i) u
    ) l
    """,
)
def q_fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW posexplode — one output row per array element with its
    position (Hive's posexplode ≙ Spark posexplode ≙ DuckDB zipped unnest)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
    )


@query(
    "q_fn_json",
    oracle="""
    SELECT event_id, event_type,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           (CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS k_high
    FROM events
    WHERE event_type IN ('click', 'purchase')
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON access over the events.props JSON-string column:
    get_json_object path extraction + typed cast (Hive's get_json_object /
    json_tuple surface)."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "event_type",
        k.alias("k_str"),
        k.cast("long").alias("k_num"),
        (k.cast("long") > 50).alias("k_high"),
    )


@query(
    "q_fn_explode_outer",
    oracle=r"""
    SELECT p.p_partkey, u.w AS brass_word
    FROM part p,
         LATERAL (SELECT unnest(
             CASE WHEN len(list_filter(string_split(p.p_type, ' '), x -> x = 'BRASS')) = 0
                  THEN [NULL]
                  ELSE list_filter(string_split(p.p_type, ' '), x -> x = 'BRASS') END
         ) AS w) u
    """,
)
def q_fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW OUTER explode: rows whose array is empty survive with
    a NULL element instead of disappearing — the semantic difference that
    silently drops data when plain explode is used on sparse arrays.
    (DuckDB has no OUTER unnest; the oracle pads empty lists with [NULL],
    which is exactly explode_outer's contract.)"""
    p = t(spark, sf_dir, "part")
    brass = F.filter(F.split("p_type", " "), lambda x: x == "BRASS")
    return p.select(
        "p_partkey", F.explode_outer(brass).alias("brass_word")
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           array_to_string(list_sort(list(l_linenumber)), ',')          AS linenumbers_all
    FROM (SELECT * FROM lineitem WHERE l_orderkey < 50) s
    GROUP BY l_returnflag
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set / collect_list (HiveQL array aggregation).  Collection
    order is partition-dependent, so both engines sort the arrays and then
    serialize them to a scalar string — sorting is the only deterministic
    contract for an array agg, and scalar cells are the only ones a
    cross-engine value-hash comparator can digest.  At scale an unbounded
    collect_list is a memory hazard; bound the group (as here) or prefer
    grouped aggregates."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 50)
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("l_linenumber")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("linenumbers_all"),
    )


@query(
    "q_fn_string2",
    oracle="""
    SELECT p_partkey,
           reverse(p_brand) AS brand_rev,
           repeat(p_brand, 2) AS brand_x2,
           CAST(instr(p_name, 'red') AS BIGINT) AS red_pos,
           replace(p_type, ' ', '-') AS type_dashed,
           left(p_name, 5) AS name_l5,
           right(p_name, 5) AS name_r5,
           CAST(levenshtein(p_brand, p_type) AS BIGINT) AS brand_type_dist
    FROM part
    WHERE p_partkey < 500
    """,
)
def q_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string family: reverse, repeat, instr/locate, replace,
    left/right, and levenshtein — the edit-distance primitive that powers
    bounded fuzzy matching (e.g. verifying near-dup candidates whose
    Jaccard is ambiguous)."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_brand", 2).alias("brand_x2"),
        F.instr("p_name", "red").cast("long").alias("red_pos"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("-")).alias("type_dashed"),
        F.substring("p_name", 1, 5).alias("name_l5"),
        F.col("p_name").substr(F.length("p_name") - 4, F.lit(5)).alias("name_r5"),
        F.levenshtein("p_brand", "p_type").cast("long").alias("brand_type_dist"),
    )


@query(
    "q_fn_bitwise",
    oracle="""
    SELECT l_orderkey,
           l_orderkey & 255 AS low_byte,
           l_orderkey | 4096 AS with_flag,
           xor(l_orderkey, l_partkey) AS key_xor,
           l_orderkey << 2 AS shl2,
           l_orderkey >> 3 AS shr3,
           CAST(bit_count(l_orderkey) AS INT) AS popcount
    FROM lineitem
    WHERE l_orderkey < 200
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor, shifts, popcount — exact integer ops,
    identical in every engine (used internally by the SimHash/LSH
    sketches; exposed here as user-facing surface)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("l_partkey")).alias("key_xor"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).alias("popcount"),
    )


@query(
    "q_fn_hash_struct",
    oracle="""
    SELECT s_suppkey,
           md5(s_name) AS name_md5,
           sha256(s_name) AS name_sha256,
           concat_ws(',',
                     CAST(({'k': s_suppkey, 'bal': s_acctbal}).k AS VARCHAR),
                     CAST(CAST(round(({'k': s_suppkey, 'bal': s_acctbal}).bal * 100) AS BIGINT) AS VARCHAR)
           ) AS info,
           ({'k': s_suppkey, 'bal': s_acctbal}).bal AS bal_via_struct
    FROM supplier
    """,
)
def q_fn_hash_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash functions (md5, sha256 — portable content addressing /
    fingerprint keys) + STRUCT construction and field access (named
    nested records, the HiveQL complex-type surface).

    The struct itself is projected as a canonical scalar string (field
    access → cents-carrier → concat): struct cells, like array cells, are
    unhashable to cross-engine value-hash comparators.  bal_via_struct
    stays a raw double — it is a parquet pass-through value, bit-identical
    in both engines."""
    s = t(spark, sf_dir, "supplier")
    info = F.struct(
        F.col("s_suppkey").alias("k"), F.col("s_acctbal").alias("bal")
    )
    return s.select(
        "s_suppkey",
        F.md5("s_name").alias("name_md5"),
        F.sha2("s_name", 256).alias("name_sha256"),
        F.concat_ws(
            ",",
            info.getField("k").cast("string"),
            F.round(info.getField("bal") * 100).cast("long").cast("string"),
        ).alias("info"),
        info.getField("bal").alias("bal_via_struct"),
    )


@query(
    "q_fn_interval",
    oracle="""
    SELECT event_id,
           ts + INTERVAL 90 MINUTE AS ts_plus_90m,
           ts - INTERVAL 1 DAY AS ts_minus_1d,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           CAST(hour(ts) AS INT) AS hr,
           CAST(minute(ts) AS INT) AS minu,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(weekofyear(ts) AS INT) AS woy
    FROM events
    """,
)
def q_fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL arithmetic + sub-day truncation + field extraction over
    event timestamps (the time surface q_fn_date leaves to dates).
    DuckDB's date_trunc('day') returns DATE, Spark returns TIMESTAMP —
    the oracle casts so both engines emit identical midnight instants."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 90 MINUTE")).alias("ts_plus_90m"),
        (F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("ts_minus_1d"),
        F.date_trunc("day", "ts").alias("day_start"),
        F.date_trunc("hour", "ts").alias("hour_start"),
        F.hour("ts").alias("hr"),
        F.minute("ts").alias("minu"),
        F.dayofyear("ts").alias("doy"),
        F.weekofyear("ts").alias("woy"),
    )


@query(
    "q_fn_json_typed",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k,
           (props IS NOT NULL AND json_valid(props)) AS parsed_ok
    FROM events
    """,
)
def q_fn_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parse — `from_json` with an explicit schema: ONE parse
    per row into a struct (the scalable path when several fields are
    consumed; get_json_object re-parses per extraction).  Malformed rows
    become NULL structs instead of errors — the parsed_ok flag is the
    schema-on-read quality gate a pipeline filters on."""
    e = t(spark, sf_dir, "events")
    parsed = F.from_json("props", "k LONG")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k"),
        (F.col("props").isNotNull() & parsed.isNotNull()).alias("parsed_ok"),
    )


@query(
    "q_fn_url",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             concat('https://', source, '.example.com/', lang, '/doc/',
                    CAST(doc_id AS VARCHAR), '?ref=', lang, '&page=',
                    CAST(doc_id % 7 AS VARCHAR)) AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref,
           regexp_extract(url, '^([a-z]+):', 1) AS protocol,
           concat(
             string_split(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1), '.')[-2],
             '.',
             string_split(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1), '.')[-1]
           ) AS reg_domain
    FROM u
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family — Hive/Spark `parse_url` (HOST, PATH, QUERY
    param, PROTOCOL) plus naive registrable-domain extraction (last two
    host labels), the per-domain grouping key every web-corpus pipeline
    aggregates on.

    URLs are synthesized deterministically from fixture columns (the
    fixtures carry no URL column); parse_url is a JVM builtin, and DuckDB
    has no counterpart so the oracle re-derives each part with anchored
    regexes — both sides see the identical strings.  Narrow map, zero
    shuffle at any scale.
    """
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
        F.lit("?ref="), F.col("lang"),
        F.lit("&page="), (F.col("doc_id") % 7).cast("string"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    labels = F.split(host, r"\.")
    return d.select(
        "doc_id",
        host.alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
        F.concat_ws(
            ".", F.element_at(labels, -2), F.element_at(labels, -1)
        ).alias("reg_domain"),
    )


@query(
    "q_fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_long,
           json_extract_string(props, '$.k') AS k_str,
           (json_extract(props, '$.missing') IS NULL) AS missing_is_null
    FROM events
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type (Spark 4): parse the JSON once into
    the binary VARIANT encoding, then do typed path extraction with
    `variant_get` — the shredded-JSON answer to get_json_object's
    parse-per-call (q_fn_json) and from_json's rigid upfront schema
    (q_fn_json_typed).  At 100 TB, VARIANT columns persist the parsed
    encoding in Parquet, so repeated extraction never re-tokenizes text;
    missing paths surface as NULL, not errors.

    DuckDB has no VARIANT — the oracle checks the same typed extractions
    through its JSON functions.
    """
    e = t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_long"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.missing", "bigint").isNull().alias("missing_is_null"),
    )


@query(
    "q_fn_collate",
    oracle="""
    WITH noisy AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
                  WHEN p_partkey % 3 = 0 THEN lower(p_brand)
                  ELSE p_brand END AS brand_noisy
      FROM part
    )
    SELECT min(brand_noisy) AS brand_repr,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT brand_noisy) AS n_case_variants
    FROM noisy
    GROUP BY lower(brand_noisy)
    """,
)
def q_fn_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collation support): group
    case-noisy brand strings under the UTF8_LCASE collation, so 'BRAND#1',
    'brand#1' and 'Brand#1' land in one group WITHOUT rewriting every
    comparison through lower() — the engine treats case-insensitivity as
    a property of the type, and every comparison, join, and group on the
    collated column inherits it.

    The oracle expresses the identical semantics via lower() grouping
    (DuckDB collations are connection-level, not per-expression).  Output
    keys are the deterministic min() representative; the raw
    case-variant count shows the collation actually collapsed anything.
    Same shuffle shape as any group-by — collation changes the
    comparator, not the plan.
    """
    noisy = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_brand"))
        .when(F.col("p_partkey") % 3 == 0, F.lower("p_brand"))
        .otherwise(F.col("p_brand"))
        .alias("brand_noisy"),
    )
    return (
        noisy.groupBy(F.collate("brand_noisy", "UTF8_LCASE").alias("gk"))
        .agg(
            F.min(F.col("brand_noisy").cast("string")).alias("brand_repr"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(F.col("brand_noisy").cast("string")).alias(
                "n_case_variants"
            ),
        )
        .drop("gk")
    )


@query(
    "q_fn_transform",
    oracle="""
    SELECT CAST(n_nationkey AS VARCHAR) AS key_str,
           n_name,
           CAST(n_nationkey AS INT) AS key_back
    FROM nation
    """,
)
def q_fn_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive TRANSFORM — the streaming-script escape hatch (`SELECT
    TRANSFORM (...) USING '<cmd>'`): rows are piped tab-separated through
    an external process per task and parsed back.  Exercised with the
    identity script (`cat`) over the 25-row nation dim so the surface is
    covered and value-checked.

    This is legacy parity, not a recommendation: one forked process per
    task, untyped text at the boundary, no vectorization.  The modern
    twin is the Arrow-batched pandas UDF surface (functions/udfs.py) —
    same custom-code capability at columnar speed.  Never put TRANSFORM
    on a 100 TB hot path.
    """
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_xform")
    return spark.sql(
        """
        SELECT key_str, n_name,
               CAST(key_str AS INT) AS key_back
        FROM (
          SELECT TRANSFORM (n_nationkey, n_name)
          USING 'cat' AS (key_str STRING, n_name STRING)
          FROM nation_xform
        )
        """
    )


@query(
    "q_fn_lambda",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           round(list_aggregate(
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5)
                                      AS BIGINT)),
             'sum') / 1e6, 6) AS elem_sum,
           round(CAST(list_aggregate(
             list_transform(embedding, x -> greatest(CAST(x AS DOUBLE), 0.0)),
             'max') AS DOUBLE), 6) AS max_relu,
           (len(list_filter(embedding, x -> x < -0.9)) > 0) AS any_strong_neg
    FROM embeddings
    """,
)
def q_fn_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as user surface — transform / filter /
    aggregate / exists lambdas over the embedding vectors: positive-count,
    carrier-exact element sum, ReLU max, strong-negative flag.  (The
    engine uses these internally for the similarity operators; this row
    makes the HOF family itself a checked capability.)

    HOF lambdas run interpreted (not codegen) — fine for metadata-sized
    arrays; for per-element math over long vectors at scale, the Arrow
    pandas-UDF twin wins (see brute_force_topk_arrow).  Element sums
    cross engines go through the scaled-long carrier exactly like column
    sums (float fold order is engine-private).
    """
    e = t(spark, sf_dir, "embeddings")
    emb = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(
            F.aggregate(
                F.transform(emb, lambda x: F.floor(x * 1e6 + 0.5).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            / 1e6,
            6,
        ).alias("elem_sum"),
        F.round(
            F.aggregate(
                F.transform(emb, lambda x: F.greatest(x, F.lit(0.0))),
                F.lit(0.0),
                lambda acc, v: F.greatest(acc, v),
            ),
            6,
        ).alias("max_relu"),
        F.exists(emb, lambda x: x < -0.9).alias("any_strong_neg"),
    )


@query(
    "q_fn_try",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(p_name AS INT) AS name_as_int,
           TRY_CAST(CASE WHEN p_size < 10 THEN CAST(p_size AS VARCHAR)
                         ELSE p_name END AS INT) AS mixed_to_int,
           CASE WHEN (p_partkey % 5) = 0 THEN NULL
                ELSE CAST(p_retailprice AS DOUBLE) / (p_partkey % 5) END
             AS safe_div,
           CASE WHEN p_size >= 0 THEN CAST(p_size AS SMALLINT) END
             AS size_small
    FROM part
    """,
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe `try_*` family: Spark 4 runs ANSI mode by default, so a
    malformed cast or a divide-by-zero THROWS mid-job — at 100 TB that
    means one dirty row kills an hours-long pipeline at task 79,000.
    try_cast / try_divide turn those rows into NULLs to quarantine
    downstream (the row-level twin of PERMISSIVE ingest): non-numeric
    strings → NULL, mixed column best-effort cast, zero-denominator
    division → NULL, in-range narrowing cast.

    DuckDB has TRY_CAST but no try_divide — the oracle guards the
    denominator with CASE, same semantics.
    """
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").try_cast("int").alias("name_as_int"),
        F.when(F.col("p_size") < 10, F.col("p_size").cast("string"))
        .otherwise(F.col("p_name"))
        .try_cast("int")
        .alias("mixed_to_int"),
        F.try_divide(
            F.col("p_retailprice"), (F.col("p_partkey") % 5).cast("double")
        ).alias("safe_div"),
        F.col("p_size").try_cast("smallint").alias("size_small"),
    )


@query(
    "q_fn_regex",
    oracle=r"""
    SELECT p_partkey,
           CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT)
             AS vowel_runs,
           regexp_extract(p_name, '[a-z]{5,}', 0) AS first_long_word,
           regexp_matches(p_type, 'BRUSHED|POLISHED') AS is_finished,
           regexp_extract(p_brand, '([0-9]+)$', 1) AS brand_suffix
    FROM part
    """,
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended regex family — regexp_count, regexp_substr (first match),
    regexp_like, anchored group extraction — the Spark 3.5+ builtins
    beyond the regexp_extract/replace pair already covered by
    q_fn_string.  Patterns stay in the Java-regex ∩ RE2 dialect (no
    lookarounds) so the oracle runs them verbatim.
    """
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_count("p_name", F.lit(r"[aeiou]+")).cast("long").alias(
            "vowel_runs"
        ),
        F.coalesce(
            F.regexp_substr("p_name", F.lit(r"[a-z]{5,}")), F.lit("")
        ).alias("first_long_word"),
        F.regexp_like("p_type", F.lit("BRUSHED|POLISHED")).alias("is_finished"),
        F.regexp_extract("p_brand", r"([0-9]+)$", 1).alias("brand_suffix"),
    )


@query(
    "q_fn_mask",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS name_masked,
           regexp_replace(c_name, '[0-9]', '*', 'g') AS name_digits_starred,
           CASE WHEN length(c_name) > 9
                THEN substr(c_name, 1, 9)
                     || regexp_replace(regexp_replace(regexp_replace(
                          substr(c_name, 10),
                          '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
                ELSE c_name END AS name_show_first_9
    FROM customer
    """,
)
def q_fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-masking functions — Hive's mask() / mask_first_n() family,
    which Spark ships as the `mask` builtin (3.4+): uppercase→X,
    lowercase→x, digit→n, applied per character inside codegen — the
    column-level de-identification used when q_dq_kanonymity says a
    column can't ship raw (q_text_pii is the free-text counterpart).

    The oracle replicates the same per-class substitution with regexp
    chains, proving the builtin's semantics rather than assuming them.
    mask_first_n is composed from substr + mask, exactly how Hive
    defines it.
    """
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("name_masked"),
        F.mask(
            "c_name",
            upperChar=F.lit(None),
            lowerChar=F.lit(None),
            digitChar=F.lit("*"),
            otherChar=F.lit(None),
        ).alias("name_digits_starred"),
        F.when(
            F.length("c_name") > 9,
            F.concat(F.substring("c_name", 1, 9), F.mask(F.expr("substr(c_name, 10)"))),
        )
        .otherwise(F.col("c_name"))
        .alias("name_show_first_9"),
    )


_FUZZY_PROBES = ("Customer#000000001", "Custmer#000000419", "customer#000001000")


@query(
    "q_fuzzy_match",
    oracle=f"""
    WITH probes AS (
      SELECT * FROM (VALUES {", ".join(f"('{p}')" for p in _FUZZY_PROBES)}) AS t(probe)
    )
    SELECT p.probe, c.c_custkey, c.c_name,
           CAST(levenshtein(p.probe, c.c_name) AS BIGINT) AS dist
    FROM probes p JOIN customer c
      ON levenshtein(p.probe, c.c_name) <= 3
    """,
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching by edit distance: resolve a bounded probe
    list (misspelled / case-damaged names) against the customer table
    with levenshtein ≤ 3 — the approximate-match primitive behind entity
    resolution and typo-tolerant lookup (both engines implement the
    classic Wagner–Fischer distance; the threshold and integer distance
    are exact).

    Scale shape: the probe side is small by contract, so this is a
    broadcast nested-loop with the distance predicate — the only correct
    general form for a non-equi similarity join.  (At corpus×corpus
    scale you'd block first — q_dedup_minhash — and verify candidates
    with this distance; Spark's levenshtein also takes a threshold
    argument that early-exits the DP loop.)
    """
    c = t(spark, sf_dir, "customer")
    probes = spark.createDataFrame([(p,) for p in _FUZZY_PROBES], ["probe"])
    dist = F.levenshtein(F.col("probe"), F.col("c_name"))
    return (
        c.join(F.broadcast(probes), dist <= 3)
        .select("probe", "c_custkey", "c_name", dist.cast("long").alias("dist"))
    )


@query(
    "q_fn_crypto",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) AS n_roundtrip_ok,
           CAST(COUNT(DISTINCT c_name) AS BIGINT) AS nd_ciphertexts,
           CAST(COUNT(DISTINCT c_name) AS BIGINT) AS nd_names
    FROM customer
    """,
)
def q_fn_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column encryption surface — aes_encrypt/aes_decrypt (the Spark
    builtins behind envelope-encrypted PII columns at rest).  DuckDB has
    no AES builtins, so the check is SELF-VERIFYING against a trivial
    oracle: every row must decrypt back to its plaintext
    (n_roundtrip_ok == n_rows), and in deterministic ECB mode distinct
    ciphertexts must equal distinct plaintexts (nd_ciphertexts ==
    nd_names — the property that makes ECB usable as a join-preserving
    pseudonym, and exactly why it is NOT semantically secure for free
    text; production uses GCM + random IV and gives up joinability).

    All four outputs are computable by the oracle WITHOUT AES, so the
    driver hash-check still pins the crypto behavior.
    """
    c = t(spark, sf_dir, "customer")
    key = F.lit("0123456789abcdef")  # 16-byte demo key
    mode = F.lit("ECB")
    ct = F.aes_encrypt(F.col("c_name").cast("binary"), key.cast("binary"), mode)
    pt = F.aes_decrypt(ct, key.cast("binary"), mode).cast("string")
    enc = c.select("c_name", ct.alias("ct"), pt.alias("pt"))
    return enc.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("pt") == F.col("c_name"), 1)).alias("n_roundtrip_ok"),
        F.countDistinct(F.base64("ct")).alias("nd_ciphertexts"),
        F.countDistinct("c_name").alias("nd_names"),
    )


@query(
    "q_fn_trig",
    oracle="""
    SELECT n_nationkey,
           round(sin(n_nationkey), 9) AS sin_v,
           round(cos(n_nationkey), 9) AS cos_v,
           round(tan(n_nationkey), 9) AS tan_v,
           round(atan2(n_nationkey, 3.0), 9) AS atan2_v,
           round(exp(CAST(n_nationkey AS DOUBLE) / 10.0), 9) AS exp_v,
           round(ln(n_nationkey + 1.0), 9) AS ln_v,
           round(degrees(atan(n_nationkey)), 9) AS deg_atan,
           round(radians(CAST(n_nationkey AS DOUBLE)), 9) AS rad_v
    FROM nation
    ORDER BY n_nationkey
    """,
)
def q_fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric / scientific scalar family (HiveQL surface:
    sin/cos/tan/atan2/exp/ln/degrees/radians), each pinned at 9 dp — the
    transcendental house rule: libm implementations may differ in the
    last ulp between engines, and 9 dp is far coarser than any libm
    disagreement yet far finer than any analytical use."""
    n = t(spark, sf_dir, "nation")
    x = F.col("n_nationkey")
    xd = x.cast("double")
    return n.select(
        "n_nationkey",
        F.round(F.sin(x), 9).alias("sin_v"),
        F.round(F.cos(x), 9).alias("cos_v"),
        F.round(F.tan(x), 9).alias("tan_v"),
        F.round(F.atan2(xd, F.lit(3.0)), 9).alias("atan2_v"),
        F.round(F.exp(xd / 10.0), 9).alias("exp_v"),
        F.round(F.log(x + 1.0), 9).alias("ln_v"),
        F.round(F.degrees(F.atan(x)), 9).alias("deg_atan"),
        F.round(F.radians(xd), 9).alias("rad_v"),
    ).orderBy("n_nationkey")


@query(
    "q_fn_null",
    oracle="""
    SELECT s_suppkey,
           nullif(s_acctbal, 0.0) AS acct_nullif,
           coalesce(nullif(s_name, ''), 'unknown') AS name_coalesce,
           ifnull(nullif(s_nationkey, 0), -1) AS nation_ifnull,
           CASE WHEN nullif(s_acctbal, 0.0) IS NOT NULL
                THEN 'has_bal' ELSE 'no_bal' END AS nvl2_equiv,
           greatest(s_acctbal, 0.0) AS bal_floor0,
           least(s_acctbal, 1000.0) AS bal_cap1000,
           (s_acctbal IS NOT DISTINCT FROM 0.0) AS is_exactly_zero
    FROM supplier
    ORDER BY s_suppkey
    """,
)
def q_fn_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar family (HiveQL surface: nullif / coalesce /
    ifnull-nvl / nvl2 / greatest / least / null-safe equality).  nvl2 is
    expressed as the CASE it desugars to so the oracle text stays ANSI
    (DuckDB has no nvl2); greatest/least propagate per ANSI rules."""
    s = t(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.nullif(bal, F.lit(0.0)).alias("acct_nullif"),
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")).alias(
            "name_coalesce"
        ),
        F.ifnull(F.nullif(F.col("s_nationkey"), F.lit(0)), F.lit(-1)).alias(
            "nation_ifnull"
        ),
        F.nvl2(
            F.nullif(bal, F.lit(0.0)), F.lit("has_bal"), F.lit("no_bal")
        ).alias("nvl2_equiv"),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(1000.0)).alias("bal_cap1000"),
        bal.eqNullSafe(F.lit(0.0)).alias("is_exactly_zero"),
    ).orderBy("s_suppkey")


@query(
    "q_fn_bases",
    oracle="""
    SELECT n_nationkey,
           bin(n_nationkey) AS bin_v,
           hex(n_nationkey) AS hex_v,
           to_base(n_nationkey, 8) AS oct_v,
           CAST(('0x' || hex(n_nationkey))::UBIGINT AS BIGINT) AS hex_roundtrip
    FROM nation
    WHERE n_nationkey > 0
    ORDER BY n_nationkey
    """,
)
def q_fn_bases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Number-base conversion family (bin / hex / oct and the hex→int
    round trip) — HiveQL's conv()/hex()/bin() surface.  Spark's bin/hex
    emit the same canonical uppercase-hex/minimal-digit forms DuckDB's
    do for positive integers; the round trip proves parseability."""
    n = t(spark, sf_dir, "nation").filter(F.col("n_nationkey") > 0)
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        F.bin(k).alias("bin_v"),
        F.hex(k).alias("hex_v"),
        F.conv(k.cast("string"), 10, 8).alias("oct_v"),
        F.conv(F.hex(k), 16, 10).cast("long").alias("hex_roundtrip"),
    ).orderBy("n_nationkey")


@query(
    "q_fn_format",
    oracle="""
    WITH c AS (
      SELECT p_partkey, p_brand, p_type, p_size,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
      FROM part
    )
    SELECT p_partkey,
           printf('%s#%05d', p_brand, p_partkey) AS part_tag,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
           rpad(p_brand, 12, '.') AS brand_pad,
           trim('##' || p_type || '##', '#') AS type_trim,
           printf('%,d', cents // 100) || '.' || printf('%02d', cents % 100)
             AS price_fmt
    FROM c
    """,
)
def q_fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-formatting family — HiveQL's printf()/format_number()/
    lpad/rpad plus character-set trim: the report-rendering surface that
    otherwise drives users to per-row Python.

    `format_string` is Java printf (same %-dialect DuckDB's printf
    implements); `format_number` adds locale thousands grouping with
    HALF_EVEN — the oracle reconstructs it from exact integer cents
    because DuckDB's printf refuses grouped floats, which also proves the
    fixture's 2-decimal money domain survives the double round trip.
    All six expressions are codegen'd JVM string ops — zero UDFs.
    """
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.format_string("%s#%05d", "p_brand", "p_partkey").alias("part_tag"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.rpad(F.col("p_brand"), 12, ".").alias("brand_pad"),
        F.expr("trim(BOTH '#' FROM concat('##', p_type, '##'))").alias(
            "type_trim"
        ),
        F.format_number(F.col("p_retailprice"), 2).alias("price_fmt"),
    )


@query(
    "q_fn_date2",
    oracle="""
    SELECT o_orderkey,
           quarter(o_orderdate) AS qtr,
           weekofyear(o_orderdate) AS week_iso,
           isodow(o_orderdate) AS dow_iso,
           dayofyear(o_orderdate) AS doy,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2m
    FROM orders
    """,
)
def q_fn_date2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended calendar functions: quarter, ISO week-of-year, ISO
    day-of-week, day-of-year, month-end (last_day), and month arithmetic
    with end-of-month clamping (add_months: Jan 31 + 1 → Feb 28, matching
    DuckDB's INTERVAL MONTH addition).  Spark's dayofweek() is
    1=Sunday — the ISO form is weekday()+1, which equals DuckDB's
    isodow.  Date outputs are projected as yyyy-MM-dd strings on both
    sides (the pandas bridge maps date vs datetime64 differently)."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("week_iso"),
        (F.weekday(d) + F.lit(1)).alias("dow_iso"),
        F.dayofyear(d).alias("doy"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus_2m"),
    )


@query(
    "q_fn_unicode",
    oracle="""
    SELECT c_custkey,
           'Ü' || lower(c_name) || 'é' AS s,
           length('Ü' || lower(c_name) || 'é') AS char_len,
           strlen('Ü' || lower(c_name) || 'é') AS byte_len,
           upper('Ü' || lower(c_name) || 'é') AS upper_s,
           unicode('Ü' || lower(c_name) || 'é') AS cp_first,
           substr('Ü' || lower(c_name) || 'é', 1, 3) AS first3,
           hex(encode('Üé')) AS utf8_hex
    FROM customer
    """,
)
def q_fn_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode string semantics — the multilingual-corpus invariants:
    length() counts CODE POINTS while octet_length counts UTF-8 bytes
    (Ü and é are 2 bytes each), upper/lower and substr operate on code
    points not bytes, ascii()/unicode() expose the first code point, and
    encode(...,'utf-8')+hex round-trips the byte form.  All JVM codegen
    string ops; a byte-oriented engine (or a naive C locale) fails every
    one of these on non-ASCII text."""
    c = t(spark, sf_dir, "customer")
    s = F.concat(F.lit("Ü"), F.lower("c_name"), F.lit("é"))
    return c.select(
        "c_custkey",
        s.alias("s"),
        F.length(s).alias("char_len"),
        F.octet_length(s).alias("byte_len"),
        F.upper(s).alias("upper_s"),
        F.ascii(s).alias("cp_first"),
        F.substring(s, 1, 3).alias("first3"),
        F.hex(F.encode(F.lit("Üé"), "utf-8")).alias("utf8_hex"),
    )


@query(
    "q_fn_array2",
    oracle="""
    WITH arr AS (
      SELECT p_partkey,
             generate_series(1, p_size % 10 + 3) AS a,
             generate_series(p_size % 5 + 2, p_size % 5 + 8) AS b
      FROM part
    )
    SELECT p_partkey,
           array_to_string(list_sort(list_intersect(a, b)), ',') AS inter,
           array_to_string(list_sort(list_distinct(a || b)), ',') AS uni,
           array_to_string(list_sort(list_filter(a, x -> NOT list_contains(b, x))), ',')
             AS minus_ab,
           coalesce(list_position(a, 3), 0) AS pos3,
           list_contains(a, 5) AS has5,
           array_to_string(a[2:4], ',') AS sl
    FROM arr
    """,
)
def q_fn_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra — intersect / union-distinct / except /
    position / contains / slice over integer arrays: the HiveQL
    collection-function surface beyond construction+explode (q_fn_array).
    Set-op OUTPUT ORDER differs between engines by contract, so every
    set-valued result is sorted then serialized; position semantics
    differ too (Spark returns 0 for missing, DuckDB NULL) — the oracle
    coalesces to the Spark convention.  All codegen'd; no UDFs."""
    p = t(spark, sf_dir, "part")
    a = F.sequence(F.lit(1), F.col("p_size") % 10 + 3)
    b = F.sequence(F.col("p_size") % 5 + 2, F.col("p_size") % 5 + 8)
    ser = lambda arr: F.concat_ws(
        ",", F.transform(F.sort_array(arr), lambda x: x.cast("string"))
    )
    return p.select(
        "p_partkey",
        ser(F.array_intersect(a, b)).alias("inter"),
        ser(F.array_distinct(F.concat(a, b))).alias("uni"),
        ser(F.array_except(a, b)).alias("minus_ab"),
        F.array_position(a, 3).alias("pos3"),
        F.array_contains(a, 5).alias("has5"),
        F.concat_ws(
            ",", F.transform(F.slice(a, 2, 3), lambda x: x.cast("string"))
        ).alias("sl"),
    )


@query(
    "q_fn_timezone",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS utc_ts,
           strftime(timezone('America/New_York',
                    (ts::VARCHAR || '+00')::TIMESTAMPTZ),
                    '%Y-%m-%d %H:%M:%S') AS ny_ts,
           strftime(timezone('Asia/Tokyo',
                    (ts::VARCHAR || '+00')::TIMESTAMPTZ),
                    '%Y-%m-%d %H:%M:%S') AS tokyo_ts,
           strftime(timezone('Europe/Berlin',
                    (ts::VARCHAR || '+00')::TIMESTAMPTZ),
                    '%Y-%m-%d %H:%M:%S') AS berlin_ts
    FROM events
    """,
)
def q_fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IANA-zone conversion (from_utc_timestamp): the same UTC instant
    rendered in three zones, DST-correct on both engines (summer NY is
    UTC−4, winter UTC−5 — an offset-arithmetic implementation gets one
    of them wrong).  The oracle pins the instant with an explicit +00
    TIMESTAMPTZ literal so the comparison is independent of either
    engine's session timezone.  Rendered as strings: a zoned timestamp
    type does not round-trip the pandas bridge."""
    e = t(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return e.select(
        "event_id",
        F.date_format("ts", fmt).alias("utc_ts"),
        F.date_format(
            F.from_utc_timestamp("ts", "America/New_York"), fmt
        ).alias("ny_ts"),
        F.date_format(F.from_utc_timestamp("ts", "Asia/Tokyo"), fmt).alias(
            "tokyo_ts"
        ),
        F.date_format(
            F.from_utc_timestamp("ts", "Europe/Berlin"), fmt
        ).alias("berlin_ts"),
    )


@query(
    "q_fn_json_table",
    oracle="""
    WITH payload AS (
      SELECT l_orderkey AS ok,
             json_group_array(json_object('ln', l_linenumber,
                                          'qty', l_quantity)) AS j
      FROM lineitem
      GROUP BY l_orderkey
    )
    SELECT p.ok AS o_orderkey,
           CAST(u.x->'$.ln' AS INT) AS ln,
           CAST(u.x->'$.qty' AS DOUBLE) AS qty
    FROM payload p,
         LATERAL (SELECT unnest(json_extract(p.j, '$[*]')) AS x) u
    """,
)
def q_fn_json_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_TABLE-style shredding: an array-of-objects payload (the shape
    nested API/event feeds arrive in; materialized here from the fixture
    since it ships no raw nested JSON) is parsed ONCE with a typed array
    schema and exploded to relational rows — `inline(from_json(...))`,
    the one-parse answer to per-field get_json_object chains (which
    re-parse the document per column).

    The whole shred is JVM codegen: schema-directed parse, generator
    explode, typed columns out.  Both engines rebuild and re-shred the
    same payload, so the relational output must round-trip identically.
    """
    l = t(spark, sf_dir, "lineitem")
    payload = l.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.to_json(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("ln"),
                        F.col("l_quantity").alias("qty"),
                    )
                )
            )
        ).alias("j")
    )
    return payload.select(
        F.col("ok").alias("o_orderkey"),
        F.inline(
            F.from_json(F.col("j"), "array<struct<ln:int,qty:double>>")
        ),
    )


@query(
    "q_fn_xpath",
    oracle="""
    WITH xml AS (
      SELECT n_nationkey,
             '<nation><name>' || n_name || '</name><region>'
               || CAST(n_regionkey AS VARCHAR) || '</region></nation>' AS x
      FROM nation
    )
    SELECT n_nationkey,
           regexp_extract(x, '<name>([^<]*)</name>', 1) AS nm,
           CAST(regexp_extract(x, '<region>([^<]*)</region>', 1) AS INT)
             AS region_key,
           CASE WHEN x LIKE '%<name>%' THEN true ELSE false END AS has_name
    FROM xml
    """,
)
def q_fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HiveQL xpath_* builtin family (xpath_string / xpath_int /
    xpath_boolean) over XML payloads — the legacy semi-structured
    surface Hive shops still carry (the JSON twins are q_fn_json*).
    Spark ships the same-named builtins with a real XPath engine; DuckDB
    has no XPath, so the oracle states the equivalent extraction with
    anchored regexes — fine for the demo's regular fragment, and exactly
    the fragile equivalence that motivates migrating feeds to JSON.
    The XML is materialized from fixture columns since the fixtures ship
    none; extraction is the surface under test."""
    n = t(spark, sf_dir, "nation")
    x = F.concat(
        F.lit("<nation><name>"),
        F.col("n_name"),
        F.lit("</name><region>"),
        F.col("n_regionkey").cast("string"),
        F.lit("</region></nation>"),
    )
    xml = n.select("n_nationkey", x.alias("x"))
    return xml.select(
        "n_nationkey",
        F.xpath_string("x", F.lit("/nation/name")).alias("nm"),
        F.xpath_int("x", F.lit("/nation/region")).alias("region_key"),
        F.xpath_boolean("x", F.lit("count(/nation/name) > 0")).alias(
            "has_name"
        ),
    )


@query(
    "q_fn_bitpack",
    oracle="""
    WITH packed AS (
      SELECT p_partkey,
             (CAST(p_size AS BIGINT) << 40)
               | (CAST(length(p_brand) AS BIGINT) << 32)
               | (p_partkey & 4294967295) AS key64
      FROM part
    )
    SELECT p_partkey, key64,
           key64 >> 40 AS up_size,
           (key64 >> 32) & 255 AS up_brandlen,
           key64 & 4294967295 AS up_partkey,
           ((key64 >> 40) = (SELECT CAST(p_size AS BIGINT) FROM part x
                             WHERE x.p_partkey = packed.p_partkey)) AS size_ok
    FROM packed
    """,
)
def q_fn_bitpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-packing composite keys: three small fields packed into one
    BIGINT with shifts/masks and unpacked losslessly — the
    storage/shuffle-width optimization behind packed dimension keys,
    bitmap coordinates, and sort keys that encode (partition, position).
    One long instead of three ints narrows every exchange and sort that
    carries the key.  Shifts and masks are exact integer ops — no
    carrier needed; the unpack-equals-source flag is value-checked."""
    p = t(spark, sf_dir, "part")
    key64 = (
        F.shiftleft(F.col("p_size").cast("long"), 40)
        .bitwiseOR(F.shiftleft(F.length("p_brand").cast("long"), 32))
        .bitwiseOR(F.col("p_partkey").bitwiseAND(F.lit(4294967295)))
    )
    packed = p.select("p_partkey", F.col("p_size"), key64.alias("key64"))
    return packed.select(
        "p_partkey",
        "key64",
        F.shiftright(F.col("key64"), 40).alias("up_size"),
        F.shiftright(F.col("key64"), 32).bitwiseAND(F.lit(255)).alias(
            "up_brandlen"
        ),
        F.col("key64").bitwiseAND(F.lit(4294967295)).alias("up_partkey"),
        (
            F.shiftright(F.col("key64"), 40) == F.col("p_size").cast("long")
        ).alias("size_ok"),
    )


@query(
    "q_fn_binary",
    oracle="""
    WITH b AS (
      SELECT p_partkey, p_name, md5(p_name) AS hx
      FROM part
    )
    SELECT p_partkey,
           octet_length(from_hex(hx)) AS payload_bytes,
           upper(substr(hx, 1, 8)) AS first4_hex,
           upper(substr(hx, 25, 8)) AS last4_hex,
           octet_length(from_hex(hx) || from_hex('00FF')) AS concat_bytes,
           octet_length(encode(p_name)) AS name_utf8_bytes
    FROM b
    """,
)
def q_fn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BinaryType column manipulation — construct (unhex), byte length,
    byte-range slicing, binary concat, and string→UTF-8 encoding: the
    operations multimodal tables (sources/multimodal.py) run on real
    payload columns, here over deterministic md5-derived bytes so a SQL
    oracle can check them.  Spark slices true binary and hexes back;
    DuckDB (no blob substring) slices the hex text at doubled offsets —
    same bytes, proven equivalent."""
    p = t(spark, sf_dir, "part")
    payload = F.unhex(F.md5("p_name"))
    return p.select(
        "p_partkey",
        F.octet_length(payload).alias("payload_bytes"),
        F.hex(F.expr("substring(unhex(md5(p_name)), 1, 4)")).alias(
            "first4_hex"
        ),
        F.hex(F.expr("substring(unhex(md5(p_name)), 13, 4)")).alias(
            "last4_hex"
        ),
        F.octet_length(F.concat(payload, F.unhex(F.lit("00FF")))).alias(
            "concat_bytes"
        ),
        F.octet_length(F.encode("p_name", "utf-8")).alias("name_utf8_bytes"),
    )


@query(
    "q_fn_map_ops",
    oracle="""
    WITH metrics AS (
      SELECT p_partkey, 'name_len' AS key,
             CAST(length(p_name) AS BIGINT) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'retail_cents',
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) FROM part
      UNION ALL
      SELECT p_partkey, 'size', CAST(p_size AS BIGINT) FROM part
    )
    SELECT p_partkey, key, CAST(val * 2 AS BIGINT) AS val2
    FROM metrics
    WHERE val > 10
    ORDER BY p_partkey, key
    """,
)
def q_fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed column algebra — the HiveQL map surface
    (map construction, map_filter, transform_values, entry explosion)
    re-expressed with Spark's higher-order map functions: build a
    per-row metric map, filter entries by value, transform the
    surviving values, explode back to rows.  All four operations run
    inside whole-stage codegen on the JVM — no shuffle, no UDF.

    DuckDB's map surface differs, so the oracle states the SEMANTICS
    (the flattened entry relation the pipeline must produce) as plain
    relational SQL — the map ops are checked by their observable
    output, the same way q_unpivot_multi's oracle states the UNION ALL
    desugaring."""
    p = t(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("name_len"),
        F.length("p_name").cast("long"),
        F.lit("retail_cents"),
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long"),
        F.lit("size"),
        F.col("p_size").cast("long"),
    )
    filtered = F.map_filter(m, lambda k, v: v > 10)
    doubled = F.transform_values(filtered, lambda k, v: v * 2)
    return (
        p.select("p_partkey", F.explode(doubled).alias("key", "val2"))
        .orderBy("p_partkey", "key")
    )


# ---------------------------------------------------------------------------
# STRUCT column algebra: pack -> withField -> dropFields -> unpack
# ---------------------------------------------------------------------------


@query(
    "q_fn_struct_ops",
    oracle="""
    WITH packed AS (
      SELECT struct_insert(
               struct_pack(
                 orderkey := o_orderkey,
                 price_cents := CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT),
                 status := o_orderstatus
               ),
               tax_cents := CAST(floor(floor(o_totalprice * 100 + 0.5)
                                       * 7 / 100) AS BIGINT),
               priority_code := upper(substr(o_orderpriority, 1, 1))
             ) AS s
      FROM orders
      WHERE o_orderstatus = 'F'
    )
    SELECT s.orderkey AS orderkey,
           s.price_cents AS price_cents,
           s.tax_cents AS tax_cents,
           s.priority_code AS priority_code,
           CAST(s.price_cents + s.tax_cents AS BIGINT) AS total_cents
    FROM packed
    ORDER BY orderkey
    """,
)
def q_fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT column algebra — pack columns into a struct, add computed
    fields with withField, drop a field, then read fields back out —
    the nested-record manipulation an ELT pipeline does when it
    assembles typed payloads (Hive named_struct + item access; the
    Spark forms are Column.withField/dropFields, 3.1+).  The struct is
    genuinely built and rewritten in the plan (not sugar the optimizer
    removes before execution: the field adds happen on the packed
    value), then unpacked for the cross-engine comparison, since struct
    literals don't bridge hash-identically.

    Pure projection — zero shuffles, whole-stage codegen end to end;
    tax is integer cents math (floor of an exact-long product), so no
    carrier is needed.
    """
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    packed = o.select(
        F.struct(
            F.col("o_orderkey").alias("orderkey"),
            cents.alias("price_cents"),
            F.col("o_orderstatus").alias("status"),
        )
        .withField(
            "tax_cents",
            F.floor(cents * 7 / 100).cast("long"),
        )
        .withField(
            "priority_code", F.upper(F.substring("o_orderpriority", 1, 1))
        )
        .dropFields("status")
        .alias("s")
    )
    return packed.select(
        F.col("s.orderkey").alias("orderkey"),
        F.col("s.price_cents").alias("price_cents"),
        F.col("s.tax_cents").alias("tax_cents"),
        F.col("s.priority_code").alias("priority_code"),
        (F.col("s.price_cents") + F.col("s.tax_cents"))
        .cast("long")
        .alias("total_cents"),
    ).orderBy("orderkey")
