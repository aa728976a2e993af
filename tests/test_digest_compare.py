"""Engine-side digest comparator (r10 VERDICT task 1): above
DIGEST_ROW_LIMIT the harness compares COUNT + SUM/XOR/MIN/MAX of a
canonical md5 row hash computed IN each engine (the q_dq_checksum
idiom, operators/aggregates.py) instead of collecting to pandas — the
path that value-verifies clone-dense relations like
q_dedup_simhash_pairs' 163M-row sf1 output without touching
spark.driver.maxResultSize."""

import pytest
from pyspark.sql import functions as F

from data_warehouse_hive_spark.registry import load_all
from data_warehouse_hive_spark.testing import (
    compare_to_oracle,
    compare_to_oracle_digest,
    duckdb_connection,
)

REPRESENTATIVE = [
    # covers bigint/string/double/date canonicalizations
    "q_dedup_simhash_pairs",
    "q_groupby_agg",
    "q_win_cume_dist",
    "q_orders_did",
    # covers timestamp/timestamp_ntz canonicalization (r14: the sf10
    # sweep found q_fn_interval/q_filter_compare cross DIGEST_ROW_LIMIT
    # only above sf0.1, where the digest path had no timestamp support)
    "q_fn_interval",
    "q_filter_compare",
]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_digest_matches_oracle(spark, sf_dir, con, name):
    spec = load_all()[name]
    res = compare_to_oracle_digest(
        name, spec.fn(spark, sf_dir), spec.oracle, con
    )
    assert res.ok, str(res)


def test_digest_catches_mutation(spark, sf_dir, con):
    spec = load_all()["q_groupby_agg"]
    df = spec.fn(spark, sf_dir)
    last = df.columns[-1]
    bad = df.withColumn(last, F.lit(None).cast(df.schema[last].dataType))
    res = compare_to_oracle_digest("mutated", bad, spec.oracle, con)
    assert not res.ok


def test_digest_catches_dropped_row(spark, sf_dir, con):
    spec = load_all()[name := "q_win_cume_dist"]
    df = spec.fn(spark, sf_dir)
    res = compare_to_oracle_digest(name, df.limit(10), spec.oracle, con)
    assert not res.ok
    assert any("row count differs" in p for p in res.problems)


def test_digest_catches_column_set_mismatch(spark, sf_dir, con):
    """r11 advice: the digest path derives canonical expressions from the
    SPARK schema only, so it must assert the oracle column set up front —
    an oracle with extra/renamed columns may not digest-mismatch."""
    spec = load_all()["q_groupby_agg"]
    df = spec.fn(spark, sf_dir)
    renamed = df.withColumnRenamed(df.columns[-1], "not_a_real_col")
    res = compare_to_oracle_digest("renamed", renamed, spec.oracle, con)
    assert not res.ok
    assert any("columns differ" in p for p in res.problems)


def test_auto_switch_above_threshold(spark, sf_dir, con):
    """compare_to_oracle flips to the digest path above the row limit
    (forced here with a tiny limit) and still verdicts correctly."""
    spec = load_all()["q_dedup_simhash_pairs"]
    res = compare_to_oracle(
        "q_dedup_simhash_pairs",
        spec.fn(spark, sf_dir),
        spec.oracle,
        con,
        digest_row_limit=1,
    )
    assert res.ok, str(res)
    assert res.spark_rows == res.oracle_rows > 1
