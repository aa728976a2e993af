"""Bucketed co-located join: the join of two tables bucketed on the join
key must plan with ZERO shuffle exchanges — the at-scale payoff."""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from data_warehouse_hive_spark.plans.explain import count_exchanges, formatted_plan
from data_warehouse_hive_spark.sources.bucketing import bucketed_join, create_bucketed_table
from data_warehouse_hive_spark.tables import t


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    li_name, o_name = f"li_b_{suffix}", f"o_b_{suffix}"
    create_bucketed_table(
        t(spark, sf_dir, "lineitem"), li_name, "l_orderkey", 8, sort_col="l_orderkey"
    )
    create_bucketed_table(
        t(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
        o_name,
        "l_orderkey",
        8,
        sort_col="l_orderkey",
    )
    yield li_name, o_name
    for n in (li_name, o_name):
        spark.sql(f"DROP TABLE IF EXISTS `{n}`")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucketed_tables):
    li_name, o_name = bucketed_tables
    # disable auto-broadcast so the bucketed layout (not a broadcast) is
    # what eliminates the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, li_name, o_name, "l_orderkey")
        plan = formatted_plan(joined)
        assert count_exchanges(plan) == 0, plan
        # and the result is right
        expected = (
            t(spark, sf_dir, "lineitem")
            .join(
                t(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_groupby_is_shuffle_free(spark, bucketed_tables):
    li_name, _ = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = (
            spark.table(li_name)
            .groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = formatted_plan(agg)
        assert count_exchanges(plan) == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_hive_catalog_mode_works():
    """Hive-metastore-backed catalog (the reference's architecture) in a
    subprocess (catalog implementation is fixed per JVM)."""
    import subprocess
    import sys
    import tempfile

    code = """
import tempfile, sys
sys.path.insert(0, "/root/repo")
from data_warehouse_hive_spark.session import get_spark
wh = tempfile.mkdtemp(prefix="hive_wh_")
spark = get_spark(app_name="hive-mode-test", master="local[2]",
                  enable_hive=True, warehouse_dir=wh)
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
spark.sql("CREATE TABLE hive_mode_t (a INT) USING PARQUET")
spark.sql("INSERT INTO hive_mode_t VALUES (1),(2),(3)")
assert spark.table("hive_mode_t").count() == 3
assert spark.catalog.tableExists("hive_mode_t")
spark.sql("DROP TABLE hive_mode_t")
print("HIVE_MODE_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
        # fresh cwd: the embedded Derby metastore_db lands in cwd and, if
        # reused, pins the default database to a stale warehouse location
        cwd=tempfile.mkdtemp(prefix="hive_cwd_"),
    )
    assert "HIVE_MODE_OK" in out.stdout, out.stdout + out.stderr
