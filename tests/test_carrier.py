"""Property tests for the cross-engine exact aggregation carrier
(registry.to_carrier / o_dsum): the whole oracle harness rests on
floor(x*1e6 + 0.5) summed as BIGINT being bit-identical between Spark
and DuckDB for arbitrary doubles, in any aggregation order."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_warehouse_hive_spark.registry import CARRIER_SCALE, to_carrier

# Magnitude bound: |x| ≤ 1e9 keeps x*1e6 within long range with room to
# spare (the documented carrier domain; fixture values are ≤ ~1e5).
finite_doubles = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


@settings(max_examples=20, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=50))
def test_carrier_matches_duckdb_per_value(spark, xs):
    """floor(x*1e6+0.5)::long must agree value-by-value across engines —
    including negatives, ties (x.5 scaled), and values whose decimal
    representation is not exact in binary."""
    pdf = pd.DataFrame({"x": xs})
    sdf = spark.createDataFrame(pdf).select(to_carrier(F.col("x")).alias("c"))
    spark_vals = [r.c for r in sdf.collect()]
    con = duckdb.connect()
    con.register("tv", pdf)
    duck_vals = [
        r[0]
        for r in con.execute(
            f"SELECT CAST(floor(x * {CARRIER_SCALE:.0f}.0 + 0.5) AS BIGINT) FROM tv"
        ).fetchall()
    ]
    assert spark_vals == duck_vals


@settings(max_examples=10, deadline=None)
@given(st.lists(finite_doubles, min_size=2, max_size=200))
def test_carrier_sum_order_independent(spark, xs):
    """The carrier SUM must not depend on partitioning: 1-partition and
    16-partition aggregations of the same values are identical bits."""
    pdf = pd.DataFrame({"x": xs})
    one = (
        spark.createDataFrame(pdf)
        .coalesce(1)
        .agg((F.sum(to_carrier(F.col("x"))).cast("double") / CARRIER_SCALE).alias("s"))
        .collect()[0].s
    )
    many = (
        spark.createDataFrame(pdf)
        .repartition(16)
        .agg((F.sum(to_carrier(F.col("x"))).cast("double") / CARRIER_SCALE).alias("s"))
        .collect()[0].s
    )
    assert one == many and repr(one) == repr(many)


def test_carrier_half_tie_rounds_like_duckdb(spark):
    """Exact .5-at-scale ties: floor(x*1e6+0.5) rounds half UP (towards
    +inf) in BOTH engines because it is the same IEEE formula — this is
    the case where each engine's own round() would disagree (banker's
    rounding vs half-away-from-zero)."""
    # 2.5e-6 * 1e6 = 2.5 exactly (binary-exact), +0.5 → floor(3.0) = 3
    # -2.5e-6 → floor(-2.0) = -2
    pdf = pd.DataFrame({"x": [2.5e-6, -2.5e-6]})
    sdf = spark.createDataFrame(pdf).select(to_carrier(F.col("x")).alias("c"))
    assert [r.c for r in sdf.collect()] == [3, -2]
    con = duckdb.connect()
    con.register("tv", pdf)
    assert [
        r[0]
        for r in con.execute(
            "SELECT CAST(floor(x * 1e6 + 0.5) AS BIGINT) FROM tv"
        ).fetchall()
    ] == [3, -2]


def test_hi_lo_sumsq_matches_duckdb(spark):
    """The hi/lo split sum-of-squares (q_stats_profile) recombines to the
    same double in both engines."""
    xs = [0.01, 123.45, 99999.99, 54321.87, 0.005]
    pdf = pd.DataFrame({"x": xs})
    y = F.floor(F.col("x") * 1e2 + 0.5).cast("long")
    yy = y * y
    sdf = spark.createDataFrame(pdf).agg(
        (
            (
                F.sum(F.shiftright(yy, 31)).cast("double") * 2147483648.0
                + F.sum(yy % F.lit(2147483648)).cast("double")
            )
            / 1e4
        ).alias("sq")
    )
    spark_val = sdf.collect()[0].sq
    con = duckdb.connect()
    con.register("tv", pdf)
    duck_val = con.execute(
        """
        SELECT (CAST(SUM(CAST(floor(x * 1e2 + 0.5) AS BIGINT)
                         * CAST(floor(x * 1e2 + 0.5) AS BIGINT)
                         // 2147483648) AS DOUBLE) * 2147483648.0
                + CAST(SUM(CAST(floor(x * 1e2 + 0.5) AS BIGINT)
                           * CAST(floor(x * 1e2 + 0.5) AS BIGINT)
                           % 2147483648) AS DOUBLE)) / 1e4
        FROM tv
        """
    ).fetchone()[0]
    assert repr(spark_val) == repr(duck_val)
