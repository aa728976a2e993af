"""Sorts / limits / top-k — SURVEY.md §2.6.

Scale posture: a global ORDER BY is a range-partitioned sort (Spark samples
key ranges, then sorts each range partition — no single-node sort).
ORDER BY + LIMIT k never performs the global sort at all: Catalyst plans
TakeOrderedAndProject, which keeps the top k per partition and merges k×P
rows on the driver — O(k) result, any input size.  SORT BY / DISTRIBUTE BY
(Hive's per-partition sort) maps to repartition + sortWithinPartitions and
does NOT produce a total order, matching Hive semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_hive_spark.registry import query
from data_warehouse_hive_spark.tables import t


@query(
    "q_orderby",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal,
           NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null
    FROM customer
    ORDER BY seg_or_null NULLS FIRST, c_acctbal DESC, c_custkey
    """,
)
def q_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY with explicit null placement and mixed directions.

    (The driver's value-hash is order-insensitive; the ordering semantics
    are asserted row-by-row in the local test suite instead.)
    """
    c = t(spark, sf_dir, "customer")
    return (
        c.withColumn("seg_or_null", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")))
        .select("c_custkey", "c_name", "c_acctbal", "seg_or_null")
        .orderBy(
            F.col("seg_or_null").asc_nulls_first(),
            F.col("c_acctbal").desc(),
            F.col("c_custkey"),
        )
    )


@query(
    "q_limit",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20
    """,
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT n — ordered by a unique key first so the selected row set is
    deterministic (a bare LIMIT is engine-dependent)."""
    o = t(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderdate", "o_totalprice").orderBy(
        "o_orderkey"
    ).limit(20)


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY ... LIMIT k plans as TakeOrderedAndProject —
    per-partition heaps of size k, no global sort (verify in .explain)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )


@query(
    "q_sort_within",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity > 45
    """,
)
def q_sort_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive DISTRIBUTE BY + SORT BY: repartition on the key, sort within
    each partition only.  Row *content* equals the plain filter (the oracle
    checks that); the per-partition clustering is a physical property used
    for write-ordering and downstream merge-friendly reads.
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 45)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
        .repartition("l_suppkey")
        .sortWithinPartitions("l_suppkey", "l_orderkey", "l_linenumber")
    )


@query(
    "q_orderby_nulls",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE o_totalprice END AS price_n,
           row_number() OVER (ORDER BY
             (CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END)
               DESC NULLS LAST,
             o_orderkey) AS rk
    FROM orders
    ORDER BY rk
    LIMIT 500
    """,
)
def q_orderby_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in ordering (NULLS FIRST/LAST): Spark's
    default for DESC is NULLS LAST while Hive's is NULLS FIRST — pipelines
    ported between them silently reorder unless the placement is spelled
    out.  The rank is materialized so the contract (nulls sort after every
    non-null under DESC NULLS LAST) is value-checked, with o_orderkey as
    total tiebreak."""
    o = t(spark, sf_dir, "orders")
    price_n = F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    from pyspark.sql import Window

    w = Window.orderBy(price_n.desc_nulls_last(), F.col("o_orderkey"))
    return (
        o.select(
            "o_orderkey",
            price_n.alias("price_n"),
            F.row_number().over(w).alias("rk"),
        )
        .orderBy("rk")
        .limit(500)
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 100
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination over a total order.  Spark executes this
    as a single TakeOrderedAndProject of offset+limit rows (each
    partition returns its local top-150, the driver merges and drops the
    first 100) — pagination never sorts the full relation.  Page
    stability REQUIRES the unique tiebreak: OFFSET over a non-total
    order returns overlapping pages run-to-run."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(100)
        .limit(50)
    )
