"""Set operations — SURVEY.md §2.7 (UNION [ALL] / INTERSECT / EXCEPT;
Hive 4 supports all of these, our engine maps them to native DataFrame ops).

UNION ALL is shuffle-free (plan concatenation).  UNION DISTINCT /
INTERSECT / EXCEPT each cost one hash shuffle on the full row — the
minimal implementation of their semantics; at scale prefer UNION ALL +
downstream dedup-on-key when the distinct-ness is already guaranteed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_hive_spark.registry import query
from data_warehouse_hive_spark.tables import t


def _cust_nations(spark, sf_dir) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
    )


def _supp_nations(spark, sf_dir) -> DataFrame:
    return (
        t(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "q_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — bag union, no dedup, no shuffle."""
    c = _cust_nations(spark, sf_dir).withColumn("side", F.lit("customer"))
    s = _supp_nations(spark, sf_dir).withColumn("side", F.lit("supplier"))
    return c.unionByName(s)


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (DISTINCT) — set union."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT [DISTINCT] — nations having both customers and suppliers."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "q_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / MINUS (distinct semantics) — nations with customers but no
    suppliers.  `subtract` is Spark's EXCEPT DISTINCT; `exceptAll` would be
    the bag variant (EXCEPT ALL), a different semantic."""
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


@query(
    "q_union_byname",
    oracle="""
    SELECT * FROM (
      SELECT r_regionkey AS key, r_name AS name, 'region' AS src FROM region
      UNION ALL BY NAME
      SELECT n_name AS name, n_nationkey AS key FROM nation
    )
    """,
)
def q_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union by column NAME (not position) with missing-column tolerance:
    the schema-drift-safe union — mismatched column order unions
    correctly and columns absent on one side arrive as NULL.  Positional
    UNION ALL silently mis-aligns columns the moment two extracts
    disagree on order; by-name is the only safe default for evolving
    pipelines."""
    r = t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("key"),
        F.col("r_name").alias("name"),
        F.lit("region").alias("src"),
    )
    n = t(spark, sf_dir, "nation").select(
        F.col("n_name").alias("name"),        # different column order,
        F.col("n_nationkey").alias("key"),    # and no src column
    )
    return r.unionByName(n, allowMissingColumns=True)


@query(
    "q_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection: each nationkey appears
    min(count_left, count_right) times.  Spark plans this as a single
    hash aggregation carrying both counts (no row-by-row matching), so
    the cost is one shuffle on the row value, the same as DISTINCT."""
    c = _cust_nations(spark, sf_dir)
    s = _supp_nations(spark, sf_dir)
    return c.intersectAll(s).orderBy("nationkey")


@query(
    "q_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: each nationkey keeps
    max(count_left − count_right, 0) occurrences; one value shuffle."""
    c = _cust_nations(spark, sf_dir)
    s = _supp_nations(spark, sf_dir)
    return c.exceptAll(s).orderBy("nationkey")
