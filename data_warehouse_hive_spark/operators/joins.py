"""Joins — SURVEY.md §2.3 (HiveQL join surface, delegated by the reference
to Hive 4.1.0; re-expressed so Catalyst/AQE pick the physical strategy).

Scale posture per join:
  * dimension tables (region/nation/supplier/part at TPC-H ratios) are
    broadcast — explicitly hinted where we know the side is small, so the
    fact table never shuffles for them even at 100 TB;
  * fact-fact joins (lineitem ⋈ orders) are shuffle joins on the join key —
    Catalyst picks sort-merge, AQE converts to broadcast/skew-split at
    runtime if sizes allow;
  * theta (non-equi) joins are broadcast-nested-loop with the SMALL side
    broadcast — the only scalable form of a general theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from data_warehouse_hive_spark.registry import dsum, o_dsum, query
from data_warehouse_hive_spark.tables import t


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 100000
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; Catalyst chooses broadcast (customer is small) or
    sort-merge at real scale."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_orderdate", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "q_join_broadcast",
    oracle=f"""
    SELECT n.n_name,
           {o_dsum('c.c_acctbal', 'sum_acctbal')},
           COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side (broadcast) join — the explicit `broadcast()` hint keeps the
    big side shuffle-free; the Hive analogue is a MAPJOIN hint."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(dsum("c_acctbal", "sum_acctbal"), F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 250000
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with an extra join-side predicate (kept in the join
    condition, not the WHERE, to preserve outer semantics)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 250000)
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_right",
    oracle="""
    SELECT n.n_name, s.s_suppkey, s.s_name
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (every nation survives; most have no supplier at
    fixture scale)."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select(
        "n_name", "s_suppkey", "s_name"
    )


@query(
    "q_join_full",
    oracle="""
    SELECT a.k AS cust_nation, b.k AS supp_nation,
           a.n_cust, b.n_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) a
    FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) b
      ON a.k = b.k
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (either side may be missing)."""
    c = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.k == s.k, "full").select(
        c.k.alias("cust_nation"), s.k.alias("supp_nation"), "n_cust", "n_supp"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — the EXISTS rewrite; emits each left row at most
    once and never shuffles right-side payload columns."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — the NOT EXISTS rewrite (customers with no orders)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN (cartesian product; both sides tiny by construction —
    a guarded operation at scale)."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "q_join_theta",
    oracle="""
    SELECT s.s_suppkey, COUNT(*) AS n_richer_customers
    FROM supplier s JOIN customer c ON c.c_acctbal > s.s_acctbal
    GROUP BY s.s_suppkey
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join — inequality-only condition.  Physically a
    BroadcastNestedLoopJoin with the small side (supplier) broadcast; the
    only join strategy that generalizes to arbitrary theta predicates."""
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    return (
        c.join(broadcast(s), c.c_acctbal > s.s_acctbal)
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_richer_customers"))
    )


@query(
    "q_join_multiway",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY r.r_name, n.n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join (TPC-H Q5 shape).  Broadcast hints go ONLY on the
    fixed-size dims (nation = 25 rows, region = 5 rows — constants at any
    SF).  customer SCALES with SF (sf1 ≈ 150k rows, 100 TB ≈ billions), so
    it carries no hint: AQE/CBO broadcasts it while it fits under
    autoBroadcastJoinThreshold at small SF and falls back to a shuffle
    hash join at scale — a forced broadcast(customer) would OOM executors
    at exactly the scale this plan targets.  At 100 TB: two fact-scale
    shuffles (lineitem ⋈ orders on orderkey, +customer on custkey), dims
    free."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
    )
