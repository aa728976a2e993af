"""TPC-H-derived benchmark queries — the canonical multi-join analytics
shapes (SURVEY.md §2.14), adapted to the driver's trimmed star schema.

The reference delegates ad-hoc SQL of exactly this family to Hive
(`backend/hive_manager.py:393-401` runs arbitrary HiveQL over the external
tables it creates); these queries prove the same decision-support surface
on Spark with plans that survive scale-up.  The fixture schema is TPC-H
minus `partsupp` and a few columns (no `l_commitdate`/`l_receiptdate`/
`l_shipmode`, no `o_shippriority`, no address/phone), so each query keeps
the official shape and predicates but drops the missing columns; thresholds
are rescaled to the fixture's value domains where noted.

Scale posture (the point of the family):
  * fact⋈fact (lineitem⋈orders) is a shuffle join on the key — sort-merge
    under Catalyst, AQE may re-plan; never forced broadcast.
  * SF-scaled dimensions (customer/supplier/part) are joined WITHOUT a
    broadcast hint: at sf0.1 AQE broadcasts them on its own, at 100 TB they
    shuffle — forcing the hint would OOM at exactly the scale that matters
    (the q_join_multiway lesson).
  * fixed-size dimensions (nation=25, region=5) are explicitly broadcast.
  * every aggregate rides the exact scaled-long carrier (registry.py) so
    partial/final aggregation order cannot perturb cross-engine equality.
  * top-k outputs order by (measure, unique key) so LIMIT selects an
    identical row set in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from data_warehouse_hive_spark.registry import davg, dsum, o_davg, o_dsum, query
from data_warehouse_hive_spark.tables import t


def _revenue() -> Column:
    """The TPC-H revenue measure: extendedprice discounted."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_O_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "q_tpch_q03",
    oracle=f"""
    SELECT l.l_orderkey,
           {o_dsum(_O_REV, 'revenue')},
           strftime(ANY_VALUE(o.o_orderdate), '%Y-%m-%d') AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l.l_orderkey
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority, minus the missing o_shippriority):
    unshipped-revenue top-10 orders for one market segment.

    Plan shape: customer filters map-side, joins orders (AQE picks
    broadcast at test SF, shuffle at scale), the result joins lineitem on
    the orderkey — the one unavoidable fact-side shuffle — then a grouped
    carrier sum and a deterministic global top-10
    (TakeOrderedAndProject, no full sort).  o_orderdate is constant per
    orderkey, carried through ANY_VALUE/first to stay out of the group key.
    """
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            dsum(_revenue(), "revenue"),
            F.date_format(F.first("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q_tpch_q04",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking), late-line predicate adapted to
    the fixture (no l_commitdate/l_receiptdate → "a line shipped after the
    order date" marks the order).

    The EXISTS becomes a left-semi join — Spark never materializes the
    (order × matching lines) blowup, and the semi join's build side is the
    filtered lineitem projection of just (orderkey, shipdate).  Output is
    a ≤5-row priority histogram: partial counts merge map-side.
    """
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_tpch_q05",
    oracle=f"""
    SELECT n.n_name, {o_dsum(_O_REV, 'revenue')}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
)
def q_tpch_q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): six-table join measuring revenue
    where customer and supplier share a nation, per Asian nation.

    The join tree keeps the two fact shuffles (lineitem⋈orders,
    +customer) and folds the SF-scaled supplier in WITHOUT a hint — AQE
    broadcasts it at test scale, shuffles at 100 TB.  nation/region are
    fixed-size (25/5 rows) and explicitly broadcast, and the region filter
    prunes nations BEFORE the fact join via the broadcast side.  Revenue
    ties are impossible to mis-order: output is a ≤25-row sort.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(_revenue(), "revenue"))
        .orderBy(F.col("revenue").desc())
    )


@query(
    "q_tpch_q06",
    oracle=f"""
    SELECT {o_dsum('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate,
    the query every columnar engine should run at disk bandwidth.

    All three predicates push into the parquet scan; the single-row
    result needs only a partial-sum merge — zero shuffle of data rows.
    The discount BETWEEN on doubles is engine-safe: both engines compare
    the same stored IEEE values against the same literals.
    """
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, ANY_VALUE(c.c_name) AS c_name,
           {o_dsum(_O_REV, 'revenue')},
           ANY_VALUE(c.c_acctbal) AS c_acctbal,
           ANY_VALUE(n.n_name) AS n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in one quarter (minus the missing address/phone
    columns).

    Grouping on the customer KEY only (name/acctbal/nation ride along via
    first/ANY_VALUE — constant per key) keeps the aggregation key narrow;
    the returnflag filter lands on the lineitem scan.  nation is broadcast;
    customer/orders join unhinted.  Top-20 is deterministic via the
    (revenue, custkey) sort key.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey")
        .agg(
            F.first("c_name").alias("c_name"),
            dsum(_revenue(), "revenue"),
            F.first("c_acctbal").alias("c_acctbal"),
            F.first("n_name").alias("n_name"),
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT
      100.0 * (CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(floor(({_O_REV}) * 1e6 + 0.5) AS BIGINT)
                   ELSE 0 END) AS DOUBLE) / 1e6)
            / (CAST(SUM(CAST(floor(({_O_REV}) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)
        AS promo_revenue_pct,
      COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    GROUP BY ALL
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): share of one month's revenue from
    promo parts (fixture p_type is a single word, so the official
    ``LIKE 'PROMO%%'`` collapses to equality).

    One month of lineitem joins part on the part key — part is SF-scaled
    so no hint; AQE broadcasts at test SF.  Both the conditional and total
    revenue ride the carrier inside ONE aggregation (no self-join), and
    the final percentage is a single double division on identical
    operands in both engines.
    """
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    from data_warehouse_hive_spark.registry import CARRIER_SCALE, to_carrier

    rev_c = to_carrier(_revenue())
    promo_c = F.when(F.col("p_type") == "PROMO", rev_c).otherwise(F.lit(0).cast("long"))
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * (F.sum(promo_c).cast("double") / CARRIER_SCALE)
                / (F.sum(rev_c).cast("double") / CARRIER_SCALE)
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    SELECT ANY_VALUE(c.c_name) AS c_name, c.c_custkey, o.o_orderkey,
           strftime(ANY_VALUE(o.o_orderdate), '%Y-%m-%d') AS o_orderdate,
           ANY_VALUE(o.o_totalprice) AS o_totalprice,
           SUM(l.l_quantity) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_custkey, o.o_orderkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total quantity
    exceeds a threshold (250, rescaled to the fixture's ~4 lines/order so
    it selects the same ~top-1%% the official 300 does at full TPC-H
    width), with customer context.

    The HAVING subquery aggregates lineitem FIRST (partial sums map-side,
    one shuffle on orderkey), and the tiny survivor key set semi-joins
    back — at 100 TB the big-order list is a broadcast-able few thousand
    keys, so the re-join never shuffles the fact again. l_quantity is
    integral-valued double → SUM is exact in both engines, no carrier
    needed.
    """
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        o.join(big.withColumnRenamed("l_orderkey", "bk"), F.col("o_orderkey") == F.col("bk"), "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "o_orderkey")
        .agg(
            F.first("c_name").alias("c_name"),
            F.date_format(F.first("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate"),
            F.first("o_totalprice").alias("o_totalprice"),
            F.sum("l_quantity").alias("sum_qty"),
        )
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT {o_dsum(_O_REV, 'revenue')}, COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, minus the missing
    shipmode/shipinstruct legs): disjunctive brand/size/quantity branches
    over the part join.

    The OR-of-ANDs cannot become a join condition without a blowup, so it
    stays a post-join residual filter on the partkey equi-join — Catalyst
    still pushes the brand/size disjunction's common bound (p_size ≤ 15 …)
    to the part scan and the quantity bound to lineitem.  Single-row
    carrier-exact output.
    """
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = l.join(p, F.col("p_partkey") == F.col("l_partkey"))
    br = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(br).agg(
        dsum(_revenue(), "revenue"), F.count(F.lit(1)).alias("n_lines")
    )
