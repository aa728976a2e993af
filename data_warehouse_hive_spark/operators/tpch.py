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

    The region predicate is pushed down BOTH dimension paths before any
    fact shuffle: the 5-row ASIA nation list (nation⋈region, both
    fixed-size and broadcast) filters customer AND supplier first, so the
    customer⋈orders shuffle carries 1/5 of the customers and the supplier
    join probes 1/5 of the suppliers — at 100 TB that is the difference
    between shuffling 20 TB and 4 TB.  The SF-scaled supplier still joins
    WITHOUT a hint (AQE broadcasts at test scale, shuffles at 100 TB).
    Revenue ties are impossible to mis-order: output is a ≤25-row sort.
    """
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asian = n.join(r, n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c = t(spark, sf_dir, "customer").join(
        broadcast(asian), F.col("c_nationkey") == F.col("n_nationkey")
    )
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").join(
        broadcast(asian.select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
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


@query(
    "q_tpch_q01",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           {o_dsum('l_extendedprice', 'sum_base_price')},
           {o_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           SUM(l_quantity) / COUNT(*) AS avg_qty,
           {o_davg('l_extendedprice', 'avg_price')},
           {o_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report): the canonical full-scan grouped
    rollup — ~6 aggregate measures over ~99%% of lineitem, grouped by the
    4-combination (returnflag, linestatus) key.

    The shape every warehouse is judged on: one scan, map-side partial
    aggregation into 4 groups, a single tiny shuffle of partial states.
    Quantity is integral-valued double so its sum is exact in any order;
    every non-integral measure (price, discounted price, charge, the two
    monetary averages and avg_disc) rides the scaled-long carrier so
    partial/final merge order cannot flip a bit vs DuckDB's streaming sum.
    """
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_tpch_q02",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eur AS (
      SELECT ps.pk, ps.sk, ps.unit_cost, s.s_acctbal, s.s_name, n.n_name
      FROM ps
      JOIN supplier s ON ps.sk = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    best AS (SELECT pk, MIN(unit_cost) AS best_cost FROM eur GROUP BY pk)
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name
    FROM part p
    JOIN eur e ON e.pk = p.p_partkey
    JOIN best b ON b.pk = e.pk AND e.unit_cost = b.best_cost
    WHERE p.p_size = 15 AND p.p_type = 'LARGE'
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q_tpch_q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: the fixture has no
    partsupp table, so the part↔supplier catalog is derived from lineitem
    (distinct pairs, unit cost = min observed l_extendedprice/l_quantity)
    — the correlated-minimum join shape of the official query is kept
    intact (cheapest European supplier per part in a size/type slice).

    Scale: the part slice (p_size/p_type, ~1/250 selectivity) semi-filters
    lineitem BEFORE the (partkey, suppkey) aggregation — the one plan
    decision that matters here, cutting the big shuffle by the slice
    factor (this is what filtering partsupp by part first does in the
    official Q2).  The per-part minimum only has to exist for selected
    parts, so the prefilter is semantics-exact.  Then one small shuffle
    with map-side partial MIN, the region filter cuts suppliers before
    the per-part minimum (broadcast nation/region), and the best-cost
    re-join is per-part tiny.  MIN of identical doubles is
    order-independent — no carrier needed anywhere.
    """
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    lsel = l.join(
        p.select(F.col("p_partkey").alias("selk")),
        F.col("l_partkey") == F.col("selk"),
        "left_semi",
    )
    ps = lsel.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        ps.join(s, F.col("sk") == F.col("s_suppkey"))
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("pk", "sk", "unit_cost", "s_acctbal", "s_name", "n_name")
        # consumed by both the candidate join and the per-part minimum —
        # checkpoint so the filtered aggregation doesn't replay per branch
        .localCheckpoint(eager=False)
    )
    best = eur.groupBy(F.col("pk").alias("bpk")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    return (
        p.join(eur, F.col("pk") == F.col("p_partkey"))
        .join(
            best,
            (F.col("bpk") == F.col("pk")) & (F.col("unit_cost") == F.col("best_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q_tpch_q07",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           {o_dsum(_O_REV, 'revenue')}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY n1.n_name, n2.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by year — the double-nation-dimension join.

    Both nation dimensions broadcast (25 rows each, aliased to distinct
    roles); the OR-of-nation-pairs predicate evaluates on broadcast-joined
    columns so the two fact shuffles (lineitem⋈orders, +customer) carry
    only surviving rows of the 2-year window.  Supplier joins unhinted —
    AQE broadcasts at test SF, shuffles at 100 TB.
    """
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1995-01-01").cast("timestamp"),
            F.lit("1996-12-31").cast("timestamp"),
        )
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = (
        t(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        t(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(_revenue(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_tpch_q08",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                 THEN CAST(floor(({_O_REV}) * 1e6 + 0.5) AS BIGINT)
                 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(floor(({_O_REV}) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
             AS mkt_share,
           COUNT(*) AS n_lines
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN region r ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'AMERICA'
      AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
      AND p.p_type = 'ECONOMY'
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_tpch_q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of ECONOMY-part
    revenue sold into the AMERICA region, by year.

    The share is numerator-conditional over denominator-total computed in
    ONE aggregation on the scaled-long carrier (the Q14 idiom — no
    self-join, and the final division sees identical operands in both
    engines).  Region prunes customer nations via broadcast before the
    fact shuffles; part/supplier/customer all join unhinted.
    """
    from data_warehouse_hive_spark.registry import to_carrier

    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01").cast("timestamp"),
            F.lit("1996-12-31").cast("timestamp"),
        )
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rk")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    rev_c = to_carrier(_revenue())
    nat_c = F.when(F.col("supp_nation") == "NATION_3", rev_c).otherwise(
        F.lit(0).cast("long")
    )
    return (
        p.join(l, F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(broadcast(r), F.col("n1_rk") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(nat_c).cast("double") / F.sum(rev_c).cast("double")).alias(
                "mkt_share"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_year")
    )


@query(
    "q_tpch_q09",
    oracle=f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           {o_dsum('l_extendedprice * (1 - l_discount)'
                   ' - 0.1 * p_retailprice * l_quantity', 'sum_profit')}
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE 'red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: no partsupp →
    ps_supplycost is replaced by the deterministic cost proxy
    0.1·p_retailprice per unit, keeping the official profit-by-
    supplier-nation-and-year shape over a part-name slice ('red%' —
    the fixture's p_name is 'adjective noun').

    The name LIKE prunes part first (prefix LIKE pushes to the scan as a
    range), then lineitem joins part and orders (the two fact-side
    shuffles); supplier unhinted, nation broadcast.  The profit expression
    is computed per-row identically in both engines, then carrier-summed.
    """
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    profit = _revenue() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        p.join(l, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(profit, "sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "q_tpch_q11",
    oracle=f"""
    WITH pv AS (
      SELECT l.l_partkey,
             {o_dsum(_O_REV, 'part_value')}
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, part_value
    FROM pv
    WHERE part_value > (SELECT 0.002 * SUM(part_value) FROM pv)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted: no partsupp →
    the per-part "stock value" is the revenue contributed through
    NATION_5's suppliers, and the query keeps the official
    group-then-compare-against-scalar-fraction-of-total shape.

    One shuffle builds the per-part value (nation filter cuts the fact
    via the broadcast supplier side first); the global total is a scalar
    broadcast back over the grouped result — no second fact scan.  The
    threshold comparison is double>double on identically-derived carrier
    sums, so the survivor set is bit-identical cross-engine.
    """
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    pv = (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(dsum(_revenue(), "part_value"))
    )
    total = pv.agg((F.lit(0.002) * F.sum("part_value")).alias("threshold"))
    return (
        pv.join(broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), F.col("l_partkey"))
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-mode priority), adapted: the fixture has no
    l_shipmode/l_commitdate/l_receiptdate, so the mode dimension becomes
    l_linestatus and the late-delivery predicate becomes the one-year
    shipdate window — the conditional-count-by-priority-class shape is
    unchanged.

    One fact-fact equi-join (orderkey) with the date window pushed to the
    lineitem scan; the CASE counts merge map-side into a ≤2-row result.
    Integer conditional sums are exact everywhere — no carrier needed.
    """
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution), adapted: the
    official o_comment NOT LIKE filter becomes an order-priority exclusion
    (the fixture has no comments); the two-level aggregate with the
    NULL-preserving left join is the point of the query.

    Orders filter before the join; the left join shuffles on custkey with
    the per-customer count, then the distribution re-aggregates the tiny
    (customer, count) pairs — the second shuffle carries one row per
    customer, and the final histogram is a few dozen rows.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {o_dsum(_O_REV, 'total_revenue')}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with maximum quarterly
    revenue — the view-plus-scalar-max self-reference.

    The revenue view aggregates one quarter of lineitem in ONE shuffle,
    and the scalar MAX rides an unpartitioned window over that same
    grouped result — lineitem is scanned exactly once by construction
    (a separate MAX branch would re-scan the fact: Spark's exchange
    reuse does not fire across the differing aggregate subtrees).  The
    single-partition window holds one small row per supplier, not fact
    rows.  Carrier sums make the equality on a double safe: both engines
    derive bit-identical totals, so "= MAX" selects the same supplier(s).
    """
    from pyspark.sql import Window

    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_revenue(), "total_revenue")
    )
    top = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(top, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: the
    part↔supplier pairs come from DISTINCT lineitem (no partsupp), and
    the "customer complaints" supplier exclusion becomes a negative-
    balance exclusion (no s_comment) — the distinct-count-by-part-class
    with a NOT-IN anti-join is the preserved shape.

    The part filter (7 sizes, brand/type exclusions) semi-filters
    lineitem BEFORE the pair-distinct, so the big shuffle carries only
    qualifying parts' lines — the later inner join selects exactly these
    anyway, making the prefilter semantics-exact.  The pair-distinct is
    then one shuffle with partial distinct map-side; the excluded-
    supplier set is tiny and anti-joined via broadcast.
    """
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    pairs = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            p.select(F.col("p_partkey").alias("selk")),
            F.col("l_partkey") == F.col("selk"),
            "left_semi",
        )
        .distinct()
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        pairs.join(broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q_tpch_q17",
    oracle=f"""
    WITH avgq AS (
      SELECT l_partkey AS apk, SUM(l_quantity) / COUNT(*) AS avg_qty
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1e6 / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avgq a ON a.apk = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < 0.5 * a.avg_qty
    GROUP BY ALL
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from lines whose
    quantity is below half the part's average (official 0.2·avg rescaled
    to the fixture's uniform 1..50 quantity so the filter keeps ~25%% of
    one brand's lines; no p_container in the fixture).

    The correlated average becomes a grouped pre-aggregate joined back on
    partkey.  Quantity is integral-valued double → SUM/COUNT division is
    exact in both engines without a carrier; the revenue output rides the
    carrier.  At scale the brand filter prunes part, and AQE broadcasts
    the small filtered part side into both fact joins.

    NOTE the avg is computed over ALL parts (like the official query) but
    joined only to Brand#3 lines — Catalyst pushes a semi-join-style
    reduction only if beneficial; the aggregate is one lineitem shuffle.
    """
    l = t(spark, sf_dir, "lineitem")
    avgq = l.groupBy(F.col("l_partkey").alias("apk")).agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    from data_warehouse_hive_spark.registry import CARRIER_SCALE, to_carrier

    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(avgq, F.col("apk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (
                F.sum(to_carrier(F.col("l_extendedprice"))).cast("double")
                / CARRIER_SCALE
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q20",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    tot AS (SELECT l_partkey AS tpk, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey),
    dominant AS (
      SELECT DISTINCT sh.l_suppkey
      FROM shipped sh
      JOIN tot ON tot.tpk = sh.l_partkey
      JOIN part p ON p.p_partkey = sh.l_partkey
      WHERE p.p_name LIKE 'cold%' AND sh.qty > 0.3 * tot.total_qty
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s.s_name, s.s_suppkey
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: no partsupp
    availqty, so "excess stock" becomes shipping dominance — suppliers
    who shipped >30%% of a 'cold' part's 1996 volume.  The official
    nested-subquery-chain shape (per-pair aggregate compared against a
    per-part aggregate, distilled to a supplier semi-join) is preserved;
    the official nation filter is dropped to keep the result non-trivial
    at small SF (nation rides along as output instead).

    One shuffle builds per-(part,supplier) quantities from one year of
    fact; the per-part total derives from THAT aggregate (no second fact
    scan); the dominant-supplier key set is tiny and semi-joins supplier
    via broadcast.  Integral quantity sums — exact without a carrier.
    """
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        # consumed by the per-part total AND the dominance filter —
        # checkpoint so the one-year fact aggregation runs once
        .localCheckpoint(eager=False)
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("tpk")).agg(
        F.sum("qty").alias("total_qty")
    )
    cold = t(spark, sf_dir, "part").filter(F.col("p_name").like("cold%")).select(
        "p_partkey"
    )
    dominant = (
        shipped.join(tot, F.col("tpk") == F.col("l_partkey"))
        .join(cold, F.col("p_partkey") == F.col("l_partkey"))
        .filter(F.col("qty") > 0.3 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_name", "s_suppkey")
    )


@query(
    "q_tpch_q21",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, ANY_VALUE(n.n_name) AS n_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" =
    shipped more than 90 days after the order date (the fixture has no
    commit/receipt dates), and the official nation filter is dropped so
    the ranking is global (nation is carried as output).  The signature
    EXISTS / NOT-EXISTS pair — the supplier is late in a multi-supplier
    order where NO OTHER supplier is late — is preserved exactly.

    The late set is computed ONCE (fact⋈fact on orderkey, predicate on
    broadcast-able order columns) and reused for both the probe side and
    the NOT-EXISTS side; the EXISTS legs become left-semi / left-anti
    joins on (orderkey, suppkey≠) — no row blowup is ever materialized.
    """
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        # probe side (l1) and the NOT-EXISTS side (l3) both read this —
        # checkpoint so the fact⋈orders lateness join runs once
        .localCheckpoint(eager=False)
    )
    l2 = l.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        late.join(
            l2,
            (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("k3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")),
            "left_anti",
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.first("n_name").alias("n_name"), F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


@query(
    "q_tpch_q22",
    oracle=f"""
    WITH sub AS (
      SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode, c_custkey, c_acctbal
      FROM customer
      WHERE CAST(c_nationkey % 5 AS INT) IN (0, 2, 4)
    ),
    threshold AS (
      SELECT CAST(SUM(CAST(floor(c_acctbal * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1e6 / CAST(COUNT(*) AS DOUBLE) AS avg_bal
      FROM sub WHERE c_acctbal > 0.0
    )
    SELECT cntrycode, COUNT(*) AS numcust,
           {o_dsum('c_acctbal', 'totacctbal')}
    FROM sub, threshold
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = sub.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: the country code is
    c_nationkey mod 5 (the fixture has no c_phone) — rich-but-inactive
    customers (above-average balance, no orders since 1999 — every
    fixture customer has SOME order, so the official "no orders at all"
    is tightened to dormancy) per code group.  The official
    scalar-average subquery + anti-join shape is exact.

    The scalar threshold is a carrier-exact average broadcast over the
    filtered customer set; the no-orders test is a left-anti join against
    the orders custkey projection — at scale that's a shuffle-on-key anti
    join AQE can convert when the survivor side is small.
    """
    from data_warehouse_hive_spark.registry import to_carrier

    c = t(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_nationkey") % 5).cast("int")
    )
    sub = c.filter(F.col("cntrycode").isin(0, 2, 4))
    threshold = sub.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(to_carrier(F.col("c_acctbal"))).cast("double")
            / 1e6
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        sub.join(broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal", "totacctbal"))
        .orderBy("cntrycode")
    )
