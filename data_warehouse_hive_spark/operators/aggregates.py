"""Aggregations — SURVEY.md §2.4.

Provenance: the reference's own code issues only COUNT(*) (reference
backend/hive_manager.py:400-401) and computes client-side column stats in
Polars (backend/csv_processor.py:147-170); all grouped SQL aggregation is
delegated to the deployed Hive 4.1.0.  Here every aggregate is a
DataFrame plan — Spark does partial (map-side) + final aggregation
automatically, which is exactly the two-phase combine a 1000-executor
cluster needs: per-partition partial state, one shuffle on the group keys,
final merge.  Group-key cardinality is low for all queries below, so the
shuffled data volume is O(groups × partitions), independent of row count.

Floating-point aggregates use the registry's exact scaled-long carrier
idiom (see registry.py docstring) so results are bit-identical across
engines regardless of aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_hive_spark.registry import DEC, davg, dsum, o_davg, o_dsum, query
from data_warehouse_hive_spark.tables import t


@query(
    "q_count_star",
    oracle="SELECT COUNT(*) AS n_rows FROM lineitem",
)
def q_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT COUNT(*) — the one real query the reference backend issues
    (reference backend/hive_manager.py:400-401)."""
    return t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "q_groupby_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_quantity', 'sum_qty')},
           {o_dsum('l_extendedprice', 'sum_base_price')},
           {o_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {o_davg('l_quantity', 'avg_qty')},
           {o_davg('l_extendedprice', 'avg_price')},
           {o_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary (filter → grouped agg).

    Exercises scan + pushed filter + partial/final hash aggregation in one
    plan.  At 100 TB this stays a single shuffle of ~4 groups × partial
    states — the canonical scalable aggregation shape.
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_stats_profile",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS qty_nulls,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS qty_distinct,
           MIN(l_quantity) AS qty_min,
           MAX(l_quantity) AS qty_max,
           {o_davg('l_quantity', 'qty_mean')},
           MIN(l_extendedprice) AS price_min,
           MAX(l_extendedprice) AS price_max,
           {o_davg('l_extendedprice', 'price_mean')},
           SQRT((((CAST(SUM(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)
                            * CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)
                            // 2147483648) AS DOUBLE) * 2147483648.0
                   + CAST(SUM(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)
                              * CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)
                              % 2147483648) AS DOUBLE)) / 1e4)
                 - (CAST(SUM(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) / 1e2)
                   * (CAST(SUM(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) / 1e2)
                   / CAST(COUNT(l_extendedprice) AS DOUBLE))
                / (CAST(COUNT(l_extendedprice) AS DOUBLE) - 1.0)) AS price_std
    FROM lineitem
    """,
)
def q_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile: null/distinct counts, min/max/mean/stddev in ONE
    pass — the Spark-native form of the reference's Polars column stats
    (reference backend/csv_processor.py:147-170, served by
    backend/app.py:149-180).

    stddev is derived from exact integer-carrier sums (sum, sum-of-squares)
    so the value is bit-identical across engines; Spark's own stddev_samp
    would differ from DuckDB's in the last ulps due to aggregation order.

    The exact distinct count runs as its own aggregation, cross-joined
    back onto the one-row stats result: mixing count(distinct) into the
    main agg makes Catalyst key EVERY aggregate buffer by l_quantity in
    the partial stage (hash table per value × 11 buffers) — splitting it
    keeps the main agg a flat single-buffer pass, and both scans prune to
    the two referenced columns.

    The sum of squares avoids a DECIMAL buffer (BigDecimal per row,
    outside codegen) via a hi/lo split accumulator: y = floor(x·100+0.5)
    as long, then Σ(y² >> 31) and Σ(y² mod 2³¹) as two long sums,
    recombined in double at the end.  Every op is integer or a shared
    IEEE formula, so the value is bit-identical in DuckDB; the long sums
    overflow only past ~2e14 rows per aggregation.
    """
    li = t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    y = F.floor(price * 1e2 + 0.5).cast("long")
    yy = y * y
    two31 = F.lit(2147483648)
    sumsq_price = (
        F.sum(F.shiftright(yy, 31)).cast("double") * 2147483648.0
        + F.sum(yy % two31).cast("double")
    ) / 1e4
    sum_price = F.sum(y).cast("double") / 1e2
    n_price = F.count(price).cast("double")
    stats = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("l_quantity")).alias("qty_nulls"),
        F.min("l_quantity").alias("qty_min"),
        F.max("l_quantity").alias("qty_max"),
        davg("l_quantity", "qty_mean"),
        F.min(price).alias("price_min"),
        F.max(price).alias("price_max"),
        davg(price, "price_mean"),
        F.sqrt(
            (sumsq_price - sum_price * sum_price / n_price) / (n_price - F.lit(1.0))
        ).alias("price_std"),
    )
    nd = li.agg(F.countDistinct("l_quantity").alias("qty_distinct"))
    return stats.crossJoin(nd).select(
        "n_rows",
        "qty_nulls",
        "qty_distinct",
        "qty_min",
        "qty_max",
        "qty_mean",
        "price_min",
        "price_max",
        "price_mean",
        "price_std",
    )


@query(
    "q_agg_distinct",
    oracle=f"""
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nd_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS nd_supps,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_distinct_qty
    FROM lineitem
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) / SUM(DISTINCT).  The distinct-sum goes through the
    exact carrier idiom so its value is order-independent."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("nd_parts"),
        F.countDistinct("l_suppkey").alias("nd_supps"),
        F.sum_distinct(F.col("l_quantity").cast(DEC)).cast("double").alias(
            "sum_distinct_qty"
        ),
    )


@query(
    "q_agg_approx",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_nd,
           TRUE AS approx_within_tol
    FROM lineitem
    """,
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++).

    HLL estimates differ across engines by design, so the checkable
    contract is emitted instead: the exact NDV plus a boolean asserting the
    Spark approx estimate (rsd=1%) landed within 5% (≈5σ) of exact.

    Exact and approx run as separate aggregations (cross-joined 1-row
    results): co-locating count(distinct) with any other aggregate makes
    Catalyst key the partial stage by the distinct column, dragging the
    HLL buffer through a per-value hash table — split, each is a flat
    single-pass agg (~10× here).
    """
    li = t(spark, sf_dir, "lineitem")
    exact = li.agg(F.countDistinct("l_orderkey").alias("exact_nd"))
    approx = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_nd")
    )
    agg = exact.crossJoin(approx)
    return agg.select(
        "exact_nd",
        (
            F.abs(F.col("approx_nd") - F.col("exact_nd"))
            / F.col("exact_nd").cast("double")
            <= 0.05
        ).alias("approx_within_tol"),
    )


@query(
    "q_having",
    oracle=f"""
    SELECT l_suppkey,
           {o_dsum('l_quantity', 'sum_qty')},
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_suppkey
    HAVING CAST(SUM(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 > 500
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — a filter over the aggregated result (post-shuffle, tiny)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("sum_qty") > 500)
    )


@query(
    "q_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_extendedprice', 'sum_price')},
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... WITH ROLLUP (hierarchical subtotals + grand total)."""
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_extendedprice", "sum_price"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_quantity', 'sum_qty')},
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... WITH CUBE (all grouping-key combinations)."""
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           {o_dsum('l_extendedprice', 'sum_price')},
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS + grouping_id() (same MSB-first bitmask in Spark and
    DuckDB, verified).

    sum_price rides the BIGINT-micros carrier on BOTH sides (not a
    DECIMAL sum cast at the end): the r14 sf10 sweep caught a last-ulp
    divergence — once the micros mass crosses 2^53 the
    decimal-sum→double and int-sum→double÷1e6 paths round at different
    points, so the two engines must share ONE rounding sequence.
    Carrier headroom: Σ micros ≈ 1.6e18 at sf10, bound 2^63 ≈ 9.2e18 →
    safe past sf50."""
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               CAST(SUM(CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_price,
               COUNT(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.25) AS p25_price,
           quantile_disc(l_extendedprice, 0.5)  AS median_price,
           quantile_disc(l_extendedprice, 0.75) AS p75_price,
           quantile_disc(l_extendedprice, 0.95) AS p95_price,
           quantile_disc(l_quantity, 0.5)       AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile / median aggregates (grouped), DISCRETE variant:
    percentile_disc picks an actual data value at the target rank, so the
    result is exact and engine-portable — no interpolation arithmetic
    whose op order could differ in the last ulp (percentile_cont's
    (1-f)·a+f·b vs a+f·(b-a)).  At scale Spark computes exact percentiles
    with a single shuffle of per-partition partial digests per group."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25_price,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_extendedprice) AS median_price,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS p75_price,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95_price,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity)      AS median_qty
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "q_agg_approx_percentile",
    oracle="""
    SELECT quantile_disc(l_extendedprice, 0.5) AS exact_median,
           TRUE AS approx_within_tol
    FROM lineitem
    """,
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile (t-digest style sketch).  Like q_agg_approx,
    sketch outputs differ across engines by design, so the checkable
    contract is the exact discrete median plus a boolean asserting the
    approx estimate (accuracy=10000) landed within 1% of it.  At scale
    approx_percentile is one pass + tiny mergeable sketches per
    partition — the shape to prefer over exact percentiles when the
    tolerance is acceptable."""
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    exact = spark.sql(
        "SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
        " AS exact_median FROM lineitem"
    )
    approx = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median")
    )
    return exact.crossJoin(approx).select(
        "exact_median",
        (
            F.abs(F.col("approx_median") - F.col("exact_median"))
            / F.col("exact_median")
            <= 0.01
        ).alias("approx_within_tol"),
    )


@query(
    "q_agg_listagg",
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, '|' ORDER BY l_linestatus)
             AS statuses,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — LISTAGG(DISTINCT …) WITHIN GROUP
    (Spark 4.0 builtin; DuckDB string_agg).  The explicit WITHIN GROUP
    ordering is what makes the concatenation deterministic across
    engines and across partition orders — an unordered listagg over a
    shuffled table is run-to-run nondeterministic by construction.

    Scale: distinct + sort happen per group after a partial-aggregated
    shuffle on l_returnflag (3-value domain → tiny result; the DISTINCT
    set per group, not the row count, bounds memory).
    """
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr(
                "listagg(DISTINCT l_linestatus, '|')"
                " WITHIN GROUP (ORDER BY l_linestatus)"
            ).alias("statuses"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q_agg_mode",
    oracle="""
    WITH counted AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY COUNT(*) DESC, o_orderpriority
             ) AS rk
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS n_mode
    FROM counted WHERE rk = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: most frequent o_orderpriority per
    order status, ties broken by the lexicographically smallest value.

    Both engines ship a mode() builtin (Spark 3.4+, DuckDB), but neither
    defines which of several tied modes it returns — a cross-engine
    determinism trap.  The count + row_number idiom pins the tie-break
    and costs the same two shuffles mode() needs internally (group count,
    then per-key argmax on the already-tiny counted domain).
    """
    from pyspark.sql import Window

    counted = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("n_mode"),
        )
    )


@query(
    "q_agg_hll",
    oracle="""
    SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_exact,
           true AS est_within_5pct
    FROM customer
    """,
)
def q_agg_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches builtins, Spark 3.5+):
    one binary sketch per nation via hll_sketch_agg, merged with
    hll_union_agg, estimated with hll_sketch_estimate — the partial/
    rollup shape that makes distinct-count cubes feasible at 100 TB
    (store per-partition sketches once, union them for any slice, never
    re-scan raw data).

    Checkable contract (same pattern as q_agg_approx): the exact global
    distinct count, plus a flag that the merged-sketch estimate lands
    within 5% of it.  The sketch bytes themselves are engine-private and
    never leave the plan.
    """
    per_nation = (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.hll_sketch_agg("c_custkey").alias("sk"))
    )
    merged = per_nation.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = t(spark, sf_dir, "customer").agg(
        F.countDistinct("c_custkey").alias("n_exact")
    )
    return exact.crossJoin(merged).select(
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            / F.col("n_exact").cast("double")
            <= 0.05
        ).alias("est_within_5pct"),
    )


@query(
    "q_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, quantile_disc(l_extendedprice, 0.5) AS med_price
      FROM lineitem GROUP BY l_returnflag
    ),
    dev AS (
      SELECT l.l_returnflag, m.med_price,
             abs(l.l_extendedprice - m.med_price) AS adev
      FROM lineitem l JOIN med m USING (l_returnflag)
    ),
    mad AS (
      SELECT l_returnflag, quantile_disc(adev, 0.5) AS mad_price
      FROM dev GROUP BY l_returnflag
    )
    SELECT d.l_returnflag,
           MIN(d.med_price) AS med_price,
           MIN(a.mad_price) AS mad_price,
           CAST(SUM(CASE WHEN d.adev > 5 * a.mad_price THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           COUNT(*) AS n_rows
    FROM dev d JOIN mad a USING (l_returnflag)
    GROUP BY d.l_returnflag
    """,
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: per-group median + MAD (median absolute
    deviation) and the count of rows beyond 5 MADs — the
    skew/heavy-tail-safe alternative to mean±k·stddev for data-quality
    monitoring (a handful of corrupt prices cannot drag the threshold
    the way they drag a stddev).

    Everything is engine-exact: percentile_disc returns actual data
    values, deviations are IEEE subtractions on identical operands, and
    the 5·MAD comparison is deterministic — no carrier needed.  Scale:
    two grouped exact percentiles (each one shuffle on the 3-value group
    key, per-group sort) + broadcast-joinable 3-row med/mad tables back
    against the fact; with a tolerance budget, swap percentile_disc for
    the mergeable approx_percentile sketch and lose the second scan.
    """
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_mad")
    return spark.sql(
        """
        WITH med AS (
          SELECT l_returnflag,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)
                   AS med_price
          FROM lineitem_mad GROUP BY l_returnflag
        ),
        dev AS (
          SELECT l.l_returnflag, m.med_price,
                 abs(l.l_extendedprice - m.med_price) AS adev
          FROM lineitem_mad l JOIN med m USING (l_returnflag)
        ),
        mad AS (
          SELECT l_returnflag,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS mad_price
          FROM dev GROUP BY l_returnflag
        )
        SELECT d.l_returnflag,
               MIN(d.med_price) AS med_price,
               MIN(a.mad_price) AS mad_price,
               CAST(SUM(CASE WHEN d.adev > 5 * a.mad_price THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers,
               COUNT(*) AS n_rows
        FROM dev d JOIN mad a USING (l_returnflag)
        GROUP BY d.l_returnflag
        """
    )


@query(
    "q_agg_corr",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
                 AS DECIMAL(38,0))) AS sx,
             SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 AS DECIMAL(38,0))) AS sy,
             SUM(CAST(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
                    * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 AS DECIMAL(38,0))) AS sxy,
             SUM(CAST(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
                    * CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
                 AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 AS DECIMAL(38,0))) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
             AS corr_qty_price,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9)
             AS slope_price_per_qty
    FROM s
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation + regression slope per group (Hive corr/covar/regr_*
    surface), computed ENGINE-EXACTLY: both engines' corr() builtins
    stream IEEE partial sums in partition order, so their last ulps
    differ run to run — instead the five raw moments are accumulated as
    exact integers (2-decimal quantization, DECIMAL(38) sums so 100 TB
    cannot overflow), and the closed-form corr/slope is evaluated in
    double on identical operands.  Correlation and slope are invariant
    under the equal per-axis scaling, so the quantized answer IS the
    answer for 2-decimal currency/quantity data.

    One partial+final agg, one shuffle on the 3-value group key; the
    moment-vector is the mergeable form (same shape corr() uses
    internally, minus the float nondeterminism).
    """
    x = F.floor(F.col("l_quantity") * 100 + 0.5).cast("long")
    y = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    D = "decimal(38,0)"
    s = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x.cast(D)).alias("sx"),
            F.sum(y.cast(D)).alias("sy"),
            F.sum((x * y).cast(D)).alias("sxy"),
            F.sum((x * x).cast(D)).alias("sxx"),
            F.sum((y * y).cast(D)).alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    cov_n = nd * sxy - sx * sy
    return s.select(
        "l_returnflag",
        "n",
        F.round(
            cov_n / (F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)), 9
        ).alias("corr_qty_price"),
        F.round(cov_n / (nd * sxx - sx * sx), 9).alias("slope_price_per_qty"),
    )


@query(
    "q_agg_salted",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           {o_dsum('l_extendedprice', 'revenue')},
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage SALTED aggregation — the skewed-groupBy mitigation,
    spelled out: stage 1 aggregates on (key, salt) so one hot key's rows
    spread over S reducers; stage 2 merges the S partials per key.  The
    oracle is the plain single-stage group-by — results are identical
    because every aggregate here is mergeable (count=Σcount,
    carrier-sum=Σsum, max=max of maxes).

    Spark's partial/final HashAggregate already does this map-side, so
    salting only pays when the FINAL stage itself skews (billions of rows
    under one key after map-side combine — e.g. high-cardinality
    accumulators where partial buffers stay per-row).  S=8; the salt is
    the same deterministic xxhash64 used by q_join_salted.
    """
    SALT = 8
    li = t(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT))
    )
    partial = li.groupBy("l_returnflag", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.floor(F.col("l_extendedprice") * 1e6 + 0.5).cast("long")).alias(
            "psum"
        ),
        F.max("l_quantity").alias("pmax"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        (F.sum("psum").cast("double") / 1e6).alias("revenue"),
        F.max("pmax").cast("double").alias("max_qty"),
    )


@query(
    "q_groupby_all",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {o_dsum('l_extendedprice', 'revenue')}
    FROM lineitem
    GROUP BY ALL
    """,
)
def q_groupby_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+ / DuckDB shared shorthand): every
    non-aggregate select item becomes a group key — the
    keep-the-projection-and-grouping-in-sync convenience both engines
    now share; same plan as the explicit key list.
    """
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gba")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT))
                    AS DOUBLE) / 1e6 AS revenue
        FROM lineitem_gba
        GROUP BY ALL
        """
    )


@query(
    "q_dq_checks",
    oracle="""
    WITH pk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS pk_dupes FROM (
        SELECT l_orderkey, l_linenumber FROM lineitem
        GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1
      )
    ),
    fk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS fk_orphans
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_custkey IS NULL
    ),
    dm AS (
      SELECT CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_shipdates,
             CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS discount_oob,
             COUNT(*) AS rows_checked
      FROM lineitem
    )
    SELECT pk.pk_dupes, fk.fk_orphans, dm.null_shipdates, dm.discount_oob,
           dm.rows_checked,
           (pk.pk_dupes = 0 AND fk.fk_orphans = 0
            AND dm.null_shipdates = 0 AND dm.discount_oob = 0) AS contract_ok
    FROM pk, fk, dm
    """,
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract validation in one pass per table — the dbt-test /
    quality-gate family: primary-key uniqueness (grouped dupe count),
    referential integrity (anti-join orphan count), not-null rate, and
    value-domain bounds, folded into a single `contract_ok` verdict a
    pipeline gates a publish on.

    Scale shapes: the PK check is one shuffle on the (already uniform)
    key; the FK check is an anti-join where the dimension side broadcasts
    under the usual thresholds; the null/domain scans are conditional
    aggregations fused into one pass.  The three 1-row results cross-join
    for free.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    pk = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("pk_dupes"))
    )
    fk = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("fk_orphans"))
    )
    dm = li.agg(
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0)).alias(
            "null_shipdates"
        ),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(
                0
            )
        ).alias("discount_oob"),
        F.count(F.lit(1)).alias("rows_checked"),
    )
    return (
        pk.crossJoin(fk)
        .crossJoin(dm)
        .withColumn(
            "contract_ok",
            (F.col("pk_dupes") == 0)
            & (F.col("fk_orphans") == 0)
            & (F.col("null_shipdates") == 0)
            & (F.col("discount_oob") == 0),
        )
    )


@query(
    "q_agg_percentile_cont",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 9) AS p25_c,
           round(quantile_cont(l_extendedprice, 0.50), 9) AS p50_c,
           round(quantile_cont(l_extendedprice, 0.90), 9) AS p90_c,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated (continuous) percentiles — PERCENTILE_CONT WITHIN
    GROUP, the ANSI twin of the discrete variant (q_agg_percentile):
    between-rank answers come from linear interpolation of the two
    nearest data values.  Both engines interpolate the same two exact
    data points; the lerp arithmetic can differ in the last ulp between
    implementations, so values are pinned at 9 dp (the same discipline
    as the transcendental functions).

    Scale: exact percentiles need the per-group sorted view — one
    shuffle + per-group sort; the mergeable-sketch alternative is
    q_agg_approx_percentile.
    """
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_pc")
    return spark.sql(
        """
        SELECT l_returnflag,
               round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 9) AS p25_c,
               round(percentile_cont(0.50) WITHIN GROUP (ORDER BY l_extendedprice), 9) AS p50_c,
               round(percentile_cont(0.90) WITHIN GROUP (ORDER BY l_extendedprice), 9) AS p90_c,
               COUNT(*) AS n
        FROM lineitem_pc
        GROUP BY l_returnflag
        """
    )


@query(
    "q_agg_filtered",
    oracle=f"""
    SELECT l_linestatus,
           COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
           CAST(SUM(CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT))
                FILTER (WHERE l_discount > 0.05) AS DOUBLE) / 1e6
             AS sum_price_discounted,
           MAX(l_quantity) FILTER (WHERE l_returnflag = 'R') AS max_qty_returned,
           bool_and(l_quantity > 0) AS all_positive_qty,
           bool_or(l_tax > 0.07) AS any_high_tax
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation — the ANSI ``FILTER (WHERE ...)`` clause
    plus the boolean reducers ``bool_and``/``bool_or``: several
    differently-predicated aggregates over ONE scan instead of N
    self-joined subqueries.

    The reference delegates this SQL surface to Hive (same family as
    `CASE WHEN` counting); Spark evaluates each FILTER predicate inside
    the partial-aggregation operator, so the plan is still a single
    scan + one shuffle of per-group partial states — the per-predicate
    work is map-side and the shape is identical at 100 TB.  The filtered
    double sum rides the exact scaled-long carrier so partial/final
    aggregation order cannot perturb the result.
    """
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_fil")
    return spark.sql(
        """
        SELECT l_linestatus,
               COUNT(*) AS n_rows,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
               CAST(SUM(CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT))
                    FILTER (WHERE l_discount > 0.05) AS DOUBLE) / 1e6
                 AS sum_price_discounted,
               MAX(l_quantity) FILTER (WHERE l_returnflag = 'R') AS max_qty_returned,
               bool_and(l_quantity > 0) AS all_positive_qty,
               bool_or(l_tax > 0.07) AS any_high_tax
        FROM lineitem_fil
        GROUP BY l_linestatus
        """
    )


@query(
    "q_agg_winsorized",
    oracle=f"""
    WITH b AS (
      SELECT l_returnflag,
             quantile_disc(l_extendedprice, 0.05) AS lo,
             quantile_disc(l_extendedprice, 0.95) AS hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE l_extendedprice < lo) AS n_clipped_low,
           COUNT(*) FILTER (WHERE l_extendedprice > hi) AS n_clipped_high,
           ANY_VALUE(lo) AS p05_price,
           ANY_VALUE(hi) AS p95_price,
           {o_davg('least(greatest(l_extendedprice, lo), hi)', 'winsorized_mean')}
    FROM lineitem l JOIN b USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def q_agg_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (percentile-clipped) mean per group — the robust-stats
    aggregate an outlier-heavy corpus pipeline uses where a plain AVG
    would let a single corrupt row dominate (same family as
    q_anomaly_mad, but clipping instead of flagging).

    Two passes, both scalable: (1) exact per-group p05/p95 via
    percentile_disc — discrete picks are actual data values, so the
    bounds are engine-exact with no lerp arithmetic; (2) re-scan with the
    3-row bounds table joined in (Spark auto-broadcasts it — no shuffle
    on the fact side beyond the final 3-group aggregation), clamping via
    least/greatest and averaging through the exact carrier.  ANY_VALUE
    on the bounds is deterministic here because each group joins exactly
    one bounds row.
    """
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_win")
    return spark.sql(
        """
        WITH b AS (
          SELECT l_returnflag,
                 percentile_disc(0.05) WITHIN GROUP (ORDER BY l_extendedprice) AS lo,
                 percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS hi
          FROM lineitem_win GROUP BY l_returnflag
        )
        SELECT l.l_returnflag,
               COUNT(*) AS n_rows,
               COUNT(*) FILTER (WHERE l_extendedprice < lo) AS n_clipped_low,
               COUNT(*) FILTER (WHERE l_extendedprice > hi) AS n_clipped_high,
               ANY_VALUE(lo) AS p05_price,
               ANY_VALUE(hi) AS p95_price,
               CAST(SUM(CAST(floor(least(greatest(l_extendedprice, lo), hi) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1e6 / CAST(COUNT(least(greatest(l_extendedprice, lo), hi)) AS DOUBLE)
                 AS winsorized_mean
        FROM lineitem_win l JOIN b USING (l_returnflag)
        GROUP BY l.l_returnflag
        """
    )


_HIST_WIDTH = 5000.0  # equi-width bin size over l_extendedprice


@query(
    "q_agg_histogram",
    oracle=f"""
    SELECT CAST(floor(l_extendedprice / {_HIST_WIDTH}) AS BIGINT) AS bin,
           CAST(floor(l_extendedprice / {_HIST_WIDTH}) AS BIGINT) * {_HIST_WIDTH}
             AS bin_lo,
           (CAST(floor(l_extendedprice / {_HIST_WIDTH}) AS BIGINT) + 1) * {_HIST_WIDTH}
             AS bin_hi,
           COUNT(*) AS n_rows,
           {o_dsum('l_extendedprice', 'sum_price')}
    FROM lineitem
    GROUP BY bin
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram — the profiling aggregate behind distribution
    plots and coarse skew detection (the reference's stats endpoint stops
    at min/max/mean; a histogram is the next thing its users compute).

    The bin id is floor(x / width) on identical doubles in both engines —
    engine-exact with no two-pass min/max scan, so the whole histogram is
    ONE partial+final hash aggregation over ~30 bins; at 100 TB the
    shuffle carries bins × partitions rows.  An equi-DEPTH histogram is
    the percentile family (q_agg_percentile) instead.
    """
    li = t(spark, sf_dir, "lineitem")
    bin_col = F.floor(F.col("l_extendedprice") / F.lit(_HIST_WIDTH)).cast("long")
    return (
        li.withColumn("bin", bin_col)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_extendedprice", "sum_price"),
        )
        .select(
            "bin",
            (F.col("bin") * _HIST_WIDTH).alias("bin_lo"),
            ((F.col("bin") + 1) * _HIST_WIDTH).alias("bin_hi"),
            "n_rows",
            "sum_price",
        )
    )


@query(
    "q_agg_skew_audit",
    oracle="""
    WITH per_key AS (
      SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey
    ),
    stats AS (
      SELECT COUNT(*) AS n_keys,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             MAX(n) AS max_group,
             quantile_disc(n, 0.50) AS p50_group,
             quantile_disc(n, 0.90) AS p90_group,
             quantile_disc(n, 0.99) AS p99_group
      FROM per_key
    ),
    top1 AS (
      SELECT l_orderkey AS hottest_key FROM per_key
      ORDER BY n DESC, l_orderkey LIMIT 1
    )
    SELECT s.*, t.hottest_key,
           CAST(s.max_group AS DOUBLE) * s.n_keys / s.n_rows AS skew_ratio
    FROM stats s CROSS JOIN top1 t
    """,
)
def q_agg_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/groupBy-key skew audit — the diagnostic run BEFORE choosing a
    shuffle strategy (salting, AQE skew-join thresholds): the
    distribution of per-key group sizes plus the hottest key and a skew
    ratio (max group ÷ mean group).

    Two-level aggregation, both scalable: the per-key count is one
    shuffle on the (uniform) key, and the distribution pass aggregates
    the COUNTS (one row per key, integers — percentile_disc picks exact
    data values, no float drift).  This is the engine-side version of the
    reference's client-side column stats, applied to key cardinality
    rather than values.
    """
    li = t(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    per_key.createOrReplaceTempView("skew_per_key")
    return spark.sql(
        """
        WITH stats AS (
          SELECT COUNT(*) AS n_keys,
                 SUM(n) AS n_rows,
                 MAX(n) AS max_group,
                 CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY n) AS BIGINT) AS p50_group,
                 CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY n) AS BIGINT) AS p90_group,
                 CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n) AS BIGINT) AS p99_group
          FROM skew_per_key
        ),
        top1 AS (
          SELECT l_orderkey AS hottest_key FROM skew_per_key
          ORDER BY n DESC, l_orderkey LIMIT 1
        )
        SELECT s.*, t.hottest_key,
               CAST(s.max_group AS DOUBLE) * s.n_keys / s.n_rows AS skew_ratio
        FROM stats s CROSS JOIN top1 t
        """
    )


@query(
    "q_agg_incremental",
    oracle=f"""
    WITH partials AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS mon, l_returnflag,
             COUNT(*) AS p_count,
             CAST(SUM(CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
               AS p_sum_c,
             MAX(l_extendedprice) AS p_max
      FROM lineitem GROUP BY mon, l_returnflag
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_partials,
           CAST(SUM(p_count) AS BIGINT) AS n_rows,
           CAST(SUM(p_sum_c) AS DOUBLE) / 1e6 AS sum_price,
           MAX(p_max) AS max_price,
           CAST(SUM(p_sum_c) AS DOUBLE) / 1e6 / CAST(SUM(p_count) AS DOUBLE)
             AS avg_price
    FROM partials
    GROUP BY l_returnflag
    """,
)
def q_agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation via mergeable partials — the pattern behind
    every incrementally-maintained 100 TB rollup: per-month partial
    states (count, carrier sum, max) materialize once per batch, and the
    final answer RE-AGGREGATES the partials instead of rescanning
    history.  Correct because each component is a commutative monoid —
    the same algebra Spark's own partial/final HashAggregate uses, made
    explicit at the table level (ddl_mv_refresh is the storage half of
    this pattern).

    The oracle folds the identical partial algebra, so the test proves
    merge(partials) == direct(all rows) bit-for-bit — including the
    average derived from merged sums, which a naive avg-of-avgs gets
    wrong.
    """
    li = t(spark, sf_dir, "lineitem")
    from data_warehouse_hive_spark.registry import to_carrier

    partials = (
        li.groupBy(
            F.date_format("l_shipdate", "yyyy-MM").alias("mon"), "l_returnflag"
        ).agg(
            F.count(F.lit(1)).alias("p_count"),
            F.sum(to_carrier(F.col("l_extendedprice"))).alias("p_sum_c"),
            F.max("l_extendedprice").alias("p_max"),
        )
    )
    return partials.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_partials"),
        F.sum("p_count").alias("n_rows"),
        (F.sum("p_sum_c").cast("double") / 1e6).alias("sum_price"),
        F.max("p_max").alias("max_price"),
        (
            F.sum("p_sum_c").cast("double") / 1e6 / F.sum("p_count").cast("double")
        ).alias("avg_price"),
    )


@query(
    "q_agg_argmax",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                               * 100000000 + o_orderkey) AS best_order,
           arg_min(o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                               * 100000000 + o_orderkey) AS worst_order,
           MAX(o_totalprice) AS best_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX_BY / MIN_BY (argmax/argmin) — Hive 4's max_by surface: the row
    attribute AT the extreme, without a self-join or window pass.

    Determinism: max_by with a tied ordering value is engine-private, so
    the ordering key is a composite long — price on the cent grid
    (carrier rule) shifted above the key range, plus the unique orderkey
    as tiebreak: floor(price·100+0.5)·1e8 + orderkey.  Monotone in
    (price, orderkey), unique by construction (orderkey < 1e8), exact in
    both engines.  One hash aggregation; at scale this replaces the
    window row_number=1 idiom (q_latest_per_key) when only ONE attribute
    is needed.
    """
    o = t(spark, sf_dir, "orders")
    key = (
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long") * F.lit(100000000)
        + F.col("o_orderkey")
    )
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", key).alias("best_order"),
        F.min_by("o_orderkey", key).alias("worst_order"),
        F.max("o_totalprice").alias("best_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q_dq_kanonymity",
    oracle="""
    WITH classes AS (
      SELECT c_mktsegment, c_nationkey, COUNT(*) AS sz
      FROM customer GROUP BY c_mktsegment, c_nationkey
    )
    SELECT COUNT(*) AS n_classes,
           CAST(SUM(sz) AS BIGINT) AS n_rows,
           MIN(sz) AS k_anonymity,
           CAST(COUNT(*) FILTER (WHERE sz < 5) AS BIGINT) AS classes_below_5,
           CAST(COALESCE(SUM(sz) FILTER (WHERE sz < 5), 0) AS BIGINT)
             AS rows_below_5,
           CAST(COALESCE(SUM(sz) FILTER (WHERE sz < 5), 0) AS DOUBLE)
             / CAST(SUM(sz) AS DOUBLE) AS frac_rows_below_5
    FROM classes
    """,
)
def q_dq_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (segment × nation): the
    data-governance check run before releasing or joining
    demographic-adjacent columns — the dataset's k is the SMALLEST
    equivalence class, and rows in classes below the target k are
    re-identification risks (the q_text_pii column-level scrub's
    row-level counterpart).

    Same two-level shape as q_agg_skew_audit: one shuffle on the
    QI key, then exact integer metrics over the class-size relation.
    """
    c = t(spark, sf_dir, "customer")
    classes = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("sz")
    )
    below = F.when(F.col("sz") < 5, F.col("sz"))
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("sz").alias("n_rows"),
        F.min("sz").alias("k_anonymity"),
        F.count(below).alias("classes_below_5"),
        F.coalesce(F.sum(below), F.lit(0)).alias("rows_below_5"),
        (
            F.coalesce(F.sum(below), F.lit(0)).cast("double")
            / F.sum("sz").cast("double")
        ).alias("frac_rows_below_5"),
    )


@query(
    "q_agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nd_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS nd_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting through mergeable roaring-style bitmaps
    (Spark 3.5 bitmap_bit_position / bitmap_construct_agg / bitmap_count)
    — the ClickHouse/Doris bitmap-index idiom: per-bucket bitmaps OR
    together associatively, so unlike COUNT(DISTINCT) the partial states
    are small fixed-size blobs and re-aggregatable across rollup levels
    (the exact-count sibling of q_agg_hll's sketches).

    The two-level form below (bucket bitmaps → OR-merge → popcount sum)
    is exactly how a 100 TB distinct-count rollup materializes.  The
    oracle is plain COUNT(DISTINCT): the bitmap algebra must land on the
    identical exact answer.
    """
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_bm")
    return spark.sql(
        """
        WITH p AS (
          SELECT l_returnflag, SUM(bitmap_count(bm)) AS nd_parts
          FROM (
            SELECT l_returnflag, bitmap_bucket_number(l_partkey) AS b,
                   bitmap_construct_agg(bitmap_bit_position(l_partkey)) AS bm
            FROM lineitem_bm GROUP BY l_returnflag, b
          ) GROUP BY l_returnflag
        ),
        s AS (
          SELECT l_returnflag, SUM(bitmap_count(bm)) AS nd_supps
          FROM (
            SELECT l_returnflag, bitmap_bucket_number(l_suppkey) AS b,
                   bitmap_construct_agg(bitmap_bit_position(l_suppkey)) AS bm
            FROM lineitem_bm GROUP BY l_returnflag, b
          ) GROUP BY l_returnflag
        )
        SELECT p.l_returnflag, p.nd_parts, s.nd_supps
        FROM p JOIN s USING (l_returnflag)
        """
    )


@query(
    "q_agg_rfm",
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate),
                       (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1e6 AS monetary
      FROM orders GROUP BY o_custkey
    ),
    bounds AS (
      SELECT quantile_disc(recency_days, 0.25) AS r1,
             quantile_disc(recency_days, 0.50) AS r2,
             quantile_disc(recency_days, 0.75) AS r3,
             quantile_disc(frequency, 0.25) AS f1,
             quantile_disc(frequency, 0.50) AS f2,
             quantile_disc(frequency, 0.75) AS f3,
             quantile_disc(monetary, 0.25) AS m1,
             quantile_disc(monetary, 0.50) AS m2,
             quantile_disc(monetary, 0.75) AS m3
      FROM cust
    ),
    scored AS (
      SELECT
        (4 - ((recency_days > r1)::INT + (recency_days > r2)::INT
              + (recency_days > r3)::INT)) AS r_score,
        (1 + (frequency > f1)::INT + (frequency > f2)::INT
           + (frequency > f3)::INT) AS f_score,
        (1 + (monetary > m1)::INT + (monetary > m2)::INT
           + (monetary > m3)::INT) AS m_score,
        monetary
      FROM cust CROSS JOIN bounds
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           COUNT(*) AS n_customers,
           {o_davg('monetary', 'avg_monetary')}
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
)
def q_agg_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quartile scores)
    — the classic warehouse customer-analytics rollup, built the way it
    scales: quartile BOUNDARIES come from three exact percentiles over
    the per-customer relation (a 1-row broadcast), and each customer's
    score is three comparisons against them — there is NO global
    sort/ntile over the customer table (the q_win_ntile anti-pattern at
    this cardinality).

    Exactness: recency/frequency are integers, monetary rides the
    carrier, and percentile_disc picks actual data values, so scores and
    segment counts are engine-identical.
    """
    o = t(spark, sf_dir, "orders")
    snap = o.agg(F.max("o_orderdate").alias("snap"))
    cust = (
        o.crossJoin(F.broadcast(snap))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("snap"), F.max("o_orderdate")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            dsum("o_totalprice", "monetary"),
        )
    )
    cust.createOrReplaceTempView("rfm_cust")
    return spark.sql(
        f"""
        WITH bounds AS (
          SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY recency_days) AS r1,
                 percentile_disc(0.50) WITHIN GROUP (ORDER BY recency_days) AS r2,
                 percentile_disc(0.75) WITHIN GROUP (ORDER BY recency_days) AS r3,
                 percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency) AS f1,
                 percentile_disc(0.50) WITHIN GROUP (ORDER BY frequency) AS f2,
                 percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency) AS f3,
                 percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary) AS m1,
                 percentile_disc(0.50) WITHIN GROUP (ORDER BY monetary) AS m2,
                 percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary) AS m3
          FROM rfm_cust
        ),
        scored AS (
          SELECT
            4 - (CAST(recency_days > r1 AS INT) + CAST(recency_days > r2 AS INT)
                 + CAST(recency_days > r3 AS INT)) AS r_score,
            1 + CAST(frequency > f1 AS INT) + CAST(frequency > f2 AS INT)
              + CAST(frequency > f3 AS INT) AS f_score,
            1 + CAST(monetary > m1 AS INT) + CAST(monetary > m2 AS INT)
              + CAST(monetary > m3 AS INT) AS m_score,
            monetary
          FROM rfm_cust CROSS JOIN bounds
        )
        SELECT CAST(r_score AS BIGINT) AS r_score,
               CAST(f_score AS BIGINT) AS f_score,
               CAST(m_score AS BIGINT) AS m_score,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(floor(monetary * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1e6 / CAST(COUNT(monetary) AS DOUBLE) AS avg_monetary
        FROM scored
        GROUP BY r_score, f_score, m_score
        """
    )


# ---------------------------------------------------------------------------
# Count-min sketch — sublinear frequency estimation
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_PROBES = ("table", "scan", "query", "value", "spark", "window", "join", "agg")


@query(
    "q_agg_countmin",
    oracle=f"""
    WITH words AS (
      SELECT u.word
      FROM documents, LATERAL (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
      ) u
    ),
    cells AS (
      SELECT j.j,
             (('0x' || substr(md5(j.j || '|' || w.word), 1, 8))::UBIGINT
               % {CMS_WIDTH}) AS bucket,
             COUNT(*) AS cnt
      FROM words w, LATERAL (SELECT unnest(range({CMS_DEPTH})) AS j) j
      GROUP BY j.j, bucket
    ),
    probes AS (SELECT unnest({list(CMS_PROBES)!r}) AS word),
    est AS (
      SELECT p.word, MIN(c.cnt) AS est_count
      FROM probes p,
           LATERAL (SELECT unnest(range({CMS_DEPTH})) AS j) j
      JOIN cells c
        ON c.j = j.j
       AND c.bucket = (('0x' || substr(md5(j.j || '|' || p.word), 1, 8))::UBIGINT
                        % {CMS_WIDTH})
      GROUP BY p.word
    ),
    truth AS (
      SELECT word, COUNT(*) AS true_count FROM words
      WHERE word IN {CMS_PROBES!r} GROUP BY word
    )
    SELECT e.word, e.est_count, t.true_count
    FROM est e JOIN truth t ON t.word = e.word
    ORDER BY e.word
    """,
)
def q_agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus word stream: a {CMS_DEPTH}×{CMS_WIDTH}
    counter grid (md5-salted row hashes), probed for 8 vocabulary words
    with the true counts alongside — est ≥ truth, the one-sided CMS
    guarantee, is directly visible in the output.

    The sketch build is the scalable path: one narrow map (word → d
    cells) and a groupBy on a FIXED 256-cell key domain, so the shuffle
    carries only partial counters no matter the corpus size — this is
    how you count frequencies over 100 TB without a word-cardinality
    shuffle.  Probing joins the 8×d probe cells against the tiny sketch.
    The md5-derived row hashes make the grid bit-identical cross-engine
    (same idiom as the MinHash family).
    """
    from data_warehouse_hive_spark.tables import spread

    d = spread(t(spark, sf_dir, "documents").select("text"), spark)
    words = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
    )
    js = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("j")
    salted = words.select("word", js).select(
        "j",
        (
            F.conv(
                F.substring(F.md5(F.concat_ws("|", F.col("j"), F.col("word"))), 1, 8),
                16,
                10,
            ).cast("long")
            % CMS_WIDTH
        ).alias("bucket"),
    )
    cells = salted.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    probes = spark.range(1).select(
        F.explode(F.array(*[F.lit(w) for w in CMS_PROBES])).alias("word")
    )
    probe_cells = probes.select("word", js).select(
        "word",
        "j",
        (
            F.conv(
                F.substring(F.md5(F.concat_ws("|", F.col("j"), F.col("word"))), 1, 8),
                16,
                10,
            ).cast("long")
            % CMS_WIDTH
        ).alias("bucket"),
    )
    est = (
        probe_cells.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("word")
        .agg(F.min("cnt").alias("est_count"))
    )
    truth = (
        words.filter(F.col("word").isin(*CMS_PROBES))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    return est.join(truth, "word").orderBy("word")


@query(
    "q_stats_ks",
    oracle="""
    WITH ab AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
      FROM events WHERE event_type IN ('click', 'error')
    ),
    tot AS (
      SELECT CAST(SUM(ia) AS BIGINT) AS na,
             CAST(SUM(1 - ia) AS BIGINT) AS nb
      FROM ab
    ),
    byv AS (
      SELECT value,
             CAST(SUM(ia) AS BIGINT) AS ca,
             CAST(SUM(1 - ia) AS BIGINT) AS cb
      FROM ab GROUP BY value
    ),
    cum AS (
      SELECT value,
             CAST(SUM(ca) OVER (ORDER BY value
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
             CAST(SUM(cb) OVER (ORDER BY value
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
      FROM byv
    )
    SELECT t.na, t.nb,
           CAST(MAX(ABS(cuma * t.nb - cumb * t.na)) AS BIGINT) AS d_num,
           round(CAST(MAX(ABS(cuma * t.nb - cumb * t.na)) AS DOUBLE)
                 / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)), 6) AS ks_stat
    FROM cum, tot t
    GROUP BY t.na, t.nb
    """,
)
def q_stats_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the `value`
    distributions of two event types — the standard drift detector a
    pipeline runs between yesterday's and today's feature distributions.

    Integer-exact formulation: D = max|F_A − F_B| is computed as
    max|cumA·n_B − cumB·n_A| over DISTINCT values (cross-multiplied
    cumulative counts — all integer arithmetic, no float CDFs), divided
    once at the end.  The cumulative window runs over distinct values
    only, so its single-partition sort holds the value domain, not the
    event count; at 100 TB pre-bucket values into quantile bins first
    (same algebra per bin + offset).
    """
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    ab = e.select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("ia"),
    )
    byv = ab.groupBy("value").agg(
        F.sum("ia").alias("ca"), F.sum(1 - F.col("ia")).alias("cb")
    )
    tot = ab.agg(
        F.sum("ia").alias("na"), F.sum(1 - F.col("ia")).alias("nb")
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = byv.select(
        F.sum("ca").over(w).alias("cuma"), F.sum("cb").over(w).alias("cumb")
    )
    d = F.max(F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")))
    return (
        cum.join(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            d.alias("d_num"),
            F.round(
                d.cast("double") / (F.col("na").cast("double") * F.col("nb").cast("double")),
                6,
            ).alias("ks_stat"),
        )
    )


@query(
    "q_dq_benford",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                  1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1.0
    ),
    tot AS (SELECT COUNT(*) AS n FROM digits)
    SELECT digit, COUNT(*) AS n_orders,
           round(CAST(COUNT(*) AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS share,
           round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_expected
    FROM digits, tot t
    GROUP BY digit, t.n
    ORDER BY digit
    """,
)
def q_dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit on order totals — the classic
    fraud / synthetic-data smell test: natural multiplicative quantities
    follow P(d) = log10(1+1/d); a uniform generator (like this fixture's)
    visibly does not, and the query surfaces exactly that deviation.

    The first digit is extracted via BIGINT→string (identical formatting
    in both engines — never via log10+floor, whose ulp error flips digits
    at power-of-10 boundaries).  One narrow map + a 9-bucket aggregate.
    """
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    digits = o.select(digit.alias("digit"))
    tot = digits.agg(F.count(F.lit(1)).alias("n"))
    return (
        digits.join(F.broadcast(tot))
        .groupBy("digit", "n")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "digit",
            "n_orders",
            F.round(F.col("n_orders").cast("double") / F.col("n").cast("double"), 6).alias(
                "share"
            ),
            F.round(
                F.log(F.lit(1.0) + 1.0 / F.col("digit")) / F.log(F.lit(10.0)), 6
            ).alias("benford_expected"),
        )
        .orderBy("digit")
    )


PSI_BINS = 10
PSI_VMAX = 500.0  # fixture `value` domain upper bound; fixed-edge bins


@query(
    "q_stats_psi",
    oracle=f"""
    WITH halves AS (
      SELECT value,
             CASE WHEN ts < TIMESTAMP '1995-07-02' THEN 0 ELSE 1 END AS half,
             LEAST(CAST(floor(value / ({PSI_VMAX} / {PSI_BINS})) AS INT),
                   {PSI_BINS - 1}) AS bin
      FROM events
    ),
    binned AS (
      SELECT bin,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      FROM halves GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
             CAST(SUM(n_cur) AS BIGINT) AS t_cur
      FROM binned
    ),
    terms AS (
      SELECT b.bin, b.n_ref, b.n_cur,
             CAST(floor(
               ((CAST(b.n_cur AS DOUBLE) / t.t_cur)
                 - (CAST(b.n_ref AS DOUBLE) / t.t_ref))
               * ln((CAST(b.n_cur AS DOUBLE) / t.t_cur)
                    / (CAST(b.n_ref AS DOUBLE) / t.t_ref))
               * 1e9 + 0.5) AS BIGINT) AS term_c
      FROM binned b, tot t
      WHERE b.n_ref > 0 AND b.n_cur > 0
    )
    SELECT COUNT(*) AS n_bins,
           CAST(SUM(term_c) AS DOUBLE) / 1e9 AS psi
    FROM terms
    """,
)
def q_stats_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the event stream's `value` distribution — the drift score model
    monitoring dashboards alarm on (PSI > 0.2 = action), companion to the
    rank-based q_stats_ks.

    Fixed-edge bins (not quantiles) keep binning a pure per-row map, so
    the whole metric is one scan + one 10-bin aggregate + scalar algebra.
    Each bin's (p−q)·ln(p/q) term is quantized on a 1e9 carrier before
    the cross-bin sum — the division and ln see identical operands in
    both engines, and the sum is exact integer addition.
    """
    e = t(spark, sf_dir, "events")
    width = PSI_VMAX / PSI_BINS
    halves = e.select(
        F.when(F.col("ts") < F.lit("1995-07-02").cast("timestamp"), 0)
        .otherwise(1)
        .alias("half"),
        F.least(
            F.floor(F.col("value") / width).cast("int"), F.lit(PSI_BINS - 1)
        ).alias("bin"),
    )
    binned = halves.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_cur"),
    )
    tot = binned.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_cur = F.col("n_cur").cast("double") / F.col("t_cur")
    p_ref = F.col("n_ref").cast("double") / F.col("t_ref")
    term_c = F.floor((p_cur - p_ref) * F.log(p_cur / p_ref) * 1e9 + 0.5).cast(
        "long"
    )
    return (
        binned.join(F.broadcast(tot))
        .filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
        .select(term_c.alias("term_c"))
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            (F.sum("term_c").cast("double") / 1e9).alias("psi"),
        )
    )


@query(
    "q_agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) columns in one aggregation — the query
    shape Catalyst plans with an Expand node (one row replica per
    distinct column, tagged by gid) so ALL distincts resolve in a single
    aggregation tree instead of one job per column.

    The Expand multiplies the shuffled rows by the number of distinct
    columns — that's the documented cost; when any single distinct
    column dominates, run it separately and cross-join (the
    q_stats_profile pattern).  Counts are exact integers — trivially
    engine-portable.
    """
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


QSK_BINS = 100


@query(
    "q_agg_quantile_sketch",
    oracle=f"""
    WITH mm AS (
      SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders
    ),
    binned AS (
      SELECT LEAST(CAST(floor((o_totalprice - mm.mn)
                               / ((mm.mx - mm.mn) / {QSK_BINS})) AS INT),
                   {QSK_BINS - 1}) AS bin,
             COUNT(*) AS c
      FROM orders, mm
      GROUP BY bin
    ),
    cum AS (
      SELECT bin, CAST(SUM(c) OVER (ORDER BY bin
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM binned
    ),
    probes AS (SELECT unnest([0.5, 0.9, 0.99]) AS p),
    est AS (
      SELECT p.p, MIN(cum.bin) AS qbin
      FROM probes p JOIN cum
        ON CAST(cum.cum AS DOUBLE) >= p.p * (SELECT n FROM mm)
      GROUP BY p.p
    ),
    exact AS (
      SELECT p.p, MIN(r.o_totalprice) AS exact_q
      FROM probes p
      JOIN (SELECT o_totalprice,
                   ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
            FROM orders) r
        ON CAST(r.rn AS DOUBLE) >= p.p * (SELECT n FROM mm)
      GROUP BY p.p
    )
    SELECT e.p,
           round(mm.mn + (e.qbin + 1) * ((mm.mx - mm.mn) / {QSK_BINS}), 6)
             AS sketch_q,
           x.exact_q,
           round(mm.mn + (e.qbin + 1) * ((mm.mx - mm.mn) / {QSK_BINS})
                 - x.exact_q, 6) AS err
    FROM est e JOIN exact x ON x.p = e.p CROSS JOIN mm
    ORDER BY e.p
    """,
)
def q_agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantile estimation (P50/P90/P99) with the exact
    order statistic alongside — the mergeable-state quantile pattern: a
    fixed {QSK_BINS}-bin histogram is a commutative monoid (bins add), so
    at 100 TB each partition emits 100 counters and the quantile comes
    from the merged histogram; the exact path (global sort) exists here
    only as the error baseline.

    Both the sketch and the "exact" answer use explicit engine-portable
    formulas: bins from identical IEEE arithmetic on the shared min/max,
    the exact quantile as the smallest value whose cumulative count
    reaches p·n (≡ the ceil(p·n)-th order statistic) — never an
    engine's own quantile/percentile builtin, whose interpolation
    conventions differ.

    ONE scan of orders: everything — min/max/n, the bin histogram, and
    the exact baseline — derives from the per-distinct-value count
    relation (the q_stats_mannwhitney histogram trick), whose shuffle
    exchange Spark reuses across all four consumers.  The exact
    baseline's running count runs over the distinct-value relation, not
    a raw-row row_number sort (worst case it matches the old cost when
    all values are unique; with any duplication it shrinks).
    """
    o = t(spark, sf_dir, "orders")
    # materialize the value-count relation once: four consumers (mm,
    # binned, est's n, the exact baseline) would otherwise each replay
    # the scan+shuffle — exchange reuse only catches exprId-identical
    # subtrees
    vc = (
        o.groupBy("o_totalprice")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    mm = vc.agg(
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.sum("c").cast("long").alias("n"),
    )
    width = (F.col("mx") - F.col("mn")) / QSK_BINS
    binned = (
        vc.join(F.broadcast(mm))
        .select(
            F.least(
                F.floor((F.col("o_totalprice") - F.col("mn")) / width).cast("int"),
                F.lit(QSK_BINS - 1),
            ).alias("bin"),
            "c",
        )
        .groupBy("bin")
        .agg(F.sum("c").alias("c"))
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = binned.select("bin", F.sum("c").over(wcum).alias("cum"))
    probes = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("p")
    )
    est = (
        probes.join(
            F.broadcast(cum.join(F.broadcast(mm.select("n")))),
            F.col("cum").cast("double") >= F.col("p") * F.col("n"),
        )
        .groupBy("p")
        .agg(F.min("bin").alias("qbin"))
    )
    wv = Window.orderBy("o_totalprice").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    vcum = vc.select(
        "o_totalprice", F.sum("c").over(wv).cast("long").alias("vcum")
    )
    exact = (
        probes.join(F.broadcast(mm.select("n")))
        .join(vcum, F.col("vcum").cast("double") >= F.col("p") * F.col("n"))
        .groupBy("p")
        .agg(F.min("o_totalprice").alias("exact_q"))
    )
    sketch_q = F.round(F.col("mn") + (F.col("qbin") + 1) * width, 6)
    return (
        est.join(exact, "p")
        .join(F.broadcast(mm))
        .select(
            "p",
            sketch_q.alias("sketch_q"),
            "exact_q",
            F.round(F.col("mn") + (F.col("qbin") + 1) * width - F.col("exact_q"), 6).alias(
                "err"
            ),
        )
        .orderBy("p")
    )


@query(
    "q_dq_null_profile",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_custkey,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd_custkey,
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_status,
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd_status,
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_price,
             CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS nd_price,
             CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_prio,
             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nd_prio
      FROM orders
    )
    SELECT col_name, n_rows, n_null, n_distinct FROM (
      SELECT 'o_custkey' AS col_name, n_rows, nn_custkey AS n_null, nd_custkey AS n_distinct FROM m
      UNION ALL
      SELECT 'o_orderstatus', n_rows, nn_status, nd_status FROM m
      UNION ALL
      SELECT 'o_totalprice', n_rows, nn_price, nd_price FROM m
      UNION ALL
      SELECT 'o_orderpriority', n_rows, nn_prio, nd_prio FROM m
    )
    ORDER BY col_name
    """,
)
def q_dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column completeness profile (row count, null count, exact
    distinct cardinality) in ONE aggregation pass, stacked to one row
    per column — the table-health report a warehouse runs after every
    load (the reference's health endpoint reports only connectivity;
    this is the data-level counterpart).

    All four columns' measures ride a single partial+final aggregate
    (the multi-distinct Expand documented in q_agg_multi_distinct);
    stack() reshapes the 1-row result driver-free.  For 1000-column
    tables generate the aggregate list programmatically — the plan
    stays one pass.
    """
    o = t(spark, sf_dir, "orders")

    def nn(c: str) -> Column:
        return F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))

    m = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        nn("o_custkey").alias("nn_custkey"),
        F.countDistinct("o_custkey").alias("nd_custkey"),
        nn("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        nn("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        nn("o_orderpriority").alias("nn_prio"),
        F.countDistinct("o_orderpriority").alias("nd_prio"),
    )
    return m.selectExpr(
        "stack(4,"
        " 'o_custkey', n_rows, nn_custkey, nd_custkey,"
        " 'o_orderstatus', n_rows, nn_status, nd_status,"
        " 'o_totalprice', n_rows, nn_price, nd_price,"
        " 'o_orderpriority', n_rows, nn_prio, nd_prio"
        ") AS (col_name, n_rows, n_null, n_distinct)"
    ).orderBy("col_name")


@query(
    "q_agg_geomean",
    oracle="""
    WITH lns AS (
      SELECT l_returnflag,
             CAST(floor(round(ln(l_extendedprice), 9) * 1e9 + 0.5) AS BIGINT)
               AS ln_c
      FROM lineitem WHERE l_extendedprice > 0
    )
    SELECT l_returnflag,
           COUNT(*) AS n,
           round(exp(CAST(SUM(ln_c) AS DOUBLE) / 1e9
                     / CAST(COUNT(*) AS DOUBLE)), 6) AS geo_mean_price
    FROM lns
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean (the right average for multiplicative quantities —
    growth rates, price ratios): exp(mean(ln x)), with each ln pinned at
    9 dp (transcendental rule) and carried as a scaled long so the
    cross-partition sum is exact integer addition — the standard carrier
    discipline applied to a log-domain aggregate neither engine offers
    natively.
    """
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    ln_c = F.floor(
        F.round(F.log(F.col("l_extendedprice")), 9) * 1e9 + 0.5
    ).cast("long")
    return (
        l.select("l_returnflag", ln_c.alias("ln_c"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.exp(
                    F.sum("ln_c").cast("double") / 1e9 / F.count(F.lit(1)).cast("double")
                ),
                6,
            ).alias("geo_mean_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_orders_latency",
    oracle="""
    WITH lat AS (
      SELECT date_diff('day', o.o_orderdate, l.l_shipdate) AS days_to_ship
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    tot AS (SELECT COUNT(*) AS n FROM lat)
    SELECT CAST(LEAST(GREATEST(floor(days_to_ship / 7.0), -14), 14) AS INT)
             AS week_bucket,
           COUNT(*) AS n_lines,
           round(CAST(COUNT(*) AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS share
    FROM lat, tot t
    GROUP BY week_bucket, t.n
    ORDER BY week_bucket
    """,
)
def q_orders_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship cycle-time distribution: line-level shipping latency
    bucketed by week, clamped to ±14 weeks (this fixture's ship dates are
    not correlated with order dates, so latencies span years — the clamp
    keeps the histogram the fixed-width report it would be on real data).

    Bucketing is an EXPLICIT floor division on double in both engines —
    DuckDB's integer `//` truncates toward zero while floor() floors, and
    the two disagree on every negative latency.  The histogram aggregates
    on a ≤29-value key (map-side partials); shares divide identical
    integers.
    """
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    lat = o.join(l, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_ship")
    )
    tot = lat.agg(F.count(F.lit(1)).alias("n"))
    bucket = F.least(
        F.greatest(F.floor(F.col("days_to_ship") / 7.0), F.lit(-14)), F.lit(14)
    ).cast("int")
    return (
        lat.join(F.broadcast(tot))
        .groupBy(bucket.alias("week_bucket"), "n")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .select(
            "week_bucket",
            "n_lines",
            F.round(F.col("n_lines").cast("double") / F.col("n").cast("double"), 6).alias(
                "share"
            ),
        )
        .orderBy("week_bucket")
    )


@query(
    "q_agg_bitops",
    oracle="""
    SELECT l_returnflag,
           bit_and(l_linenumber) AS and_ln,
           bit_or(l_linenumber) AS or_ln,
           bit_xor(l_linenumber) AS xor_ln,
           bool_and(l_quantity > 0) AS all_pos_qty,
           bool_or(l_discount > 0.09) AS any_deep_discount
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_bitops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise and boolean aggregates (BIT_AND/OR/XOR, BOOL_AND/BOOL_OR
    a.k.a. EVERY/ANY) — flag-mask folding and invariant checking as a
    grouped aggregate.  All are commutative/associative reductions, so
    partial aggregation applies and partition order cannot matter —
    exact by construction, no carrier needed."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.bit_and("l_linenumber").alias("and_ln"),
            F.bit_or("l_linenumber").alias("or_ln"),
            F.bit_xor("l_linenumber").alias("xor_ln"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_pos_qty"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_dq_freshness",
    oracle="""
    WITH per AS (
      SELECT event_type, MAX(ts) AS last_ts, COUNT(*) AS n_events
      FROM events GROUP BY event_type
    ),
    g AS (SELECT MAX(ts) AS global_max FROM events)
    SELECT per.event_type,
           strftime(per.last_ts, '%Y-%m-%d %H:%M:%S') AS last_seen,
           per.n_events,
           CAST(epoch_us(g.global_max) - epoch_us(per.last_ts) AS BIGINT)
             AS staleness_us,
           CASE WHEN epoch_us(g.global_max) - epoch_us(per.last_ts)
                     > 3600000000 THEN 1 ELSE 0 END AS is_stale
    FROM per CROSS JOIN g
    ORDER BY event_type
    """,
)
def q_dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness audit: per stream (event_type), the last-seen
    timestamp, its lag behind the freshest stream, and an SLA flag
    (stale if > 1 h behind) — the monitor that catches a dead upstream
    producer before its absence silently skews every downstream join.

    One grouped MAX (map-side combinable, O(types) output) plus a
    broadcast 1-row global max; staleness compared in exact integer
    microseconds.  The mirror of the reference's /health endpoint at
    table-content level (backend/app.py:120-147 checks only service
    liveness)."""
    e = t(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n_events")
    )
    g = e.agg(F.max("ts").alias("global_max"))
    stale_us = F.unix_micros("global_max") - F.unix_micros("last_ts")
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
            "n_events",
            stale_us.alias("staleness_us"),
            F.when(stale_us > 3_600_000_000, 1).otherwise(0).alias("is_stale"),
        )
        .orderBy("event_type")
    )


@query(
    "q_agg_weighted",
    oracle="""
    SELECT l_returnflag,
           round(CAST(SUM(CAST(floor(l_extendedprice * l_discount * 1e4 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 1e4
                 / (CAST(SUM(CAST(floor(l_extendedprice * 1e6 + 0.5)
                                  AS BIGINT)) AS DOUBLE) / 1e6), 9)
             AS w_avg_discount,
           round(CAST(SUM(CAST(floor(l_discount * 1e6 + 0.5) AS BIGINT))
                      AS DOUBLE) / 1e6 / CAST(COUNT(*) AS DOUBLE), 9)
             AS avg_discount,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average — Σ(w·x)/Σw with revenue as the weight — next to
    the unweighted mean it corrects: the aggregation every reporting
    layer needs and no engine ships as a builtin.  Both sums ride exact
    carriers (the product term at scale 1e4: |Σ w·x| < 2^63/1e4 holds
    past sf100), so the weighted mean is one division of two
    order-independent exact numbers; two map-combinable sums in ONE
    shuffle, no join."""
    l = t(spark, sf_dir, "lineitem")
    wx = F.sum(
        F.floor(
            F.col("l_extendedprice") * F.col("l_discount") * F.lit(1e4)
            + F.lit(0.5)
        ).cast("long")
    )
    w = F.sum(
        F.floor(F.col("l_extendedprice") * F.lit(1e6) + F.lit(0.5)).cast("long")
    )
    x = F.sum(F.floor(F.col("l_discount") * F.lit(1e6) + F.lit(0.5)).cast("long"))
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(
                (wx.cast("double") / F.lit(1e4))
                / (w.cast("double") / F.lit(1e6)),
                9,
            ).alias("w_avg_discount"),
            F.round(
                x.cast("double")
                / F.lit(1e6)
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("avg_discount"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_dq_checksum",
    oracle="""
    WITH rowhash AS (
      SELECT ('0x' || substr(md5(concat_ws('|',
               CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
               o_orderstatus,
               CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR),
               strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority)), 1, 11))
             ::UBIGINT::BIGINT AS h
      FROM orders
    )
    SELECT COUNT(*) AS n_rows,
           CAST(CAST(SUM(h) AS DECIMAL(38,0)) AS DOUBLE) AS checksum_sum,
           bit_xor(h) AS checksum_xor,
           CAST(MIN(h) AS BIGINT) AS checksum_min,
           CAST(MAX(h) AS BIGINT) AS checksum_max
    FROM rowhash
    """,
)
def q_dq_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table content checksum: each row canonicalizes
    (money quantized to exact cents, dates to ISO strings, '|' joined)
    into a 44-bit md5-derived integer; SUM (DECIMAL(38) accumulator —
    a long would overflow past ~400k rows — surfaced as double; the XOR
    is the bit-exact fingerprint), XOR, MIN and MAX of those are
    commutative fingerprints of the full content — the
    did-the-migration-preserve-every-row check that catches a lost,
    duplicated, or silently-mutated row between environments without
    moving data to one place (each side computes 4 numbers; compare).

    All map-side combinable, one 1-row result; at 100 TB this is a scan
    at IO speed.  The same canonicalization on any engine yields the
    same checksums — which is precisely what the DuckDB oracle proves."""
    o = t(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.col("o_orderpriority"),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 11), 16, 10).cast("long")
    return o.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("h").cast("decimal(38,0)")).cast("double").alias("checksum_sum"),
        F.bit_xor("h").alias("checksum_xor"),
        F.min("h").alias("checksum_min"),
        F.max("h").alias("checksum_max"),
    )


@query(
    "q_dq_reconcile",
    oracle="""
    WITH lines AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                 * (1 + l_tax) * 1e2 + 0.5) AS BIGINT))
                  AS BIGINT) AS line_cents
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.o_orderkey,
             CAST(floor(o.o_totalprice * 1e2 + 0.5) AS BIGINT) AS hdr_cents,
             l.line_cents
      FROM orders o JOIN lines l ON l.l_orderkey = o.o_orderkey
    ),
    diffs AS (
      SELECT CASE
               WHEN hdr_cents = line_cents THEN 'exact'
               WHEN abs(hdr_cents - line_cents) * 100 <= hdr_cents
                 THEN 'within_1pct'
               WHEN abs(hdr_cents - line_cents) * 10 <= hdr_cents
                 THEN 'within_10pct'
               ELSE 'mismatch'
             END AS band
      FROM j
    )
    SELECT band, COUNT(*) AS n_orders
    FROM diffs GROUP BY band
    ORDER BY band
    """,
)
def q_dq_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-lines reconciliation: each order's stored total against
    the recomputed Σ extendedprice·(1−disc)·(1+tax) of its lines,
    banded (exact / ≤1% / ≤10% / mismatch) — the cross-table consistency
    audit (invoice vs line items, ledger vs journal) that catches
    partial loads and drifted denormalizations.

    Both sides quantize to exact integer CENTS before comparing, and
    the band test is integer cross-multiplication — no float tolerance
    constants.  One fact aggregation + one key join; output is O(bands).
    """
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    lines = l.groupBy("l_orderkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * F.lit(1e2)
                + F.lit(0.5)
            ).cast("long")
        ).alias("line_cents")
    )
    j = o.join(lines, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5))
        .cast("long")
        .alias("hdr_cents"),
        "line_cents",
    )
    diff = F.abs(F.col("hdr_cents") - F.col("line_cents"))
    band = (
        F.when(F.col("hdr_cents") == F.col("line_cents"), "exact")
        .when(diff * 100 <= F.col("hdr_cents"), "within_1pct")
        .when(diff * 10 <= F.col("hdr_cents"), "within_10pct")
        .otherwise("mismatch")
    )
    return (
        j.select(band.alias("band"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("band")
    )


@query(
    "q_dq_outlier_iqr",
    oracle="""
    WITH fences AS (
      SELECT o_orderpriority,
             quantile_disc(o_totalprice, 0.25) AS q1,
             quantile_disc(o_totalprice, 0.75) AS q3
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           ANY_VALUE(f.q1) AS q1, ANY_VALUE(f.q3) AS q3,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o.o_totalprice
                              < f.q1 - 1.5 * (f.q3 - f.q1)
                          OR o.o_totalprice
                              > f.q3 + 1.5 * (f.q3 - f.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(CAST(SUM(CASE WHEN o.o_totalprice
                              < f.q1 - 1.5 * (f.q3 - f.q1)
                          OR o.o_totalprice
                              > f.q3 + 1.5 * (f.q3 - f.q1)
                     THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_rate
    FROM orders o JOIN fences f
      ON f.o_orderpriority = o.o_orderpriority
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q_dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (IQR) outlier audit per order priority — the
    distribution-shaped data-quality gate that complements q_anomaly_mad
    (median absolute deviation) and q_events_zscore (rolling z): Q1/Q3
    fences at 1.5·IQR, per-group outlier counts and rates.

    Two-phase: exact DISCRETE quartiles per group (percentile_disc picks
    real data values — no interpolation arithmetic to mismatch), the
    tiny fence relation broadcasts back onto the fact scan, and the
    verdict is one conditional aggregation.  Fence comparisons are pure
    double ops on identical operands in both engines.
    """
    o = t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_iqr_v")
    fences = spark.sql(
        """
        SELECT o_orderpriority AS pr,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS q1,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS q3
        FROM orders_iqr_v GROUP BY o_orderpriority
        """
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("o_totalprice") < F.col("q1") - 1.5 * iqr) | (
        F.col("o_totalprice") > F.col("q3") + 1.5 * iqr
    )
    return (
        o.join(F.broadcast(fences), F.col("pr") == F.col("o_orderpriority"))
        .groupBy("o_orderpriority")
        .agg(
            F.any_value(F.col("q1")).alias("q1"),
            F.any_value(F.col("q3")).alias("q3"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias(
                "n_outliers"
            ),
            F.round(
                F.sum(F.when(is_out, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("outlier_rate"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_dq_uniqueness",
    oracle="""
    WITH t AS (SELECT COUNT(*) AS n FROM lineitem),
    cand AS (
      SELECT 'l_orderkey,l_linenumber' AS candidate_key, t.n AS n_rows,
             (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber
                                    FROM lineitem)) AS n_distinct
      FROM t
      UNION ALL
      SELECT 'l_orderkey,l_partkey', t.n,
             (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_partkey
                                    FROM lineitem))
      FROM t
      UNION ALL
      SELECT 'l_partkey,l_suppkey', t.n,
             (SELECT COUNT(*) FROM (SELECT DISTINCT l_partkey, l_suppkey
                                    FROM lineitem))
      FROM t
    )
    SELECT candidate_key, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           (n_rows = n_distinct) AS is_unique,
           round(CAST(n_rows - n_distinct AS DOUBLE)
                 / CAST(n_rows AS DOUBLE), 6) AS dup_ratio
    FROM cand
    ORDER BY candidate_key
    """,
)
def q_dq_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key uniqueness audit: for each proposed key of
    `lineitem`, does it actually identify rows?  The constraint-mining
    check run before declaring primary keys, building MERGE conditions
    (ddl_merge_upsert), or bucketing a join on a 'key' that silently
    collides.  (l_orderkey, l_linenumber) is the true PK; the other two
    candidates quantify HOW non-unique they are via the dup ratio.

    Each candidate is its own dedup-then-count aggregation (the
    never-mix-COUNT(DISTINCT) rule), unioned into the 3-row report —
    three shuffles on uniform composite keys, all map-side combined.
    """
    li = t(spark, sf_dir, "lineitem")
    total = li.agg(F.count(F.lit(1)).alias("n_rows"))
    keys = [
        ("l_orderkey,l_linenumber", ["l_orderkey", "l_linenumber"]),
        ("l_orderkey,l_partkey", ["l_orderkey", "l_partkey"]),
        ("l_partkey,l_suppkey", ["l_partkey", "l_suppkey"]),
    ]
    parts = []
    for name, cols in keys:
        nd = (
            li.select(*cols)
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_distinct"))
        )
        parts.append(
            total.crossJoin(F.broadcast(nd)).select(
                F.lit(name).alias("candidate_key"), "n_rows", "n_distinct"
            )
        )
    out = parts[0].unionAll(parts[1]).unionAll(parts[2])
    return out.select(
        "candidate_key",
        "n_rows",
        "n_distinct",
        (F.col("n_rows") == F.col("n_distinct")).alias("is_unique"),
        F.round(
            (F.col("n_rows") - F.col("n_distinct")).cast("double")
            / F.col("n_rows").cast("double"),
            6,
        ).alias("dup_ratio"),
    ).orderBy("candidate_key")


@query(
    "q_dq_sequence_gaps",
    oracle="""
    WITH ks AS (SELECT DISTINCT o_orderkey AS k FROM orders),
    gaps AS (
      SELECT k,
             LEAD(k) OVER (ORDER BY k) AS nxt
      FROM ks
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(nxt - k - 1) AS BIGINT) AS n_missing_keys,
           CAST(MIN(k + 1) AS BIGINT) AS first_missing,
           CAST(MAX(nxt - 1) AS BIGINT) AS last_missing
    FROM gaps
    WHERE nxt IS NOT NULL AND nxt - k > 1
    """,
)
def q_dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap audit on the order-key space: how many holes, how
    many missing keys, and the hole boundaries — the completeness check
    for any allegedly-contiguous surrogate key (dropped ingest batches
    show up as large runs; TPC-H's orderkey is famously sparse by
    design, which makes it the perfect fixture for this probe).

    One distinct + one LEAD window over the sorted key relation — the
    window input is the distinct key set, not fact rows; gap arithmetic
    is exact integers.
    """
    o = t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k")).distinct()
    w = Window.orderBy("k")
    gaps = o.withColumn("nxt", F.lead("k").over(w)).filter(
        F.col("nxt").isNotNull() & (F.col("nxt") - F.col("k") > 1)
    )
    return gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum(F.col("nxt") - F.col("k") - 1).cast("long").alias(
            "n_missing_keys"
        ),
        F.min(F.col("k") + 1).cast("long").alias("first_missing"),
        F.max(F.col("nxt") - 1).cast("long").alias("last_missing"),
    )


@query(
    "q_dq_referential",
    oracle="""
    SELECT * FROM (
      SELECT 'lineitem.l_orderkey -> orders' AS fk,
             (SELECT COUNT(*) FROM lineitem) AS n_child,
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
               AS n_orphans
      UNION ALL
      SELECT 'orders.o_custkey -> customer',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'lineitem.l_partkey -> part',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey))
    )
    ORDER BY fk
    """,
)
def q_dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's three core
    foreign keys: orphan counts per relationship (child rows whose
    parent key does not exist) — the constraint check a lakehouse runs
    explicitly because parquet tables enforce nothing.

    Each relationship is a LEFT ANTI join (the decorrelated NOT EXISTS)
    counted — parents that fit the broadcast threshold broadcast, the
    fact-to-fact check shuffles once on the uniform key; the three
    1-row results union into the report.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    p = t(spark, sf_dir, "part")

    def audit(name, child, key, parent, pkey):
        total = child.agg(F.count(F.lit(1)).alias("n_child"))
        orphans = child.join(
            parent.select(pkey), F.col(key) == F.col(pkey), "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        return total.crossJoin(F.broadcast(orphans)).select(
            F.lit(name).alias("fk"), "n_child", "n_orphans"
        )

    out = (
        audit("lineitem.l_orderkey -> orders", li, "l_orderkey", o, "o_orderkey")
        .unionAll(
            audit("orders.o_custkey -> customer", o, "o_custkey", c, "c_custkey")
        )
        .unionAll(
            audit("lineitem.l_partkey -> part", li, "l_partkey", p, "p_partkey")
        )
    )
    return out.orderBy("fk")


@query(
    "q_dq_double_charge",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      FROM orders
    ),
    pairs AS (
      SELECT a.o_custkey,
             abs(epoch_us(a.o_orderdate) - epoch_us(b.o_orderdate))
               // 86400000000 AS day_gap
      FROM o a JOIN o b
        ON b.o_custkey = a.o_custkey
       AND b.o_totalprice = a.o_totalprice
       AND a.o_orderkey < b.o_orderkey
      WHERE abs(epoch_us(a.o_orderdate) - epoch_us(b.o_orderdate))
            <= 86400000000
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_suspect_pairs,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN day_gap = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_same_day
    FROM pairs
    """,
)
def q_dq_double_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment (double charge) detection: pairs of orders by
    the SAME customer for the EXACT same amount within 24 hours — the
    accounts-payable / billing audit every finance warehouse schedules.

    Scale shape: the self-join keys on (custkey, exact amount) — both
    equality predicates, so groups are tiny by construction (how many
    same-cent orders does one customer place?) and the 24-hour window is
    a residual filter, NOT a join condition — no time-range join, no
    cartesian anywhere.  `a < b` on the order key makes each unordered
    pair unique.
    """
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    a = o.select(
        F.col("o_orderkey").alias("ka"),
        F.col("o_custkey").alias("cust"),
        F.col("o_totalprice").alias("amt"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ta"),
    )
    b = o.select(
        F.col("o_orderkey").alias("kb"),
        F.col("o_custkey").alias("cust2"),
        F.col("o_totalprice").alias("amt2"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("tb"),
    )
    day = 86_400_000_000
    pairs = a.join(
        b,
        (F.col("cust2") == F.col("cust"))
        & (F.col("amt2") == F.col("amt"))
        & (F.col("ka") < F.col("kb")),
    ).filter(F.abs(F.col("ta") - F.col("tb")) <= day)
    pairs = pairs.select(
        "cust",
        F.expr(f"abs(ta - tb) div {day}").alias("day_gap"),
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_suspect_pairs"),
        F.countDistinct("cust").cast("long").alias("n_customers"),
        F.sum(F.when(F.col("day_gap") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_same_day"),
    )


_ENUM_DOMAINS = {
    "orders.o_orderstatus": ("O", "F", "P"),
    "orders.o_orderpriority": (
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ),
    "lineitem.l_returnflag": ("A", "N", "R"),
}


@query(
    "q_dq_enum_domain",
    oracle=f"""
    SELECT * FROM (
      SELECT 'orders.o_orderstatus' AS col, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null,
             CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('O', 'F', 'P')
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_unexpected
      FROM orders
      UNION ALL
      SELECT 'orders.o_orderpriority', COUNT(*),
             CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
                            AND o_orderpriority NOT IN
                                ('1-URGENT', '2-HIGH', '3-MEDIUM',
                                 '4-NOT SPECIFIED', '5-LOW')
                      THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'lineitem.l_returnflag', COUNT(*),
             CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(SUM(CASE WHEN l_returnflag IS NOT NULL
                            AND l_returnflag NOT IN ('A', 'N', 'R')
                      THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
    )
    ORDER BY col
    """,
)
def q_dq_enum_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enum-domain conformance audit: do the low-cardinality status /
    priority / flag columns contain ONLY their declared value sets?  The
    categorical twin of q_dq_checks' numeric contracts — upstream schema
    drift (a new status code, a renamed priority) lands here first, and
    at 100 TB a full-scan conditional count is the cheapest possible
    probe (no shuffle at all until the 1-row partial merge).

    Each audited column is one conditional aggregation over its table;
    the declared domains are module literals (`_ENUM_DOMAINS`) so the
    contract is versioned with the code.
    """
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")

    def audit(df, col_name, full_name):
        dom = _ENUM_DOMAINS[full_name]
        c = F.col(col_name)
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(c.isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null"),
            F.sum(F.when(c.isNotNull() & ~c.isin(*dom), 1).otherwise(0))
            .cast("long")
            .alias("n_unexpected"),
        ).select(F.lit(full_name).alias("col"), "n_rows", "n_null", "n_unexpected")

    out = (
        audit(o, "o_orderstatus", "orders.o_orderstatus")
        .unionAll(audit(o, "o_orderpriority", "orders.o_orderpriority"))
        .unionAll(audit(li, "l_returnflag", "lineitem.l_returnflag"))
    )
    return out.orderBy("col")


@query(
    "q_dq_cross_field",
    oracle="""
    SELECT * FROM (
      SELECT 'discount_out_of_range' AS rule,
             CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
             COUNT(*) AS n_rows
      FROM lineitem
      UNION ALL
      SELECT 'tax_out_of_range',
             CAST(SUM(CASE WHEN l_tax < 0 OR l_tax > 0.08
                      THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(*)
      FROM lineitem
      UNION ALL
      SELECT 'nonpositive_price_or_qty',
             CAST(SUM(CASE WHEN l_extendedprice <= 0 OR l_quantity <= 0
                      THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(*)
      FROM lineitem
      UNION ALL
      SELECT 'ship_before_order',
             CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate
                      THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(*)
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    ORDER BY rule
    """,
)
def q_dq_cross_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-field consistency rules: single-row domain interactions
    (discount/tax ranges, positive price x quantity) plus the
    cross-TABLE physics rule "a line cannot ship before its order was
    placed" — the row-level rule engine q_dq_checks' per-column
    contracts cannot express because each rule spans multiple fields
    (and, for the last one, a join).

    Single-table rules are shuffle-free conditional aggregates over one
    scan; the join rule shuffles once on the uniform order key.  No
    rule ever materializes violating rows — at 100 TB the audit costs
    one read per table regardless of how many rules are registered.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")

    def rule(df, name, cond):
        return df.agg(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(
                "n_violations"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        ).select(F.lit(name).alias("rule"), "n_violations", "n_rows")

    joined = li.join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    out = (
        rule(
            li,
            "discount_out_of_range",
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1),
        )
        .unionAll(
            rule(
                li,
                "tax_out_of_range",
                (F.col("l_tax") < 0) | (F.col("l_tax") > 0.08),
            )
        )
        .unionAll(
            rule(
                li,
                "nonpositive_price_or_qty",
                (F.col("l_extendedprice") <= 0) | (F.col("l_quantity") <= 0),
            )
        )
        .unionAll(
            rule(
                joined,
                "ship_before_order",
                F.col("l_shipdate") < F.col("o_orderdate"),
            )
        )
    )
    return out.orderBy("rule")


@query(
    "q_agg_weighted_median",
    oracle="""
    WITH vw AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
      FROM lineitem GROUP BY l_returnflag, cents
    ),
    cum AS (
      SELECT l_returnflag, cents, wt,
             SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY cents
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cw,
             SUM(wt) OVER (PARTITION BY l_returnflag) AS tw
      FROM vw
    )
    SELECT l_returnflag,
           CAST(tw AS BIGINT) AS total_weight,
           round(CAST(MIN(CASE WHEN 2 * cw >= tw THEN cents END)
                      AS DOUBLE) / 100, 6) AS weighted_median_price
    FROM cum
    GROUP BY l_returnflag, tw
    ORDER BY l_returnflag
    """,
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the aggregate
    the unweighted percentile family (q_agg_percentile) cannot express:
    a 40-unit line should pull the "typical traded price" 40× harder
    than a single-unit one.  Defined discretely (first value whose
    cumulative weight reaches half the total — the `2·cw ≥ tw` integer
    cross-multiplication, so no float compare picks the pivot).

    The q_stats_mannwhitney histogram discipline: weights aggregate
    per distinct cent value first (one shuffle, map-side combined), the
    running window walks the per-group distinct-value relation, and the
    pivot MIN collapses it — values, weights, and cumulative sums are
    exact integers end to end.
    """
    li = t(spark, sf_dir, "lineitem")
    vw = (
        li.select(
            "l_returnflag",
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("l_returnflag", "cents")
        .agg(F.sum("q").alias("wt"))
    )
    wrun = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    cum = vw.select(
        "l_returnflag",
        "cents",
        F.sum("wt").over(wrun).alias("cw"),
        F.sum("wt").over(wall).alias("tw"),
    )
    return (
        cum.groupBy("l_returnflag", "tw")
        .agg(
            F.round(
                F.min(
                    F.when(2 * F.col("cw") >= F.col("tw"), F.col("cents"))
                ).cast("double")
                / 100,
                6,
            ).alias("weighted_median_price")
        )
        .select(
            "l_returnflag",
            F.col("tw").cast("long").alias("total_weight"),
            "weighted_median_price",
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch with set-operation estimates
# ---------------------------------------------------------------------------

KMV_K = 128  # sketch size
KMV_DOMAIN = 1 << 60  # md5-prefix hash domain (15 hex chars)
KMV_SALTS = 32  # first-stage salt fan-out for the distributed k-min


@query(
    "q_agg_kmv",
    oracle=f"""
    WITH keys AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' ||
                             strftime(date_trunc('day', ts), '%Y-%m-%d')),
                      1, 15))::UBIGINT::BIGINT AS h
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
      FROM keys
    ),
    per_type AS (
      SELECT event_type, ANY_VALUE(m) AS m,
             MAX(CASE WHEN rk = {KMV_K} THEN h END) AS kth
      FROM ranked WHERE rk <= {KMV_K}
      GROUP BY event_type
    ),
    ukeys AS (SELECT DISTINCT h FROM keys),
    uranked AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM ukeys
    ),
    uni AS (
      SELECT ANY_VALUE(m) AS m,
             MAX(CASE WHEN rk = {KMV_K} THEN h END) AS kth
      FROM uranked WHERE rk <= {KMV_K}
    ),
    ests AS (
      SELECT
        MAX(CASE WHEN event_type = 'click' THEN m END) AS exact_click,
        round(MAX(CASE WHEN event_type = 'click' THEN
          CASE WHEN m < {KMV_K} THEN CAST(m AS DOUBLE)
               ELSE CAST({KMV_K - 1} AS DOUBLE) * CAST({KMV_DOMAIN} AS DOUBLE)
                    / CAST(kth AS DOUBLE) END END), 4) AS est_click,
        MAX(CASE WHEN event_type = 'purchase' THEN m END) AS exact_purchase,
        round(MAX(CASE WHEN event_type = 'purchase' THEN
          CASE WHEN m < {KMV_K} THEN CAST(m AS DOUBLE)
               ELSE CAST({KMV_K - 1} AS DOUBLE) * CAST({KMV_DOMAIN} AS DOUBLE)
                    / CAST(kth AS DOUBLE) END END), 4) AS est_purchase
      FROM per_type
    )
    SELECT e.exact_click, e.est_click, e.exact_purchase, e.est_purchase,
           u.m AS exact_union,
           round(CASE WHEN u.m < {KMV_K} THEN CAST(u.m AS DOUBLE)
                 ELSE CAST({KMV_K - 1} AS DOUBLE) * CAST({KMV_DOMAIN} AS DOUBLE)
                      / CAST(u.kth AS DOUBLE) END, 4) AS est_union,
           round(e.est_click + e.est_purchase
                 - CASE WHEN u.m < {KMV_K} THEN CAST(u.m AS DOUBLE)
                   ELSE CAST({KMV_K - 1} AS DOUBLE)
                        * CAST({KMV_DOMAIN} AS DOUBLE)
                        / CAST(u.kth AS DOUBLE) END, 4) AS est_intersect
    FROM ests e CROSS JOIN uni u
    """,
)
def q_agg_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch over active user-days per
    event type, WITH the set algebra HLL cannot do exactly: merging two
    KMV sketches (k smallest of the union of hash sets) estimates the
    union cardinality, and inclusion-exclusion gives the intersection —
    'how many user-days both clicked AND purchased' from two
    128-value sketches instead of a corpus-wide distinct join.  The
    exact counts ride along as the sf-scale acceptance check (dropped
    in production, where only the 2×K sketch values move).

    Scale shape: hash once per row (60-bit md5 prefix — uniform), ONE
    hash-distinct shuffle on (type, h), then a two-stage k-min: rank
    within (type, salt = h mod {KMV_SALTS}) keeps every first-stage
    window partition ~1/{KMV_SALTS} of a type's distinct set, and the
    second rank runs over ≤ salts×k survivor rows per type — no
    global-ordering window ever sees the full distinct relation (the
    same trick a TakeOrderedAndProject would hide, spelled out so the
    union sketch can reuse the survivors).  Estimates are (k−1)·D/h(k)
    — three exact-long operands in one fixed-order double expression.
    Fallback m < k degrades to the exact count, per the KMV contract.
    """
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("user_id").cast("string"),
                    F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    keys = e.select("event_type", h.alias("h")).distinct()

    def kmin(df: DataFrame, part_cols: list[str]):
        """Two-stage distributed k-min + cardinality over `df.h`."""
        w1 = Window.partitionBy(*(part_cols + ["salt"])).orderBy("h")
        stage1 = (
            df.withColumn("salt", F.pmod(F.col("h"), F.lit(KMV_SALTS)))
            .withColumn("rk1", F.row_number().over(w1))
            .withColumn(
                "cnt1",
                F.count(F.lit(1)).over(
                    Window.partitionBy(*(part_cols + ["salt"]))
                ),
            )
        )
        survivors = stage1.filter(F.col("rk1") <= KMV_K)
        w2 = Window.partitionBy(*part_cols).orderBy("h")
        m = survivors.groupBy(*part_cols).agg(
            F.sum(
                F.when(F.col("rk1") == 1, F.col("cnt1")).otherwise(0)
            ).cast("long").alias("m")
        )
        kth = (
            survivors.withColumn("rk", F.row_number().over(w2))
            .filter(F.col("rk") == KMV_K)
            .select(*part_cols, F.col("h").alias("kth"))
        )
        if part_cols:
            return m.join(kth, part_cols, "left")
        # Global (no part_cols) case: kth is EMPTY when the union holds
        # fewer than KMV_K distinct keys, and a crossJoin against an
        # empty relation would drop m entirely — left-join on a dummy
        # key so m survives with kth=NULL and est()'s m<k exact-count
        # fallback applies (r6 advice item).
        return (
            m.withColumn("_j", F.lit(1))
            .join(
                F.broadcast(kth.withColumn("_j", F.lit(1))), "_j", "left"
            )
            .drop("_j")
        )

    est = lambda: F.round(  # noqa: E731 — shared fixed-order estimate expr
        F.when(F.col("m") < KMV_K, F.col("m").cast("double")).otherwise(
            F.lit(float(KMV_K - 1))
            * F.lit(float(KMV_DOMAIN))
            / F.col("kth").cast("double")
        ),
        4,
    )
    per_type = kmin(keys, ["event_type"]).select(
        "event_type", "m", est().alias("est")
    )
    uni = kmin(keys.select("h").distinct(), []).select(
        F.col("m").alias("exact_union"), est().alias("est_union")
    )
    ests = per_type.groupBy().agg(
        F.max(F.when(F.col("event_type") == "click", F.col("m"))).alias(
            "exact_click"
        ),
        F.max(F.when(F.col("event_type") == "click", F.col("est"))).alias(
            "est_click"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("m"))).alias(
            "exact_purchase"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("est"))).alias(
            "est_purchase"
        ),
    )
    return ests.crossJoin(F.broadcast(uni)).select(
        "exact_click",
        "est_click",
        "exact_purchase",
        "est_purchase",
        "exact_union",
        "est_union",
        F.round(
            F.col("est_click") + F.col("est_purchase") - F.col("est_union"), 4
        ).alias("est_intersect"),
    )


# ---------------------------------------------------------------------------
# Multivariate outlier flags: diagonal Mahalanobis over the numeric columns
# ---------------------------------------------------------------------------

MAHAL_THRESHOLD = 16.0  # ~ chi2(4) far tail: sum of 4 squared z-scores


@query(
    "q_dq_multivariate_outlier",
    oracle=f"""
    WITH q AS (
      SELECT l_returnflag,
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x1,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x2,
             CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS x3,
             CAST(floor(l_tax * 10000 + 0.5) AS BIGINT) AS x4
      FROM lineitem
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS DOUBLE) AS s1, CAST(SUM(x1 * x1) AS DOUBLE) AS ss1,
             CAST(SUM(x2) AS DOUBLE) AS s2, CAST(SUM(x2 * x2) AS DOUBLE) AS ss2,
             CAST(SUM(x3) AS DOUBLE) AS s3, CAST(SUM(x3 * x3) AS DOUBLE) AS ss3,
             CAST(SUM(x4) AS DOUBLE) AS s4, CAST(SUM(x4 * x4) AS DOUBLE) AS ss4
      FROM q
    ),
    scored AS (
      SELECT q.l_returnflag,
             (x1 - s1 / n) * (x1 - s1 / n) / ((ss1 - s1 / n * s1) / (n - 1))
             + (x2 - s2 / n) * (x2 - s2 / n) / ((ss2 - s2 / n * s2) / (n - 1))
             + (x3 - s3 / n) * (x3 - s3 / n) / ((ss3 - s3 / n * s3) / (n - 1))
             + (x4 - s4 / n) * (x4 - s4 / n) / ((ss4 - s4 / n * s4) / (n - 1))
               AS score
      FROM q CROSS JOIN m
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN score > {MAHAL_THRESHOLD} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           round(CAST(SUM(CASE WHEN score > {MAHAL_THRESHOLD} THEN 1 ELSE 0
                          END) AS DOUBLE) / COUNT(*), 6) AS outlier_rate
    FROM scored
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_dq_multivariate_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate outlier detection: diagonal-covariance Mahalanobis
    distance over lineitem's four numeric columns (quantity, price,
    discount, tax) — a row is anomalous when its SUM of squared
    z-scores clears the χ² tail, which catches jointly-weird rows
    (high quantity AND high discount AND nonzero tax) that every
    per-column gate (q_dq_outlier_iqr) individually passes.  This is
    the cheap version of the isolation-forest / full-Mahalanobis DQ
    stage — no matrix inverse, no model, two scans.

    Pass 1 computes the 4 columns' exact moments (scaled-long carriers;
    squared sums in DECIMAL(38) / int128, since cents² overflows a
    long at corpus scale); pass 2 broadcasts those 9 numbers and scores
    every row in the scan — at 100 TB the moment pass is the stats-
    profile job's byproduct, so the incremental cost is one map-only
    pass.  All per-row arithmetic is fixed-order double math on exact
    operands → the > threshold decision is engine-exact.
    """
    li = t(spark, sf_dir, "lineitem")
    q = li.select(
        "l_returnflag",
        F.floor(F.col("l_quantity") * 100 + 0.5).cast("long").alias("x1"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("x2"),
        F.floor(F.col("l_discount") * 10000 + 0.5).cast("long").alias("x3"),
        F.floor(F.col("l_tax") * 10000 + 0.5).cast("long").alias("x4"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i in (1, 2, 3, 4):
        aggs.append(F.sum(f"x{i}").cast("double").alias(f"s{i}"))
        aggs.append(
            F.sum((F.col(f"x{i}") * F.col(f"x{i}")).cast("decimal(38,0)"))
            .cast("double")
            .alias(f"ss{i}")
        )
    m = q.agg(*aggs)

    def zsq(i: int):
        x = F.col(f"x{i}").cast("double")
        mean = F.col(f"s{i}") / F.col("n")
        var = (F.col(f"ss{i}") - mean * F.col(f"s{i}")) / (F.col("n") - 1)
        return (x - mean) * (x - mean) / var

    score = zsq(1) + zsq(2) + zsq(3) + zsq(4)
    flagged = F.sum(
        F.when(F.col("score") > MAHAL_THRESHOLD, 1).otherwise(0)
    ).cast("long")
    return (
        q.crossJoin(F.broadcast(m))
        .select("l_returnflag", score.alias("score"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            flagged.alias("n_outliers"),
            F.round(flagged.cast("double") / F.count(F.lit(1)), 6).alias(
                "outlier_rate"
            ),
        )
        .orderBy("l_returnflag")
    )


_KEY_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@query(
    "q_dq_key_discovery",
    oracle="""
    WITH counts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
    """
    + ",\n    ".join(
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS d_{c}" for c in _KEY_COLS
    )
    + """
      FROM orders
    )
    SELECT col, n_distinct, n_rows,
           round(CAST(n_distinct AS DOUBLE) / n_rows, 6) AS uniqueness,
           CAST(n_distinct = n_rows AS BOOLEAN) AS is_key
    FROM (
    """
    + "\n      UNION ALL ".join(
        f"SELECT '{c}' AS col, d_{c} AS n_distinct, n_rows FROM counts"
        for c in _KEY_COLS
    )
    + """
    ) ORDER BY col
    """,
)
def q_dq_key_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery on the orders table: exact uniqueness
    ratio (distinct/rows) per column with an is_key verdict — the
    schema-archaeology profiling every warehouse onboarding runs before
    trusting a join key or declaring a merge target
    (q_dq_uniqueness asserts ONE known key; this one FINDS them).

    One scan: all per-column exact distinct counts ride a single
    multi-COUNT(DISTINCT) aggregation (Spark plans it as one Expand —
    |cols| passes over the shuffled expansion, not |cols| scans of the
    table); the verdict relation is |cols| rows unpivoted from the
    1-row count record."""
    o = t(spark, sf_dir, "orders")
    counts = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[
            F.countDistinct(c).cast("long").alias(f"d_{c}")
            for c in _KEY_COLS
        ],
    )
    stack = ", ".join(f"'{c}', d_{c}" for c in _KEY_COLS)
    return (
        counts.selectExpr(
            "n_rows", f"stack({len(_KEY_COLS)}, {stack}) AS (col, n_distinct)"
        )
        .select(
            "col",
            "n_distinct",
            "n_rows",
            F.round(
                F.col("n_distinct").cast("double") / F.col("n_rows"), 6
            ).alias("uniqueness"),
            (F.col("n_distinct") == F.col("n_rows")).alias("is_key"),
        )
        .orderBy("col")
    )


_FD_CANDIDATES = (
    ("o_orderkey", "o_custkey"),
    ("o_orderkey", "o_orderstatus"),
    ("o_custkey", "o_orderpriority"),
    ("o_orderdate", "o_orderstatus"),
    ("o_orderpriority", "o_orderstatus"),
)


@query(
    "q_dq_functional_deps",
    oracle="""
    """
    + "\n    UNION ALL ".join(
        f"""SELECT '{a} -> {b}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_lhs_values,
           CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) = 0 AS BOOLEAN)
             AS holds
    FROM (SELECT {a}, COUNT(DISTINCT {b}) AS nb FROM orders GROUP BY {a})"""
        for a, b in _FD_CANDIDATES
    )
    + """
    ORDER BY fd
    """,
)
def q_dq_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency verification: for each candidate A → B on
    orders, the number of A-values mapping to MORE than one B (exact
    violation count) and a holds verdict — the schema-archaeology
    companion to q_dq_key_discovery (keys are the FDs where A → every
    column); broken 'obvious' FDs are how denormalized upstream feeds
    reveal themselves.

    Per candidate: one (A, countDistinct B) aggregation on the uniform
    A key, then a count over the violating groups — each candidate is
    one shuffle of the narrow two-column projection, unioned into the
    |candidates|-row verdict relation."""
    o = t(spark, sf_dir, "orders")
    parts = []
    for a, b in _FD_CANDIDATES:
        g = (
            o.groupBy(a)
            .agg(F.countDistinct(b).alias("nb"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_lhs_values"),
                F.sum(F.when(F.col("nb") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating"),
            )
            .select(
                F.lit(f"{a} -> {b}").alias("fd"),
                "n_lhs_values",
                "n_violating",
                (F.col("n_violating") == 0).alias("holds"),
            )
        )
        parts.append(g)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("fd")
