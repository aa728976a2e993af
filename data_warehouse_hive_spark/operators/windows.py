"""Window functions — SURVEY.md §2.5 (HiveQL windowing, delegated by the
reference to Hive; native `pyspark.sql.Window` here).

Determinism: every ORDER BY inside a window carries a unique-key tiebreak
(orderkey / event_id) so ROW_NUMBER / LAG / frame contents are a function
of the data, not of partition order — required for cross-engine checks and
plain good practice for reproducible pipelines.

Scale: a window over PARTITION BY k is one shuffle on k + a per-partition
sort.  Partition keys below (custkey, suppkey) have high cardinality, so
state per key stays small — no single-executor hotspot at 100 TB.  The one
anti-pattern avoided: a window with ORDER BY and *no* PARTITION BY
collapses to a single partition; only `q_win_global_rank`-style analytics
on pre-aggregated (small) inputs may do that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_hive_spark.registry import query, to_carrier
from data_warehouse_hive_spark.tables import t


@query(
    "q_win_rownum",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           ROW_NUMBER()  OVER w AS rn,
           RANK()        OVER w AS rk,
           DENSE_RANK()  OVER w AS drk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_win_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER / RANK / DENSE_RANK / NTILE over PARTITION BY ... ORDER BY."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rk"),
        F.dense_rank().over(w).cast("long").alias("drk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "q_win_lag",
    oracle="""
    SELECT event_id, user_id, ts, value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(value) OVER w AS first_val,
           LAST_VALUE(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND UNBOUNDED FOLLOWING) AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG / LEAD / FIRST_VALUE / LAST_VALUE per user ordered by event time.

    LAST_VALUE uses an explicit unbounded frame — the default frame stops
    at CURRENT ROW in both engines, which is rarely what's meant.
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w_full).alias("last_val"),
    )


@query(
    "q_win_frame_rows",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 1e6 AS running_total,
           CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 1e6
             / LEAST(CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey) AS DOUBLE), 3.0)
             AS moving_avg3
    FROM orders
    """,
)
def q_win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame aggregates: running total + 3-row moving average.

    Frame sums go through the exact scaled-long carrier (registry.py) so
    every prefix sum is bit-identical across engines regardless of how
    each engine folds the frame (DuckDB's segment tree vs Spark's linear
    accumulation); long addition also beats a BigDecimal buffer inside
    the non-codegen WindowExec.
    """
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = w.rowsBetween(-2, Window.currentRow)
    price_c = to_carrier(F.col("o_totalprice"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.sum(price_c).over(run).cast("double") / 1e6).alias("running_total"),
        (
            F.sum(price_c).over(last3).cast("double") / 1e6
            / F.least(F.row_number().over(w).cast("double"), F.lit(3.0))
        ).alias("moving_avg3"),
    )


@query(
    "q_win_frame_range",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                               RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_within_50k,
           CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 1e6 AS sum_within_50k
    FROM orders
    """,
)
def q_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame aggregates: peers are defined by order-column *value*
    (all rows within 50k below the current price), so ties share a frame
    and no unique tiebreak is needed for determinism."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_50k"),
        (
            F.sum(to_carrier(F.col("o_totalprice"))).over(w).cast("double") / 1e6
        ).alias("sum_within_50k"),
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn
    FROM (
        SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                  ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) ranked
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (rank ≤ k idiom): top 3 orders per market segment.

    Spark pushes the rank filter into the window sort (WindowGroupLimit),
    so each partition keeps only k rows through the shuffle — the scalable
    form of per-group top-k.
    """
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_dist",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           round(percent_rank() OVER w, 9) AS pct_rank,
           round(cume_dist()    OVER w, 9) AS cume,
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank ((rank-1)/(n-1)) and
    cume_dist (rank/n).  Both are ratios of identical integers in the two
    engines, rounded to 9 dp only to normalize the division's last-ulp
    formatting.  Unique ORDER BY tiebreak (o_orderkey) makes ranks — and
    therefore both ratios — fully deterministic."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


@query(
    "q_win_ntile",
    oracle="""
    SELECT o_orderkey, o_custkey,
           NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS spend_quartile,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE o_orderkey % 32 = 0
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quantile bucketing: assign each order to a spend quartile.
    Deterministic (o_totalprice, o_orderkey) tiebreak so both engines
    produce identical tiles.  The unpartitioned window is bounded by the
    pushed o_orderkey filter (1/32 sample) — an UNPARTITIONED ntile over
    raw 100 TB would serialize through one task; at scale either
    pre-filter (as here) or use percent_rank over partitioned keys."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 32 == 0)
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("spend_quartile"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )


@query(
    "q_win_ignore_nulls",
    oracle="""
    WITH base AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END
               AS closed_price
      FROM orders
    )
    SELECT o_custkey, o_orderkey, closed_price,
           LAG(closed_price IGNORE NULLS)
             OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
             AS prev_closed,
           LAST_VALUE(closed_price IGNORE NULLS)
             OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS latest_closed,
           FIRST_VALUE(closed_price IGNORE NULLS)
             OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS first_closed
    FROM base
    """,
)
def q_win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS navigation — LAG / FIRST_VALUE / LAST_VALUE skipping
    null measure values: the gap-carrying idiom behind "last known good
    value per key" (sensor forward-fill, sparse SCD attributes).  Same
    single-shuffle window shape as the plain navigation functions; the
    null-skip is evaluated inside the running frame, not by a self-join.
    Both engines implement the ANSI IGNORE NULLS semantics directly.
    """
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_ign")
    # LAG ... IGNORE NULLS has no DataFrame-API binding; the SQL surface is
    # the parity target anyway (identical text modulo the view name).
    return spark.sql(
        """
        WITH base AS (
          SELECT o_custkey, o_orderkey,
                 CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END
                   AS closed_price
          FROM orders_ign
        )
        SELECT o_custkey, o_orderkey, closed_price,
               LAG(closed_price) IGNORE NULLS
                 OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
                 AS prev_closed,
               LAST_VALUE(closed_price) IGNORE NULLS
                 OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS latest_closed,
               FIRST_VALUE(closed_price) IGNORE NULLS
                 OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS first_closed
        FROM base
        """
    )


@query(
    "q_win_running_distinct",
    oracle="""
    WITH marked AS (
      SELECT event_id, event_type, ts, user_id,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_type, user_id
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT event_id, event_type,
           CAST(SUM(first_seen) OVER (PARTITION BY event_type
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS distinct_users_so_far
    FROM marked
    """,
)
def q_win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT user) per event_type over event time —
    the cumulative-unique-users curve, a window SQL cannot express
    directly (COUNT(DISTINCT) OVER is unsupported in both engines).

    Standard two-window decomposition: mark each (type, user)'s first
    occurrence with ROW_NUMBER()=1, then running-SUM the markers.  Both
    windows shuffle on keys that include event_type — Catalyst plans them
    as two sorts over ONE exchange when the partition keys nest (the
    second window's key is a prefix of the first's), and per-partition
    state is O(1) — this scales where a collect_set-based window (O(n)
    state per row) would not.
    """
    e = t(spark, sf_dir, "events")
    w_first = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = e.select(
        "event_id",
        "event_type",
        "ts",
        "user_id",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "first_seen"
        ),
    )
    return marked.select(
        "event_id",
        "event_type",
        F.sum("first_seen").over(w_run).alias("distinct_users_so_far"),
    )


@query(
    "q_win_ratio_total",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name,
             CAST(SUM(CAST(floor(o.o_totalprice * 1e6 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name,
           CAST(rev_c AS DOUBLE) / 1e6 AS revenue,
           round(CAST(rev_c AS DOUBLE)
                 / CAST(SUM(rev_c) OVER () AS DOUBLE), 6) AS share_of_total,
           round(CAST(rev_c AS DOUBLE)
                 / CAST(MAX(rev_c) OVER () AS DOUBLE), 6) AS pct_of_max
    FROM rev
    ORDER BY n_name
    """,
)
def q_win_ratio_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of total and percent-of-max
    revenue — the unpartitioned-window reporting idiom (SUM() OVER ()).

    The window runs over the PRE-AGGREGATED ≤25-row relation, never the
    fact table — the only legitimate use of an unpartitioned window (the
    q_win_ntile rule).  The grand total is a sum of per-nation carrier
    longs, so the shares divide identical operands in both engines.
    """
    from data_warehouse_hive_spark.registry import to_carrier

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    from pyspark.sql.functions import broadcast

    rev = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(to_carrier(F.col("o_totalprice"))).alias("rev_c"))
    )
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        (F.col("rev_c").cast("double") / 1e6).alias("revenue"),
        F.round(
            F.col("rev_c").cast("double") / F.sum("rev_c").over(w).cast("double"), 6
        ).alias("share_of_total"),
        F.round(
            F.col("rev_c").cast("double") / F.max("rev_c").over(w).cast("double"), 6
        ).alias("pct_of_max"),
    ).orderBy("n_name")


@query(
    "q_win_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS day_n
      FROM events
    ),
    grouped AS (
      SELECT user_id, day_n,
             day_n - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_n)
               AS island
      FROM days
    ),
    islands AS (
      SELECT user_id, island, COUNT(*) AS streak_len
      FROM grouped GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
           COUNT(*) AS n_streaks,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak
    FROM islands
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_win_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-active-day streaks — the
    classic sequence-detection shape (login streaks, sensor uptime,
    subscription continuity).

    The island key is `day_number − row_number` (consecutive days share
    it; a gap shifts it) — pure integer arithmetic after projecting the
    date to a day count, so no date-type bridging is needed anywhere.
    One window shuffle on user_id, then two tiny aggregations.
    """
    e = t(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "day_n"
        ),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_n")
    grouped = days.withColumn("island", F.col("day_n") - F.row_number().over(w))
    islands = grouped.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.sum("streak_len").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("streak_len").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


@query(
    "q_win_frame_time",
    oracle="""
    SELECT event_id, event_type,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) OVER w
                AS DOUBLE) / 1e6 AS v_last_hour
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def q_win_frame_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per event, count and value-sum of the SAME
    TYPE's events in the trailing hour — the rolling-rate primitive
    behind throttling and burst detection, without pre-bucketing into
    fixed windows.

    The frame is defined on the microsecond epoch (a long), so peers are
    value-determined and ties need no unique tiebreak; the carrier sum
    keeps the windowed double exact.  Partitioned by event_type — state
    per partition is the sliding frame only, and at 100 TB a skewed
    type is salted by day before windowing (the frame never crosses the
    salt boundary wider than 1 h, so day-salting is semantics-exact up
    to the boundary hour, handled by overlap-and-trim)."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "event_type",
            F.count(F.lit(1)).over(w).alias("n_last_hour"),
            (
                F.sum(to_carrier(F.col("value"))).over(w).cast("double")
                / F.lit(1e6)
            ).alias("v_last_hour"),
        )
        .orderBy("event_id")
    )


@query(
    "q_win_nth",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER w AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def q_win_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window navigation: FIRST_VALUE / LAST_VALUE /
    NTH_VALUE(2) over the customer's full order history — "first order,
    latest order, second-ever order" in one pass.  The frame is pinned
    to the FULL partition explicitly: with the default frame (unbounded
    preceding → current row) LAST_VALUE degenerates to the current row,
    the classic silent-wrong-answer; the (date, key) order is total so
    every position is deterministic."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "q_win_cumsum_reset",
    oracle="""
    WITH flagged AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             CASE WHEN LAG(epoch_us(o_orderdate))
                         OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) IS NULL
                  THEN 0
                  WHEN epoch_us(o_orderdate)
                       - LAG(epoch_us(o_orderdate))
                           OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey)
                       > 30 * 86400000000 THEN 1
                  ELSE 0 END AS new_episode
      FROM orders
    ),
    episodes AS (
      SELECT *,
             SUM(new_episode) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS episode
      FROM flagged
    )
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(episode AS BIGINT) AS episode,
           CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey, episode
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 1e6 AS episode_revenue
    FROM episodes
    """,
)
def q_win_cumsum_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with CONDITIONAL RESET: per-customer revenue that
    restarts whenever a >30-day purchase gap opens a new "episode" —
    the sessionized-cumsum shape (burn-down counters, streak totals,
    campaign-window spend) that plain frames can't express without the
    two-level gaps-and-islands composition stated here: lag → gap flag
    → running flag-sum AS the episode id → cumsum re-partitioned by
    (customer, episode).

    Both windows order identically, so Catalyst plans ONE shuffle on
    o_custkey and the episode window runs over the same sort (the
    (custkey, episode) partition is a prefix-refinement of it).  Gaps
    are exact microsecond integers; the revenue prefix sums ride the
    1e6 carrier so every prefix is engine-identical.
    """
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # parquet TIMESTAMP_NTZ -> session-zoned (UTC session: same instant)
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    prev = F.lag(us).over(w)
    flagged = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.when(prev.isNull(), 0)
        .when(us - prev > 30 * 86_400_000_000, 1)
        .otherwise(0)
        .alias("new_episode"),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    episodes = flagged.withColumn("episode", F.sum("new_episode").over(run))
    we = (
        Window.partitionBy("o_custkey", "episode")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return episodes.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.col("episode").cast("long").alias("episode"),
        (
            F.sum(to_carrier(F.col("o_totalprice"))).over(we).cast("double")
            / 1e6
        ).alias("episode_revenue"),
    )


@query(
    "q_win_rolling_median",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d')
               AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, day
    ),
    framed AS (
      SELECT event_type, day, n,
             list_sort(list(n) OVER (PARTITION BY event_type ORDER BY day
                                     ROWS BETWEEN 6 PRECEDING
                                     AND CURRENT ROW)) AS win
      FROM daily
    )
    SELECT event_type, day, n,
           CAST(win[(len(win) + 1) // 2] AS BIGINT) AS roll_median
    FROM framed
    ORDER BY event_type, day
    """,
)
def q_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day median of the daily event-rate per type — the
    robust smoother dashboards use where a rolling MEAN would chase
    single-day spikes.  Spark's median()/percentile_disc() refuse
    window frames (SCALING.md), so the frame median is composed
    explicitly: collect_list over the 7-row frame, sort, take the
    deterministic lower median — identical convention stated on both
    engines (no interpolation to disagree on).

    The frame holds ≤7 small integers, so the per-row list is O(1);
    windows run over the bounded (type × day) rollup, partitioned by
    type — never over raw events."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    return (
        daily.withColumn(
            "win", F.sort_array(F.collect_list("n").over(w))
        )
        .select(
            "event_type",
            "day",
            "n",
            F.element_at(
                F.col("win"), F.expr("CAST((size(win) + 1) DIV 2 AS INT)")
            )
            .cast("long")
            .alias("roll_median"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# GROUPS window frames: peer-group frames, emulated on dense_rank
# ---------------------------------------------------------------------------


@query(
    "q_win_frame_groups",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey, o_orderpriority,
             date_part('year', o_orderdate) AS yr,
             strftime(o_orderdate, '%Y-%m-%d') AS day,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             DENSE_RANK() OVER (PARTITION BY o_orderpriority,
                                             date_part('year', o_orderdate)
                                ORDER BY o_orderdate) AS dr
      FROM orders
    )
    SELECT o_orderkey, o_orderpriority, day,
           CAST(SUM(cents) OVER w AS BIGINT) AS grp_sum_cents,
           CAST(COUNT(*) OVER w AS BIGINT) AS grp_n
    FROM ranked
    WINDOW w AS (PARTITION BY o_orderpriority, yr ORDER BY dr
                 RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
)
def q_win_frame_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS window frames — 'this peer group and the previous peer
    group', where a peer group is all rows TIED on the ordering key
    (here: all orders of the same date) — the third ANSI frame mode
    next to ROWS and RANGE.  Neither Spark nor DuckDB implements
    GROUPS, so this id ships the standard EMULATION both dialects need:
    dense_rank() numbers the peer groups and a RANGE frame over that
    integer rank ([rank−1, rank]) reproduces GROUPS semantics exactly
    (peer totals equal for every member of a tie group — the property
    a ROWS frame gets wrong).

    Partitions are (priority, year) so per-partition row counts stay
    bounded as history grows (GROUPS semantics are per-partition
    either way); two window passes over the same partitioning — Spark
    plans ONE exchange and two Window operators.  Sums ride exact
    cents.
    """
    o = t(spark, sf_dir, "orders")
    part = [F.col("o_orderpriority"), F.year("o_orderdate").alias("yr")]
    wdr = Window.partitionBy(*part).orderBy("o_orderdate")
    ranked = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.year("o_orderdate").alias("yr"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        F.dense_rank().over(wdr).alias("dr"),
    )
    wg = (
        Window.partitionBy("o_orderpriority", "yr")
        .orderBy("dr")
        .rangeBetween(-1, 0)
    )
    return ranked.select(
        "o_orderkey",
        "o_orderpriority",
        "day",
        F.sum("cents").over(wg).cast("long").alias("grp_sum_cents"),
        F.count(F.lit(1)).over(wg).cast("long").alias("grp_n"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Rolling MAD band: robust anomaly envelope on the daily series
# ---------------------------------------------------------------------------

MAD_K = 5  # band half-width in MADs (~3.4 sigma if the series were normal)


@query(
    "q_win_rolling_mad",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d')
               AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, day
    ),
    framed AS (
      SELECT event_type, day, n,
             list_sort(list(n) OVER w) AS win
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    med AS (
      SELECT event_type, day, n, len(win) AS wn,
             CAST(win[(len(win) + 1) // 2] AS BIGINT) AS roll_med,
             list_sort(list_transform(win,
               x -> abs(x - win[(len(win) + 1) // 2]))) AS devs
      FROM framed
    )
    SELECT event_type, day, n, roll_med,
           CAST(devs[(wn + 1) // 2] AS BIGINT) AS roll_mad,
           (wn >= 7 AND abs(n - roll_med)
              > {MAD_K} * devs[(wn + 1) // 2]) AS is_anomaly
    FROM med
    ORDER BY event_type, day
    """,
)
def q_win_rolling_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling MAD anomaly band: per type and day, the 7-day rolling
    median, the rolling median-absolute-deviation around it, and an
    anomaly flag when today sits more than {MAD_K} MADs out — the
    robust alternative to q_events_zscore's mean/std band (one genuine
    spike inflates a rolling std enough to hide the next spike; the
    MAD barely moves).  Completes the robust-smoothing pair started by
    q_win_rolling_median.

    Same bounded shape as the rolling median: windows over the
    (type × day) rollup partitioned by type, each frame ≤7 small
    integers, median and MAD composed explicitly (lower-median
    convention both engines) because median() refuses frames.  All
    integer arithmetic — the flag compares exact longs.
    """
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    framed = daily.withColumn(
        "win", F.sort_array(F.collect_list("n").over(w))
    )
    med = framed.select(
        "event_type",
        "day",
        "n",
        F.size("win").alias("wn"),
        F.element_at(
            F.col("win"), F.expr("CAST((size(win) + 1) DIV 2 AS INT)")
        )
        .cast("long")
        .alias("roll_med"),
        F.sort_array(
            F.expr(
                "transform(win, x -> abs(x - win[CAST((size(win) + 1)"
                " DIV 2 AS INT) - 1]))"
            )
        ).alias("devs"),
    )
    mad = F.element_at(
        F.col("devs"), F.expr("CAST((wn + 1) DIV 2 AS INT)")
    ).cast("long")
    return med.select(
        "event_type",
        "day",
        "n",
        "roll_med",
        mad.alias("roll_mad"),
        (
            (F.col("wn") >= 7)
            & (F.abs(F.col("n") - F.col("roll_med")) > MAD_K * mad)
        ).alias("is_anomaly"),
    ).orderBy("event_type", "day")


@query(
    "q_win_cume_dist",
    oracle="""
    WITH r AS (
      SELECT l_returnflag,
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q100
      FROM lineitem
    )
    SELECT DISTINCT l_returnflag,
           q100 / 100.0 AS quantity,
           floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cume_dist,
           floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank
    FROM r
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY q100)
    ORDER BY l_returnflag, quantity
    """,
)
def q_win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUME_DIST and PERCENT_RANK per return flag over quantity — the
    two SQL-standard relative-rank window functions the §2.5 window
    family still lacked (ntile, row_number, rank, nth, lag/lead and
    frames were covered): cume_dist = rows ≤ v / n (the empirical CDF
    as a window function), percent_rank = (rank−1)/(n−1).  Both are
    tie-aware BY THE STANDARD (all peers share a value), so projecting
    DISTINCT (flag, value) rows yields the bounded value-domain
    relation — the windowed form of the histogram-CDF idiom the rank
    statistics use.

    Scale: one shuffle on the partition key; the per-partition sort is
    the window's contract.  Both functions are exact rational counts
    divided once — engine-identical on identical input multisets.

    Determinism: the window ORDERS BY the exact 100× integer carrier
    and the display value is that SAME carrier divided once, so the
    output sort (flag, quantity) is TOTAL — windowing raw doubles while
    displaying a 2-dp rounding would let two raws colliding at 2 dp
    yield duplicate `quantity` rows in engine-dependent order (the
    non-total-sort class the sf1 sweep fixed elsewhere).  The rank
    values themselves are floor-pinned (house rule), not round()ed."""
    # r14 (guide §2.5 stragglers): the row-level window shuffled all
    # 600k rows into |returnflag| = 3 partitions — a 3-core sort no
    # matter how wide the cluster.  Both functions are TIE-AWARE, so
    # they are exact functions of the per-(flag, value) histogram:
    #   cume_dist(v)  = cum(v) / n
    #   percent_rank(v) = (rank(v) - 1) / (n - 1),
    #     rank(v) = cum(v) - cnt(v) + 1
    # — the same long counts the window form divides, divided in the
    # same order, so the doubles (and their 1e6 floor pins) are
    # bit-identical.  The corpus-scale work becomes one map-side-
    # combinable groupBy; the windows run over the ~150-row value
    # histogram.  (percent_rank's n=1 edge is pinned to 0.0 exactly as
    # the window function defines it.)
    q100 = F.floor(F.col("l_quantity") * 100 + 0.5).cast("long")
    vc = (
        t(spark, sf_dir, "lineitem")
        .select("l_returnflag", q100.alias("q100"))
        .groupBy("l_returnflag", "q100")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("q100")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("l_returnflag")
    return (
        vc.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("n", F.sum("cnt").over(wn))
        .select(
            "l_returnflag",
            (F.col("q100") / 100.0).alias("quantity"),
            (
                F.floor(F.col("cum") / F.col("n") * 1e6 + 0.5) / 1e6
            ).alias("cume_dist"),
            F.when(
                F.col("n") > 1,
                F.floor(
                    (F.col("cum") - F.col("cnt"))
                    / (F.col("n") - 1)
                    * 1e6
                    + 0.5
                )
                / 1e6,
            )
            .otherwise(F.lit(0.0))
            .alias("pct_rank"),
        )
        .orderBy("l_returnflag", "quantity")
    )
