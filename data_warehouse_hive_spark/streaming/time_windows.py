"""Batch time-window queries over `events` — SURVEY.md §2.10.

The reference has no streaming surface at all (absence verified across
reference backend/ and docker/ — ingestion is request-driven batch), so
these are extension operators: the batch forms of the standard streaming
aggregations, written so the same logic lifts to Structured Streaming
unchanged (see streaming/stream.py for the readStream/watermark form).

Scale: tumbling windows shuffle once on (window, key) with partial
aggregation; sessionization shuffles once on user_id then does a linear
per-user scan — both the canonical scalable shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_hive_spark.registry import dsum, o_dsum, query
from data_warehouse_hive_spark.tables import t


@query(
    "q_time_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {o_dsum('value', 'sum_value')},
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q_time_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation over event time.

    Uses `F.window('ts', '1 hour')` — the same operator Structured
    Streaming uses — whose aligned window start equals date_trunc('hour').
    """
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


@query(
    "q_time_sliding",
    oracle=f"""
    WITH slid AS (
      SELECT e.*, s.window_start
      FROM events e,
           LATERAL (SELECT unnest([
               time_bucket(INTERVAL 30 MINUTE, e.ts),
               time_bucket(INTERVAL 30 MINUTE, e.ts) - INTERVAL 30 MINUTE
             ]) AS window_start) s
      WHERE e.ts >= s.window_start
        AND e.ts < s.window_start + INTERVAL 1 HOUR
    )
    SELECT window_start, COUNT(*) AS n_events, {o_dsum('value', 'sum_value')}
    FROM slid
    GROUP BY window_start
    """,
)
def q_time_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 30 min slide): each event lands in two
    overlapping windows — Spark's windowing generator expands them natively.
    """
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@query(
    "q_time_session_gap",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM marked
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           {o_dsum('value', 'sum_value')}
    FROM sessioned
    GROUP BY user_id, session_id
    """,
)
def q_time_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization by 30-minute inactivity gap: the lag + cumulative-sum
    session-id idiom (one shuffle on user_id, linear per-user pass), then
    per-session aggregates.  The streaming twin is `F.session_window`."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    is_start = F.when(gap.isNull() | (gap > 1800.0), 1).otherwise(0)
    return (
        e.withColumn("is_start", is_start)
        .withColumn("session_id", F.sum("is_start").over(run).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            dsum("value", "sum_value"),
        )
    )


@query(
    "q_events_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events
      GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
           CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
           CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                          AND first_purchase > first_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS converted
    FROM per_user
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (view → click → purchase, in order): per-user first
    occurrence of each stage via conditional min, then ordered-stage
    counts.  One grouped aggregation + a one-row summary — the funnel
    never materializes per-event state, so it scales as a plain two-phase
    agg on user_id (compare: the naive self-join-per-stage formulation is
    quadratic in stages × events)."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    viewed = F.col("first_view").isNotNull()
    clicked = viewed & (F.col("first_click") > F.col("first_view"))
    converted = clicked & (F.col("first_purchase") > F.col("first_click"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(viewed, 1).otherwise(0)).alias("viewed"),
        F.sum(F.when(clicked, 1).otherwise(0)).alias("clicked_after_view"),
        F.sum(F.when(converted, 1).otherwise(0)).alias("converted"),
    )


@query(
    "q_events_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(min(date_trunc('day', ts)) AS TIMESTAMP) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             date_diff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS TIMESTAMP)) AS day_n
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT CAST(day_n AS BIGINT) AS day_n,
           COUNT(*) AS active_users
    FROM activity
    WHERE day_n <= 7
    GROUP BY day_n
    """,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users active on day N after their first-seen day
    (the DAU-retention curve).  Two grouped aggregations + one join on
    user_id — at scale the firsts table is small per user and broadcast-
    joinable; no per-day self-joins."""
    e = t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    firsts = e.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            F.datediff(day, F.col("cohort_day")).cast("long").alias("day_n"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_n") <= 7)
        .groupBy("day_n")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@query(
    "q_events_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM ordered
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-flow transition matrix: counts of (previous event type →
    next event type) per user timeline — the first-order Markov view of
    user journeys that funnels/sessionization build on.

    One shuffle on user_id for the LAG window (per-user timelines are
    short, so no skew), then a partial+final agg on the tiny
    (prev, next) key domain.  Ordering ties on ts break by event_id so
    the matrix is deterministic on both engines."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_ts_gapfill",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hr, event_type,
             COUNT(*) AS n_raw,
             {o_dsum('value', 'sum_value')}
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM bounds
    ),
    grid AS (
      SELECT s.hr, t.event_type
      FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    )
    SELECT g.event_type, g.hr,
           CAST(COALESCE(h.n_raw, 0) AS BIGINT) AS n_events,
           last_value(h.sum_value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_sum
    FROM grid g LEFT JOIN hourly h
      ON h.hr = g.hr AND h.event_type = g.event_type
    """,
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense hourly spine per event type
    (every hour between the corpus min and max exists as a row), zero
    counts for silent hours, and forward-filled hourly sums
    (last-observation-carried-forward) — the resample/ffill operator
    dashboards and feature pipelines need, without which downstream
    window math silently skips missing buckets.

    Scale: the fact table aggregates FIRST (one shuffle to hourly
    granularity); the spine is generated from the 1-row bounds aggregate
    (sequence + explode — rows = hours × types, independent of event
    count) and the spine join runs at bucket granularity, never against
    raw events.  The forward-fill window is partitioned per event type —
    a per-key bounded-domain sort, never a global one.
    """
    e = t(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hr"),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("n_raw"), dsum("value", "sum_value"))
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hr")
    )
    grid = spine.crossJoin(e.select("event_type").distinct())
    joined = grid.join(hourly, ["hr", "event_type"], "left")
    return joined.select(
        "event_type",
        "hr",
        F.coalesce(F.col("n_raw"), F.lit(0)).cast("long").alias("n_events"),
        F.last("sum_value", ignorenulls=True).over(
            Window.partitionBy("event_type")
            .orderBy("hr")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("filled_sum"),
    )


@query(
    "q_events_wau",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds
    ),
    dau AS (
      SELECT day, COUNT(DISTINCT user_id) AS dau FROM daily GROUP BY day
    ),
    contrib AS (
      SELECT daily.day + CAST(o.off AS INTEGER) AS day, daily.user_id
      FROM daily CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o
    ),
    wau AS (
      SELECT day, COUNT(DISTINCT user_id) AS wau FROM contrib GROUP BY day
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(d.dau, 0) AS BIGINT) AS dau,
           CAST(COALESCE(w.wau, 0) AS BIGINT) AS wau
    FROM spine s
    LEFT JOIN dau d ON d.day = s.day
    LEFT JOIN wau w ON w.day = s.day
    """,
)
def q_events_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement metrics: DAU and trailing-7-day WAU per
    calendar day (dense day spine, silent days = 0) — the product-
    analytics headline series.

    The trailing-distinct is NOT a window function (count distinct over
    a sliding frame isn't supported, and a per-day 7-way self-join of
    raw events would be quadratic-ish): each (day, user) pair explodes
    into the 7 future days it keeps the user "weekly-active" for —
    map-side, ×7 amplification of the ALREADY-DISTINCT daily pairs, not
    raw events — then one distinct-count per day.  Cost at scale:
    O(active-user-days × 7) through one shuffle; day outputs are
    projected as ISO strings (DATE bridges differ across engines).
    """
    e = t(spark, sf_dir, "events")
    daily = e.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    ).distinct()
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    dau = daily.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    contrib = daily.select(
        F.explode(F.expr("sequence(0, 6)")).alias("off"), "day", "user_id"
    ).select(F.expr("date_add(day, off)").alias("day"), "user_id")
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        spine.join(dau, "day", "left")
        .join(wau, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            F.coalesce("wau", F.lit(0)).cast("long").alias("wau"),
        )
    )


@query(
    "q_events_spikes",
    oracle="""
    WITH hourly AS (
      SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hr,
             COUNT(*) AS n_events
      FROM events GROUP BY event_type, hr
    ),
    trailed AS (
      SELECT event_type, hr, n_events,
             CAST(COALESCE(SUM(n_events) OVER w, 0) AS BIGINT) AS trailing_sum,
             CAST(COUNT(n_events) OVER w AS BIGINT) AS trailing_n
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hr, n_events, trailing_sum, trailing_n,
           (trailing_n >= 3 AND n_events * trailing_n > 2 * trailing_sum)
             AS is_spike
    FROM trailed
    """,
)
def q_events_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-spike detection on event streams: flag hours where a type's
    count exceeds 2× its trailing-7-hour mean (with a 3-hour warmup) —
    the alerting query behind ops dashboards, and the batch twin of a
    streaming anomaly monitor.

    The comparison is cross-multiplied into pure integers
    (count·n > 2·sum ⟺ count > 2·mean) so no float division exists
    anywhere — exact in both engines.  Shape: one (type, hour) hash agg,
    then a window over the tiny hourly relation partitioned by type;
    nothing rescans the raw events.
    """
    e = t(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH").alias(
                "hr"
            ),
        ).agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-7, -1)
    )
    trailed = hourly.select(
        "event_type",
        "hr",
        "n_events",
        F.coalesce(F.sum("n_events").over(w), F.lit(0)).cast("long").alias(
            "trailing_sum"
        ),
        F.count("n_events").over(w).cast("long").alias("trailing_n"),
    )
    return trailed.withColumn(
        "is_spike",
        (F.col("trailing_n") >= 3)
        & (F.col("n_events") * F.col("trailing_n") > 2 * F.col("trailing_sum")),
    )


@query(
    "q_events_attribution",
    oracle="""
    WITH marked AS (
      SELECT event_id, user_id, ts, event_type,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_touch_id,
             FIRST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS first_touch_id
      FROM events
    )
    SELECT event_id AS purchase_id, user_id, first_touch_id, last_touch_id
    FROM marked
    WHERE event_type = 'purchase'
    ORDER BY purchase_id
    """,
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution: every purchase is linked to
    the user's first and most recent preceding click — the join-free
    formulation of the conversion-attribution query.

    One window pass per user timeline (shuffle on user_id only);
    FIRST/LAST_VALUE ... IGNORE NULLS over the up-to-previous-row frame
    picks the touch events without ever materializing a purchases×clicks
    join — the naive formulation is quadratic per user, this is linear.
    NULL first/last_touch = purchase with no preceding click (organic).
    """
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    marked = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.last(click_id, ignorenulls=True).over(w).alias("last_touch_id"),
        F.first(click_id, ignorenulls=True).over(w).alias("first_touch_id"),
    )
    return (
        marked.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "first_touch_id",
            "last_touch_id",
        )
        .orderBy("purchase_id")
    )


@query(
    "q_events_markov",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type AS src, event_type AS dst, COUNT(*) AS n
      FROM ordered WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    outdeg AS (SELECT src, CAST(SUM(n) AS BIGINT) AS out_n FROM trans GROUP BY src)
    SELECT t.src, t.dst, t.n, o.out_n,
           round(CAST(t.n AS DOUBLE) / CAST(o.out_n AS DOUBLE), 6) AS p
    FROM trans t JOIN outdeg o ON o.src = t.src
    ORDER BY t.src, t.dst
    """,
)
def q_events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-normalized event-type transition matrix — the first-order
    Markov model of user behavior (the input PageRank's edge weights and
    next-action prediction both start from).

    One lag-window pass per user timeline, a count aggregation on the
    tiny (src, dst) domain, and an exact-division normalization against
    the out-degree — the same heavy/light split as the PageRank edge
    build: the only corpus-sized work is the user_id window shuffle.
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    outdeg = trans.groupBy(F.col("src").alias("o_src")).agg(
        F.sum("n").alias("out_n")
    )
    return (
        trans.join(F.broadcast(outdeg), F.col("o_src") == F.col("src"))
        .select(
            "src",
            "dst",
            "n",
            "out_n",
            F.round(F.col("n").cast("double") / F.col("out_n").cast("double"), 6).alias(
                "p"
            ),
        )
        .orderBy("src", "dst")
    )


@query(
    "q_events_zscore",
    oracle="""
    WITH q AS (
      SELECT event_id, event_type, value,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq,
             ts
      FROM events
    ),
    framed AS (
      SELECT event_id, event_type, value, xq,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(xq) OVER w AS BIGINT) AS sx,
             CAST(SUM(xq * xq) OVER w AS BIGINT) AS sxx
      FROM q
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, event_type, value, n,
           round(CAST(n * xq - sx AS DOUBLE)
                 / sqrt(CAST(n AS DOUBLE)
                        * CAST(n * sxx - sx * sx AS DOUBLE)
                        / (CAST(n AS DOUBLE) - 1.0)), 6) AS z
    FROM framed
    WHERE n >= 30
      AND n * sxx - sx * sx > 0
      AND (n * xq - sx) * (n * xq - sx) * (n - 1) > 9 * n * (n * sxx - sx * sx)
    ORDER BY event_id
    """,
)
def q_events_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event's value against the
    mean/std of its type's trailing 100 events — the streaming-shaped
    outlier monitor next to the global MAD (q_anomaly_mad) and the rate
    spike detector (q_events_spikes).

    The trailing moments (n, Σx, Σx²) are EXACT INTEGERS on the 2-decimal
    quantization, and the |z| > 3 trigger is evaluated as the
    cross-multiplied integer inequality (n·x − Σx)²·(n−1) > 9·n·(n·Σx² −
    Σx²) — no float accumulates anywhere, so the flagged set is
    bit-identical cross-engine (the reported z is one double expression
    on identical integer operands).  One window shuffle on event_type.
    """
    e = t(spark, sf_dir, "events")
    q = e.select(
        "event_id",
        "event_type",
        "value",
        "ts",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-100, -1)
    )
    framed = q.select(
        "event_id",
        "event_type",
        "value",
        "xq",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("xq").over(w).alias("sx"),
        F.sum(F.col("xq") * F.col("xq")).over(w).alias("sxx"),
    )
    n, sx, sxx, xq = F.col("n"), F.col("sx"), F.col("sxx"), F.col("xq")
    var_num = n * sxx - sx * sx
    dev = n * xq - sx
    z = F.round(
        dev.cast("double")
        / F.sqrt(n.cast("double") * var_num.cast("double") / (n.cast("double") - 1.0)),
        6,
    )
    return (
        framed.filter(
            (n >= 30) & (var_num > 0) & (dev * dev * (n - 1) > 9 * n * var_num)
        )
        .select("event_id", "event_type", "value", "n", z.alias("z"))
        .orderBy("event_id")
    )


@query(
    "q_events_forecast_sma",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY event_type, h
    ),
    framed AS (
      SELECT event_type, h, n,
             CAST(SUM(n) OVER w AS BIGINT) AS s24,
             CAST(COUNT(*) OVER w AS BIGINT) AS k24
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT event_type, n, s24, k24,
             CAST(floor(abs(CAST(n AS DOUBLE)
                            - CAST(s24 AS DOUBLE) / CAST(k24 AS DOUBLE))
                        * 1e6 + 0.5) AS BIGINT) AS abs_err_c
      FROM framed WHERE k24 >= 12
    )
    SELECT event_type,
           COUNT(*) AS n_hours,
           CAST(SUM(abs_err_c) AS DOUBLE) / 1e6 / CAST(COUNT(*) AS DOUBLE) AS mae
    FROM scored
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_events_forecast_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average forecast backtest: predict each hour's event count
    from the trailing 24 OBSERVED hours (sparse SMA — missing hours skip
    the frame) and report per-type MAE — the baseline every fancier
    forecaster must beat, evaluated walk-forward with no leakage (frame
    ends at 1 PRECEDING).

    The hourly rollup shrinks the stream to a (type, hour) relation
    first, so the backtest windows run over ~10^4 rows regardless of
    event volume; each |error| term is carrier-quantized before the MAE
    sum (forecast is a division of exact integers → identical in both
    engines).
    """
    e = t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    framed = hourly.select(
        "event_type",
        "n",
        F.sum("n").over(w).alias("s24"),
        F.count(F.lit(1)).over(w).alias("k24"),
    )
    abs_err_c = F.floor(
        F.abs(
            F.col("n").cast("double")
            - F.col("s24").cast("double") / F.col("k24").cast("double")
        )
        * 1e6
        + 0.5
    ).cast("long")
    return (
        framed.filter(F.col("k24") >= 12)
        .select("event_type", abs_err_c.alias("abs_err_c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            (F.sum("abs_err_c").cast("double") / 1e6 / F.count(F.lit(1)).cast("double")).alias(
                "mae"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "q_stats_autocorr",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, h
    ),
    lagged AS (
      SELECT event_type, n,
             LAG(n) OVER (PARTITION BY event_type ORDER BY h) AS prev_n
      FROM hourly
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS sx,
             CAST(SUM(prev_n) AS BIGINT) AS sy,
             CAST(SUM(n * prev_n) AS BIGINT) AS sxy,
             CAST(SUM(n * n) AS BIGINT) AS sxx,
             CAST(SUM(prev_n * prev_n) AS BIGINT) AS syy
      FROM lagged WHERE prev_n IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, k,
           round((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(k AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
             AS lag1_autocorr
    FROM m
    ORDER BY event_type
    """,
)
def q_stats_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of hourly event counts per type — the
    seasonality/burstiness detector (high autocorrelation = smooth
    diurnal load; near zero = memoryless arrivals), the statistic that
    decides whether q_events_forecast_sma's moving average is even
    applicable.

    The moments are EXACT integers (hourly counts and their lagged
    products), so the Pearson formula evaluates identical operands in
    both engines — the q_agg_corr discipline applied to a lagged series;
    one window pass over the tiny (type, hour) rollup.
    """
    e = t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type", "n", F.lag("n").over(w).alias("prev_n")
    ).filter(F.col("prev_n").isNotNull())
    m = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("sx"),
        F.sum("prev_n").alias("sy"),
        F.sum(F.col("n") * F.col("prev_n")).alias("sxy"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
        F.sum(F.col("prev_n") * F.col("prev_n")).alias("syy"),
    )
    kd = F.col("k").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    return m.select(
        "event_type",
        "k",
        F.round(
            (kd * sxy - sx * sy)
            / (F.sqrt(kd * sxx - sx * sx) * F.sqrt(kd * syy - sy * sy)),
            9,
        ).alias("lag1_autocorr"),
    ).orderBy("event_type")


@query(
    "q_events_lifecycle",
    oracle="""
    WITH weeks AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) // 7 AS week_n
      FROM events
    ),
    maxw AS (SELECT MAX(week_n) AS max_week FROM weeks),
    lagged AS (
      SELECT user_id, week_n,
             LAG(week_n)  OVER (PARTITION BY user_id ORDER BY week_n) AS prev_w,
             LEAD(week_n) OVER (PARTITION BY user_id ORDER BY week_n) AS next_w
      FROM weeks
    ),
    classed AS (
      SELECT week_n,
             CASE WHEN prev_w IS NULL THEN 'new'
                  WHEN prev_w = week_n - 1 THEN 'retained'
                  ELSE 'resurrected' END AS status,
             CASE WHEN week_n < m.max_week
                   AND (next_w IS NULL OR next_w > week_n + 1)
                  THEN 1 ELSE 0 END AS churned_next
      FROM lagged, maxw m
    )
    SELECT CAST(week_n AS BIGINT) AS week_n,
           CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
           CAST(SUM(churned_next) AS BIGINT) AS n_churning_after
    FROM classed
    GROUP BY week_n
    ORDER BY week_n
    """,
)
def q_events_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: every active (user, week) is classified as
    new / retained / resurrected by the gap to the previous active week,
    plus the count of users who go silent after each week — the
    new+retained+resurrected−churned ledger every growth dashboard runs.

    One distinct pass to (user, week), one lag/lead window per user
    timeline, a tiny per-week rollup — integer week arithmetic
    throughout (no date-type bridging).  The final-week edge is handled
    explicitly: nobody "churns after" the last observed week, since
    there is no following week to be absent from.
    """
    e = t(spark, sf_dir, "events")
    weeks = (
        e.select(
            "user_id",
            F.floor(
                F.datediff(
                    F.col("ts").cast("date"), F.lit("1995-01-01").cast("date")
                )
                / 7
            )
            .cast("long")
            .alias("week_n"),
        )
        .distinct()
        # consumed by both the max-week scalar and the lag/lead pass —
        # checkpoint so the distinct doesn't replay per consumer
        .localCheckpoint(eager=False)
    )
    maxw = weeks.agg(F.max("week_n").alias("max_week"))
    w = Window.partitionBy("user_id").orderBy("week_n")
    lagged = weeks.select(
        "user_id",
        "week_n",
        F.lag("week_n").over(w).alias("prev_w"),
        F.lead("week_n").over(w).alias("next_w"),
    )
    status = (
        F.when(F.col("prev_w").isNull(), "new")
        .when(F.col("prev_w") == F.col("week_n") - 1, "retained")
        .otherwise("resurrected")
    )
    churned_next = F.when(
        (F.col("week_n") < F.col("max_week"))
        & (F.col("next_w").isNull() | (F.col("next_w") > F.col("week_n") + 1)),
        1,
    ).otherwise(0)
    return (
        lagged.join(F.broadcast(maxw))
        .select("week_n", status.alias("status"), churned_next.alias("churned_next"))
        .groupBy("week_n")
        .agg(
            F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).alias("n_new"),
            F.sum(F.when(F.col("status") == "retained", 1).otherwise(0)).alias(
                "n_retained"
            ),
            F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0)).alias(
                "n_resurrected"
            ),
            F.sum("churned_next").alias("n_churning_after"),
        )
        .orderBy("week_n")
    )


@query(
    "q_events_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type)    OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    )
    SELECT path, n, rk FROM (
      SELECT path, COUNT(*) AS n,
             CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS BIGINT) AS rk
      FROM paths GROUP BY path
    ) WHERE rk <= 15
    """,
)
def q_events_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k 3-step behavior paths (sequence mining): every consecutive
    event triple per user timeline, counted corpus-wide — the
    "what do users do next" sankey feeding funnel design.

    One lead-window pass per user (shuffle on user_id), then a hash
    aggregation on the tiny path-string domain (≤|types|³) and a
    deterministic top-15 — no self-joins, no explosion beyond one row
    per event.  Longer paths are the same plan with more LEAD columns.
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    paths = seq.select(
        F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy(F.col("n").desc(), F.col("path"))
    return counted.withColumn("rk", F.row_number().over(wr).cast("long")).filter(
        F.col("rk") <= 15
    )


@query(
    "q_events_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS cw
      FROM events GROUP BY user_id
    ),
    wk AS (
      SELECT f.cw,
             CAST(CAST(date_diff('day', f.cw, date_trunc('week', e.ts))
                       / 7 AS BIGINT) AS INT) AS age_weeks,
             CAST(floor(e.value * 1e6 + 0.5) AS BIGINT) AS vc
      FROM events e JOIN firsts f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
    ),
    g AS (
      SELECT cw, age_weeks,
             CAST(SUM(vc) AS BIGINT) AS sc,
             COUNT(*) AS n_purchases
      FROM wk GROUP BY cw, age_weeks
    )
    SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, age_weeks, n_purchases,
           CAST(sc AS DOUBLE) / 1e6 AS weekly_rev,
           CAST(CAST(SUM(sc) OVER (PARTITION BY cw ORDER BY age_weeks
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS DOUBLE) / 1e6 AS cum_rev
    FROM g
    ORDER BY cohort_week, age_weeks
    """,
)
def q_events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: purchase revenue per signup-week
    cohort by cohort age, with the cumulative LTV running sum — the
    metric behind "does week-N revenue pay back acquisition".

    The cumulative sum runs over the CARRIER LONGS and divides once at
    the end: a running sum of doubles would re-introduce the
    order-dependence the carrier exists to kill.  Scale shape mirrors
    q_events_retention — per-user firsts then a key join; the window
    partitions by cohort over O(weeks) rows per cohort, never raw
    events."""
    e = t(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    firsts = e.groupBy("user_id").agg(F.min(week).alias("cw"))
    wk = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cw",
            (F.datediff(week, F.col("cw")) / 7).cast("bigint").cast("int").alias(
                "age_weeks"
            ),
            F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("vc"),
        )
    )
    g = wk.groupBy("cw", "age_weeks").agg(
        F.sum("vc").alias("sc"), F.count(F.lit(1)).alias("n_purchases")
    )
    w = (
        Window.partitionBy("cw")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.select(
        F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
        "age_weeks",
        "n_purchases",
        (F.col("sc").cast("double") / F.lit(1e6)).alias("weekly_rev"),
        (F.sum("sc").over(w).cast("double") / F.lit(1e6)).alias("cum_rev"),
    ).orderBy("cohort_week", "age_weeks")


@query(
    "q_ts_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
               AS vc
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS hmin,
             date_trunc('hour', MAX(ts)) AS hmax
      FROM events
    ),
    spine AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS h
        FROM bounds
      ) g
    ),
    j AS (
      SELECT s.event_type, s.h,
             epoch_us(s.h) / 3600000000 AS hi,
             hourly.vc
      FROM spine s LEFT JOIN hourly
        ON hourly.event_type = s.event_type AND hourly.h = s.h
    ),
    nav AS (
      SELECT event_type, h, hi, vc,
             LAST_VALUE(vc IGNORE NULLS) OVER wp AS pv,
             LAST_VALUE(CASE WHEN vc IS NOT NULL THEN hi END IGNORE NULLS)
               OVER wp AS ph,
             FIRST_VALUE(vc IGNORE NULLS) OVER wn AS nv,
             FIRST_VALUE(CASE WHEN vc IS NOT NULL THEN hi END IGNORE NULLS)
               OVER wn AS nh
      FROM j
      WINDOW wp AS (PARTITION BY event_type ORDER BY hi
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY event_type ORDER BY hi
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, strftime(h, '%Y-%m-%d %H') AS hour,
           CASE WHEN vc IS NOT NULL THEN 1 ELSE 0 END AS is_observed,
           round(CASE
             WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
             WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
             WHEN nh = ph THEN CAST(pv AS DOUBLE)
             ELSE CAST(pv AS DOUBLE)
                  + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                    * (CAST(hi - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
           END / 1e6, 6) AS value_interp
    FROM nav
    ORDER BY event_type, hour
    """,
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill: dense hourly spine per event type,
    silent hours filled by interpolating between the surrounding
    observations (the resample().interpolate() operator; the LOCF sibling
    is q_ts_gapfill).  Edge hours before the first / after the last
    observation clamp to the nearest one.

    The interpolation arithmetic runs on carrier LONGS (observed hourly
    sums) and integer hour indices; the single divide-by-1e6 happens at
    the end, so the lerp is mirrored IEEE math on identical operands.
    Scale shape: aggregate to hourly FIRST (one fact shuffle), spine =
    hours × types rows generated from a 1-row bounds aggregate, and two
    navigation windows per type over the tiny hourly relation."""
    e = t(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = e.groupBy("event_type", hour.alias("h")).agg(
        F.sum(F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long"))
        .alias("vc")
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("hmin"),
        F.date_trunc("hour", F.max("ts")).alias("hmax"),
    )
    types = e.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("hmin", "hmax", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    j = spine.join(
        hourly.withColumnRenamed("event_type", "ht").withColumnRenamed("h", "hh"),
        (F.col("ht") == F.col("event_type")) & (F.col("hh") == F.col("h")),
        "left",
    ).select(
        "event_type",
        "h",
        (F.unix_micros("h") / F.lit(3_600_000_000)).cast("long").alias("hi"),
        "vc",
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hi")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hi")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nav = j.select(
        "event_type",
        "h",
        "hi",
        "vc",
        F.last("vc", ignorenulls=True).over(wp).alias("pv"),
        F.last(
            F.when(F.col("vc").isNotNull(), F.col("hi")), ignorenulls=True
        ).over(wp).alias("ph"),
        F.first("vc", ignorenulls=True).over(wn).alias("nv"),
        F.first(
            F.when(F.col("vc").isNotNull(), F.col("hi")), ignorenulls=True
        ).over(wn).alias("nh"),
    )
    interp = (
        F.when(F.col("pv").isNull(), F.col("nv").cast("double"))
        .when(F.col("nv").isNull(), F.col("pv").cast("double"))
        .when(F.col("nh") == F.col("ph"), F.col("pv").cast("double"))
        .otherwise(
            F.col("pv").cast("double")
            + (F.col("nv").cast("double") - F.col("pv").cast("double"))
            * (
                (F.col("hi") - F.col("ph")).cast("double")
                / (F.col("nh") - F.col("ph")).cast("double")
            )
        )
    )
    return nav.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH").alias("hour"),
        F.when(F.col("vc").isNotNull(), 1).otherwise(0).alias("is_observed"),
        F.round(interp / F.lit(1e6), 6).alias("value_interp"),
    ).orderBy("event_type", "hour")


@query(
    "q_events_seasonal",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    profile AS (
      SELECT event_type,
             isodow(h) AS dow, CAST(hour(h) AS INT) AS hod,
             CAST(SUM(n) AS BIGINT) AS tot, COUNT(*) AS n_slots
      FROM hourly GROUP BY event_type, isodow(h), CAST(hour(h) AS INT)
    )
    SELECT hy.event_type, strftime(hy.h, '%Y-%m-%d %H') AS hour,
           CAST(hy.n AS BIGINT) AS n,
           p.tot AS season_total, p.n_slots,
           CASE WHEN hy.n * p.n_slots > 3 * p.tot THEN 1 ELSE 0 END
             AS is_spike
    FROM hourly hy
    JOIN profile p
      ON p.event_type = hy.event_type
     AND p.dow = isodow(hy.h) AND p.hod = CAST(hour(hy.h) AS INT)
    WHERE hy.n * p.n_slots > 3 * p.tot
    ORDER BY hy.event_type, hour
    """,
)
def q_events_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection: each (type, hour) bucket is
    compared against ITS OWN weekly seasonal slot (day-of-week ×
    hour-of-day mean) instead of a trailing window — the q_events_spikes
    sibling that doesn't false-positive on every Monday morning.  The
    spike predicate is the integer cross-multiplication
    n · slots > 3 · total (no float mean anywhere).

    Two aggregations of the same hourly rollup (one fact shuffle, the
    168-slot profile is broadcast back); at 100 TB the profile is a tiny
    persisted table refreshed daily."""
    e = t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    hourly = hourly.localCheckpoint(eager=False)
    dow = F.weekday(F.col("h")) + F.lit(1)
    hod = F.hour(F.col("h"))
    profile = hourly.groupBy(
        F.col("event_type").alias("pt"),
        dow.alias("dow"),
        hod.alias("hod"),
    ).agg(F.sum("n").alias("tot"), F.count(F.lit(1)).alias("n_slots"))
    joined = hourly.join(
        F.broadcast(profile),
        (F.col("pt") == F.col("event_type"))
        & (F.col("dow") == F.weekday(F.col("h")) + F.lit(1))
        & (F.col("hod") == F.hour(F.col("h"))),
    )
    return (
        joined.filter(
            F.col("n") * F.col("n_slots") > F.lit(3) * F.col("tot")
        )
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH").alias("hour"),
            "n",
            F.col("tot").alias("season_total"),
            "n_slots",
            F.lit(1).alias("is_spike"),
        )
        .orderBy("event_type", "hour")
    )


@query(
    "q_orders_yoy",
    oracle="""
    WITH monthly AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))
                  AS BIGINT) AS revc,
             COUNT(*) AS n_orders
      FROM orders GROUP BY date_trunc('month', o_orderdate)
    )
    SELECT month,
           CAST(revc AS DOUBLE) / 1e6 AS revenue,
           n_orders,
           round(CASE WHEN lag(revc, 12) OVER (ORDER BY month) IS NULL
                      THEN NULL
                      ELSE CAST(revc AS DOUBLE)
                           / CAST(lag(revc, 12) OVER (ORDER BY month)
                                  AS DOUBLE) - 1.0 END, 6) AS yoy_growth
    FROM monthly
    ORDER BY month
    """,
)
def q_orders_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth per month: monthly carrier-exact revenue with
    a lag-12 window ratio — the core reporting comparison.  The lag runs
    over the O(months) aggregated series (single-partition window over
    dozens of rows, scale-independent); the ratio divides the two carrier
    longs as doubles, mirrored."""
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        )
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(1e6) + F.lit(0.5)).cast("long")
        ).alias("revc"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month")
    prev = F.lag("revc", 12).over(w)
    return monthly.select(
        "month",
        (F.col("revc").cast("double") / F.lit(1e6)).alias("revenue"),
        "n_orders",
        F.round(
            F.when(prev.isNull(), F.lit(None)).otherwise(
                F.col("revc").cast("double") / prev.cast("double") - F.lit(1.0)
            ),
            6,
        ).alias("yoy_growth"),
    ).orderBy("month")


@query(
    "q_events_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT user_id,
             CAST(least((epoch_us(first_purchase) - epoch_us(first_view))
                        // 3600000000, 48) AS BIGINT) AS hours_bucket
      FROM firsts
      WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase > first_view
    )
    SELECT hours_bucket, COUNT(*) AS n_users
    FROM conv GROUP BY hours_bucket
    ORDER BY hours_bucket
    """,
)
def q_events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: hours between a user's first view
    and first purchase (purchase strictly after view), histogrammed with
    a 48 h overflow bucket — the latency curve behind attribution-window
    and retargeting decisions.  One conditional-MIN aggregation per user
    (no self-join of the events table against itself), then integer
    µs floor-division bucketing; O(users) intermediate, two shuffles."""
    e = t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    conv = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_view"))
    ).select(
        F.least(
            F.floor(
                (
                    F.unix_micros("first_purchase")
                    - F.unix_micros("first_view")
                )
                / F.lit(3_600_000_000)
            ),
            F.lit(48),
        )
        .cast("long")
        .alias("hours_bucket")
    )
    return (
        conv.groupBy("hours_bucket")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("hours_bucket")
    )


@query(
    "q_events_bots",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             COUNT(DISTINCT date_trunc('minute', ts)) AS active_minutes,
             COUNT(DISTINCT event_type) AS n_types
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(active_minutes AS BIGINT) AS active_minutes,
           CAST(n_types AS BIGINT) AS n_types,
           CASE WHEN n_events > 3 * active_minutes THEN 1 ELSE 0 END
             AS is_bot
    FROM per_user
    WHERE n_events > 3 * active_minutes
    ORDER BY user_id
    """,
)
def q_events_bots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation detection by sustained superhuman rate: users whose
    event count exceeds 3× their distinct active minutes (i.e. >3
    events/minute averaged over every minute they were active) — the
    traffic-cleaning gate run before any engagement metric or
    training-data extraction, since one scraper can outweigh a thousand
    humans.

    The rate test is an integer cross-multiplication (no float), and
    distinct-minute counting happens inside one grouped aggregation on
    user_id.  At 100 TB this is one fact shuffle; the flagged-user set
    then broadcast-anti-joins the corpus to drop bot traffic."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.date_trunc("minute", "ts")).alias("active_minutes"),
        F.countDistinct("event_type").alias("n_types"),
    )
    return (
        per_user.filter(F.col("n_events") > 3 * F.col("active_minutes"))
        .select(
            "user_id",
            "n_events",
            "active_minutes",
            "n_types",
            F.lit(1).alias("is_bot"),
        )
        .orderBy("user_id")
    )


@query(
    "q_events_ab_test",
    oracle="""
    WITH assigned AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
             CASE WHEN MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                       IS NOT NULL
                   AND epoch_us(MIN(CASE WHEN event_type = 'purchase'
                                         THEN ts END))
                       - epoch_us(MIN(ts)) <= 86400000000
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    per AS (
      SELECT variant, COUNT(*) AS n,
             CAST(SUM(converted) AS BIGINT) AS conv
      FROM assigned GROUP BY variant
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 0 THEN n END) AS n0,
        MAX(CASE WHEN variant = 0 THEN conv END) AS c0,
        MAX(CASE WHEN variant = 1 THEN n END) AS n1,
        MAX(CASE WHEN variant = 1 THEN conv END) AS c1
      FROM per
    )
    SELECT n0, c0, n1, c1,
           round(CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS rate0,
           round(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS rate1,
           round((CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                  - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                 / nullif(sqrt((CAST(c0 + c1 AS DOUBLE)
                                / CAST(n0 + n1 AS DOUBLE))
                        * (1.0 - CAST(c0 + c1 AS DOUBLE)
                                 / CAST(n0 + n1 AS DOUBLE))
                        * (1.0 / CAST(n0 AS DOUBLE)
                           + 1.0 / CAST(n1 AS DOUBLE))), 0.0), 6) AS z_stat
    FROM wide
    """,
)
def q_events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment: users hash-split
    into variants (user_id parity — the deterministic assignment a real
    experiment platform uses), per-variant conversion (first purchase
    within 24 h of first activity — an activation metric that doesn't
    saturate on heavy fixtures the way "ever purchased" does),
    and the pooled z statistic — the significance readout behind every
    ship/no-ship decision.

    Counts are exact integers from one per-user aggregation + one
    4-number rollup; the z formula is mirrored IEEE arithmetic over
    those integers, pinned at 1e-6.  At 100 TB the per-user conversion
    flag is the only fact-scale aggregation; everything after is a
    1-row computation."""
    e = t(spark, sf_dir, "events")
    first_p = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    assigned = e.groupBy("user_id").agg(
        F.when(
            first_p.isNotNull()
            & (
                F.unix_micros(first_p) - F.unix_micros(F.min("ts"))
                <= 86_400_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("int").alias("variant"), "converted"
    )
    per = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = per.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    n0d, c0d = F.col("n0").cast("double"), F.col("c0").cast("double")
    n1d, c1d = F.col("n1").cast("double"), F.col("c1").cast("double")
    pooled = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    z = (c0d / n0d - c1d / n1d) / F.nullif(
        F.sqrt(
            pooled
            * (F.lit(1.0) - pooled)
            * (F.lit(1.0) / n0d + F.lit(1.0) / n1d)
        ),
        F.lit(0.0),
    )
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(c0d / n0d, 6).alias("rate0"),
        F.round(c1d / n1d, 6).alias("rate1"),
        F.round(z, 6).alias("z_stat"),
    )


@query(
    "q_events_replays",
    oracle="""
    SELECT a.user_id, a.event_id AS first_id, b.event_id AS replay_id,
           a.event_type,
           CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS gap_us
    FROM events a JOIN events b
      ON b.user_id = a.user_id
     AND b.event_type = a.event_type
     AND b.value = a.value
     AND b.event_id > a.event_id
     AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 600000000
    ORDER BY a.user_id, first_id, replay_id
    """,
)
def q_events_replays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once replay detection: pairs of events with the same
    (user, type, value) within 10 minutes but different ids — the
    delivery-duplicate signature every event pipeline checks for before
    metrics double-count (the streaming twin is
    dropDuplicatesWithinWatermark; this is the batch audit of what it
    would have dropped).

    The self-join keys on (user, type, value) — high-cardinality
    composite, so the shuffle is balanced and candidate pairs per key
    are tiny; the time predicate is a residual integer comparison.
    Never a time-only join (every same-window pair) nor an id cross
    product."""
    e = t(spark, sf_dir, "events")
    a = e.select(
        "user_id",
        F.col("event_id").alias("first_id"),
        "event_type",
        "value",
        F.col("ts").alias("ts_a"),
    )
    b = e.select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("replay_id"),
        F.col("event_type").alias("t2"),
        F.col("value").alias("v2"),
        F.col("ts").alias("ts_b"),
    )
    gap = F.unix_micros("ts_b") - F.unix_micros("ts_a")
    return (
        a.join(
            b,
            (F.col("u2") == F.col("user_id"))
            & (F.col("t2") == F.col("event_type"))
            & (F.col("v2") == F.col("value"))
            & (F.col("replay_id") > F.col("first_id")),
        )
        .filter((gap >= 0) & (gap <= 600_000_000))
        .select(
            "user_id", "first_id", "replay_id", "event_type", gap.alias("gap_us")
        )
        .orderBy("user_id", "first_id", "replay_id")
    )


# ---------------------------------------------------------------------------
# Round 5: inter-arrival cadence + DAU/MAU stickiness
# ---------------------------------------------------------------------------


@query(
    "q_events_interarrival",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id)
               AS gap_us
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_gaps,
           round(CAST(SUM(CAST(gap_us AS BIGINT)) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1e6, 6) AS avg_gap_sec,
           round(CAST(MIN(gap_us) AS DOUBLE) / 1e6, 6) AS min_gap_sec,
           round(CAST(MAX(gap_us) AS DOUBLE) / 1e6, 6) AS max_gap_sec
    FROM gaps
    WHERE gap_us IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival cadence, grouped by the type of the event
    that ENDS each gap — the behavioral-rhythm profile (bots arrive on
    a metronome, humans in bursts) that complements q_events_bots'
    explicit detector with distribution-level statistics.

    One window shuffle on user_id for the lag, one tiny grouped rollup.
    Gaps are EXACT microsecond integers (epoch_us difference), so sum /
    min / max are associative-exact and the only double ops are the
    final mirrored divisions."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(
                F.sum("gap_us").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1e6),
                6,
            ).alias("avg_gap_sec"),
            F.round(F.min("gap_us").cast("double") / F.lit(1e6), 6).alias(
                "min_gap_sec"
            ),
            F.round(F.max("gap_us").cast("double") / F.lit(1e6), 6).alias(
                "max_gap_sec"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "q_events_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             strftime(date_trunc('month', CAST(ts AS DATE)), '%Y-%m') AS mon
      FROM events
    ),
    dau AS (SELECT day, ANY_VALUE(mon) AS mon, COUNT(*) AS dau
            FROM ud GROUP BY day),
    um AS (SELECT DISTINCT user_id, mon FROM ud),
    mau AS (SELECT mon, COUNT(*) AS mau FROM um GROUP BY mon)
    SELECT d.day, d.dau, m.mau,
           round(CAST(d.dau AS DOUBLE) / CAST(m.mau AS DOUBLE), 6)
             AS stickiness
    FROM dau d JOIN mau m ON m.mon = d.mon
    ORDER BY d.day
    """,
)
def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day (calendar-month MAU) — the engagement
    ratio product teams track beside q_events_wau's rolling actives:
    what share of the month's user base shows up on a given day.

    Shape: one (user, day) dedup shuffle does ALL the distinct work —
    DAU is a count over it, the (user, month) relation is a projection
    of it (second tiny dedup), and the day↔month join broadcasts the
    dozen-row MAU side.  Days cross engines as yyyy-MM-dd STRINGS (the
    DATE-bridge gotcha)."""
    e = t(spark, sf_dir, "events")
    ud = e.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM").alias("mon"),
    ).distinct()
    dau = ud.groupBy("day").agg(
        F.any_value(F.col("mon")).alias("mon"), F.count(F.lit(1)).alias("dau")
    )
    mau = (
        ud.select("user_id", "mon")
        .distinct()
        .groupBy("mon")
        .agg(F.count(F.lit(1)).alias("mau"))
    )
    return (
        dau.join(F.broadcast(mau), "mon")
        .select(
            "day",
            "dau",
            "mau",
            F.round(
                F.col("dau").cast("double") / F.col("mau").cast("double"), 6
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


# Exact-binary EWMA weight table (alpha = 0.5): W[j] = 0.5^j is exactly
# representable, and prefix sums are exact halves — so every weighted
# term and normalizer is bit-identical in both engines.
_EWMA_W = [1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625, 0.0078125]
_EWMA_WSUM = [1.0, 1.5, 1.75, 1.875, 1.9375, 1.96875, 1.984375, 1.9921875]


@query(
    "q_events_ewma",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY event_type, h
    ),
    framed AS (
      SELECT event_type, h, n,
             list(n) OVER (PARTITION BY event_type ORDER BY h
                           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS win
      FROM hourly
    )
    SELECT event_type, strftime(h, '%Y-%m-%d %H') AS hr, CAST(n AS BIGINT) AS n,
           round(CAST(list_sum(list_transform(range(len(win)), i ->
                   CAST(floor(win[i + 1]
                              * ({_EWMA_W!r})[len(win) - i]
                              * 1e6 + 0.5) AS BIGINT))) AS DOUBLE)
                 / 1e6 / ({_EWMA_WSUM!r})[len(win)], 6) AS ewma
    FROM framed
    ORDER BY event_type, hr
    """,
)
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.5, trailing 8 observed
    hours) of hourly event counts — the recency-weighted smoother used
    beside q_events_forecast_sma's flat window when the series drifts
    (EWMA halves each older hour's influence instead of cliff-dropping
    at the frame edge).

    Spark has no EWMA aggregate; the custom-operator composition is
    collect_list over the ordered frame + a single indexed-lambda
    transform against a LITERAL weight table (α=0.5 ⇒ every weight and
    every normalizer prefix-sum is an exact binary double, so weighted
    terms floor onto the 1e6 carrier identically in both engines).
    One shuffle for the hourly rollup; the frame list is ≤ 8 longs.
    """
    e = t(spark, sf_dir, "events")
    hourly = (
        e.select(F.col("event_type"), F.date_trunc("hour", "ts").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-7, Window.currentRow)
    )
    warr = F.array(*[F.lit(x) for x in _EWMA_W])
    wsum = F.array(*[F.lit(x) for x in _EWMA_WSUM])
    framed = hourly.withColumn("win", F.collect_list("n").over(w))
    num = F.aggregate(
        F.transform(
            F.col("win"),
            lambda x, i: F.floor(
                x * F.element_at(warr, F.size("win") - i) * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return framed.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH").alias("hr"),
        F.col("n").cast("long").alias("n"),
        F.round(
            num.cast("double") / F.lit(1e6)
            / F.element_at(wsum, F.size("win")),
            6,
        ).alias("ewma"),
    ).orderBy("event_type", "hr")


@query(
    "q_stats_kaplan_meier",
    oracle="""
    WITH ue AS (
      SELECT user_id, MIN(epoch_us(ts)) AS f, MAX(epoch_us(ts)) AS l
      FROM events GROUP BY user_id
    ),
    obs AS (SELECT MAX(l) AS maxl FROM ue),
    durs AS (
      SELECT (l - f) // 86400000000 AS dur,
             CASE WHEN l < o.maxl - 7 * 86400000000 THEN 1 ELSE 0 END AS dead
      FROM ue CROSS JOIN obs o
    ),
    tot AS (SELECT COUNT(*) AS n FROM durs),
    g AS (SELECT dur, COUNT(*) AS c, SUM(dead) AS d FROM durs GROUP BY dur),
    r AS (
      SELECT dur, c, d,
             t.n - SUM(c) OVER (ORDER BY dur
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) + c AS n_risk
      FROM g CROSS JOIN tot t
    ),
    k AS (
      SELECT dur, n_risk, d,
             CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                        * 1e9 + 0.5) AS BIGINT) AS lc
      FROM r WHERE d > 0 AND d < n_risk
    )
    SELECT CAST(dur AS BIGINT) AS dur_days,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_deaths,
           round(CAST(SUM(lc) OVER (ORDER BY dur
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS DOUBLE) / 1e9, 6)
             AS log_survival
    FROM k ORDER BY dur_days
    """,
)
def q_stats_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of user activity lifetimes with right
    censoring — the retention curve done correctly: a user whose last
    event is within 7 days of the observation end hasn't churned, they
    are CENSORED, and ignoring that biases every naive retention metric
    downward.  Duration = whole days between a user's first and last
    event; death = churn (quiet for >7 days at cutoff).

    KM runs entirely on the per-duration life table (one user rollup,
    one duration rollup — both map-side combined; the table is O(max
    days), not O(users)): at-risk counts from a running sum, and the
    survival PRODUCT as a running SUM of per-step ln factors on a 1e9
    carrier, reported as log-survival (exp is the one op whose last-ulp
    behavior differs across libms, so the log form is the exact
    contract; callers exp() it for display).  Terminal rows where
    deaths = at-risk (factor 0) are excluded by definition.
    """
    e = t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    ue = e.groupBy("user_id").agg(
        F.min(us).alias("f"), F.max(us).alias("l")
    )
    obs = ue.agg(F.max("l").alias("maxl"))
    day = 86_400_000_000
    durs = ue.crossJoin(F.broadcast(obs)).select(
        F.expr(f"(l - f) div {day}").alias("dur"),
        F.when(F.col("l") < F.col("maxl") - 7 * day, 1).otherwise(0).alias(
            "dead"
        ),
    )
    tot = durs.agg(F.count(F.lit(1)).alias("n"))
    g = durs.groupBy("dur").agg(
        F.count(F.lit(1)).alias("c"), F.sum("dead").alias("d")
    )
    w = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    r = g.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk", F.col("n") - F.sum("c").over(w) + F.col("c")
    )
    k = r.filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk"))).select(
        "dur",
        "n_risk",
        "d",
        F.floor(
            F.log(
                F.lit(1.0)
                - F.col("d").cast("double") / F.col("n_risk").cast("double")
            )
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lc"),
    )
    return k.select(
        F.col("dur").cast("long").alias("dur_days"),
        F.col("n_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("n_deaths"),
        F.round(
            F.sum("lc").over(w).cast("double") / F.lit(1e9), 6
        ).alias("log_survival"),
    ).orderBy("dur_days")


@query(
    "q_events_ohlc",
    oracle="""
    WITH based AS (
      SELECT event_type, date_trunc('hour', ts) AS h, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn1,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn2
      FROM events
    )
    SELECT event_type, strftime(h, '%Y-%m-%d %H') AS hr,
           COUNT(*) AS n_events,
           MAX(CASE WHEN rn1 = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn2 = 1 THEN value END) AS close,
           CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1e6 AS volume
    FROM based
    GROUP BY event_type, h
    ORDER BY event_type, hr
    """,
)
def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC time-series downsampling: per (event_type, hour) open /
    high / low / close of the value stream plus the carrier-exact
    volume — the canonical lossy-but-shaped compaction that turns a raw
    event firehose into a chartable/retainable series (the
    hypertable-rollup pattern).

    Open and close are deterministic FIRST/LAST picks via dual
    row_numbers on the full (ts, event_id) order — not first_value(),
    whose frame-default semantics differ subtly across engines — folded
    into the same grouped aggregation, so the whole operator is one
    window pass + one hash aggregate on the (type, hour) key.
    """
    e = t(spark, sf_dir, "events")
    h = F.date_trunc("hour", "ts")
    w1 = Window.partitionBy("event_type", h).orderBy("ts", "event_id")
    w2 = Window.partitionBy("event_type", h).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    based = e.select(
        "event_type",
        h.alias("h"),
        "value",
        F.row_number().over(w1).alias("rn1"),
        F.row_number().over(w2).alias("rn2"),
    )
    return (
        based.groupBy("event_type", "h")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("rn1") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn2") == 1, F.col("value"))).alias("close"),
            (
                F.sum(
                    F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast(
                        "long"
                    )
                ).cast("double")
                / 1e6
            ).alias("volume"),
        )
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH").alias("hr"),
            "n_events",
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
        .orderBy("event_type", "hr")
    )


@query(
    "q_events_cusum",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY event_type, h
    ),
    m AS (
      SELECT event_type,
             CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
             COUNT(*) AS n_hours
      FROM hourly GROUP BY event_type
    ),
    dev AS (
      SELECT hourly.event_type, h, m.n_hours,
             CAST(floor((CAST(n AS DOUBLE) - m.mu) * 1e6 + 0.5) AS BIGINT)
               AS dc
      FROM hourly JOIN m ON m.event_type = hourly.event_type
    ),
    cus AS (
      SELECT event_type, n_hours,
             SUM(dc) OVER (PARTITION BY event_type ORDER BY h
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS s
      FROM dev
    )
    SELECT event_type, CAST(ANY_VALUE(n_hours) AS BIGINT) AS n_hours,
           round(CAST(MAX(s) AS DOUBLE) / 1e6, 6) AS max_drift,
           round(CAST(MIN(s) AS DOUBLE) / 1e6, 6) AS min_drift
    FROM cus GROUP BY event_type ORDER BY event_type
    """,
)
def q_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection per event type: the running sum of
    deviations from the series mean, whose maximum excursion localizes
    sustained level shifts that q_events_zscore's pointwise |z|>3 test
    cannot see (a 10% rate change never trips a 3σ threshold on any
    single hour, but its CUSUM grows linearly).  Reported as the
    max/min excursions — the change-point evidence pair.

    Deviations floor onto the 1e6 carrier BEFORE the running sum, so
    every prefix is an exact integer in both engines (the mean is one
    exact division; its product with the carrier is mirrored).  One
    hourly rollup, one tiny per-type mean join, one ordered window over
    the O(hours) series.
    """
    e = t(spark, sf_dir, "events")
    hourly = (
        e.select("event_type", F.date_trunc("hour", "ts").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = hourly.groupBy("event_type").agg(
        (F.sum("n").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mu"
        ),
        F.count(F.lit(1)).alias("n_hours"),
    )
    dev = hourly.join(
        F.broadcast(m.withColumnRenamed("event_type", "et")),
        F.col("et") == F.col("event_type"),
    ).select(
        "event_type",
        "h",
        "n_hours",
        F.floor(
            (F.col("n").cast("double") - F.col("mu")) * F.lit(1e6) + F.lit(0.5)
        )
        .cast("long")
        .alias("dc"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cus = dev.withColumn("s", F.sum("dc").over(w))
    return (
        cus.groupBy("event_type")
        .agg(
            F.any_value(F.col("n_hours")).cast("long").alias("n_hours"),
            F.round(F.max("s").cast("double") / 1e6, 6).alias("max_drift"),
            F.round(F.min("s").cast("double") / 1e6, 6).alias("min_drift"),
        )
        .orderBy("event_type")
    )


@query(
    "q_events_heatmap",
    oracle="""
    WITH g AS (
      SELECT CAST(isodow(ts) AS INT) AS iso_dow,
             CAST(hour(ts) AS INT) AS hr,
             COUNT(*) AS n
      FROM events GROUP BY iso_dow, hr
    ),
    tot AS (SELECT SUM(n) AS total FROM g)
    SELECT g.iso_dow, g.hr, CAST(g.n AS BIGINT) AS n,
           round(CAST(g.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS share
    FROM g CROSS JOIN tot t
    ORDER BY g.iso_dow, g.hr
    """,
)
def q_events_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap — the 168-cell weekly
    rhythm profile (traffic shaping, maintenance-window picking, bot
    cadence spotting: humans have weekends, cron jobs don't).

    ISO day numbering is the cross-engine trap: Spark's dayofweek() is
    Sunday=1 while DuckDB's isodow() is Monday=1, so the Spark side
    derives iso_dow as weekday()+1 (Monday=0 base).  One hash aggregate
    over the bounded 7×24 key domain (map-side combined — the shuffle
    carries ≤168 rows per task regardless of corpus size), plus a 1-row
    total broadcast for shares.
    """
    e = t(spark, sf_dir, "events")
    g = (
        e.select(
            (F.weekday("ts") + 1).cast("int").alias("iso_dow"),
            F.hour("ts").cast("int").alias("hr"),
        )
        .groupBy("iso_dow", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = g.agg(F.sum("n").alias("total"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "iso_dow",
            "hr",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.col("n").cast("double") / F.col("total").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("iso_dow", "hr")
    )


@query(
    "q_events_value_bands",
    oracle="""
    SELECT event_type,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           COUNT(*) AS n,
           quantile_disc(value, 0.10) AS p10,
           quantile_disc(value, 0.50) AS p50,
           quantile_disc(value, 0.90) AS p90
    FROM events
    GROUP BY event_type, day
    ORDER BY event_type, day
    """,
)
def q_events_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10/P50/P90 value bands per (event type, day) — the percentile
    ribbon a monitoring dashboard draws around a metric (means hide
    tail drift; the band shows WHERE the distribution moved).  Discrete
    percentiles pick real data values, so the bands are exact and
    engine-portable; days cross engines as strings.

    One grouped sort-based aggregation on the (type, day) key — Spark
    computes exact grouped percentiles from per-partition partial
    digests, one shuffle.
    """
    e = t(spark, sf_dir, "events")
    e.createOrReplaceTempView("events_bands_v")
    return spark.sql(
        """
        SELECT event_type,
               date_format(ts, 'yyyy-MM-dd') AS day,
               COUNT(*) AS n,
               percentile_disc(0.10) WITHIN GROUP (ORDER BY value) AS p10,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY value) AS p50,
               percentile_disc(0.90) WITHIN GROUP (ORDER BY value) AS p90
        FROM events_bands_v
        GROUP BY event_type, day
        ORDER BY event_type, day
        """
    )


@query(
    "q_events_ab_srm",
    oracle="""
    WITH assigned AS (
      SELECT DISTINCT user_id, CAST(user_id % 2 AS INT) AS variant
      FROM events
    ),
    counts AS (
      SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1
      FROM assigned
    )
    SELECT n0, n1,
           round(CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                 / CAST(n0 + n1 AS DOUBLE), 6) AS chi2,
           (CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
            / CAST(n0 + n1 AS DOUBLE) > 3.841) AS srm_detected
    FROM counts
    """,
)
def q_events_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard for the A/B assignment q_events_ab_test
    analyzes: chi-square (1 df) of the realized variant split against the
    designed 50/50.  SRM is the first thing to check before reading ANY
    experiment result — a biased assignment (bot filtering, logging loss,
    redirect asymmetry) invalidates the comparison no matter how
    significant the metric delta looks.  For equal expected counts the
    statistic collapses to (n0−n1)²/(n0+n1) — exact integers until one
    mirrored division; flag at the 0.05 critical value 3.841.

    One (user, variant) dedup, one conditional count — both map-side
    combined."""
    e = t(spark, sf_dir, "events")
    assigned = e.select(
        "user_id", (F.col("user_id") % 2).cast("int").alias("variant")
    ).distinct()
    counts = assigned.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    diff2 = ((F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))).cast(
        "double"
    )
    chi2 = diff2 / (F.col("n0") + F.col("n1")).cast("double")
    return counts.select(
        "n0",
        "n1",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).alias("srm_detected"),
    )


@query(
    "q_events_gap_histogram",
    oracle="""
    WITH gaps AS (
      SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id)
               AS gap_us
      FROM events
    ),
    b AS (
      SELECT CASE WHEN gap_us < 1000000 THEN '0_lt_1s'
                  WHEN gap_us < 60000000 THEN '1_lt_1m'
                  WHEN gap_us < 3600000000 THEN '2_lt_1h'
                  WHEN gap_us < 86400000000 THEN '3_lt_1d'
                  ELSE '4_ge_1d' END AS bucket
      FROM gaps WHERE gap_us IS NOT NULL
    ),
    g AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket),
    tot AS (SELECT SUM(n) AS total FROM g)
    SELECT g.bucket, CAST(g.n AS BIGINT) AS n,
           round(CAST(g.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS share
    FROM g CROSS JOIN tot t
    ORDER BY g.bucket
    """,
)
def q_events_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-scale inter-arrival gap histogram (sub-second / minute / hour
    / day / dormant buckets) — the distribution view behind
    q_events_interarrival's moments: bot bursts pile into the sub-second
    bucket, human sessions into minutes, and the session-gap threshold
    q_time_session_gap assumes is validated by WHERE the histogram's
    valley sits.

    One user-key window for the lag, then a bounded 5-bucket CASE
    aggregation (map-side combined — the shuffle carries ≤ 5 rows per
    task) plus a 1-row total broadcast."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gap = (us - F.lag(us).over(w)).alias("gap_us")
    b = (
        e.select(gap)
        .filter(F.col("gap_us").isNotNull())
        .select(
            F.when(F.col("gap_us") < 1_000_000, "0_lt_1s")
            .when(F.col("gap_us") < 60_000_000, "1_lt_1m")
            .when(F.col("gap_us") < 3_600_000_000, "2_lt_1h")
            .when(F.col("gap_us") < 86_400_000_000, "3_lt_1d")
            .otherwise("4_ge_1d")
            .alias("bucket")
        )
    )
    g = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    tot = g.agg(F.sum("n").alias("total"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.col("n").cast("double") / F.col("total").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("bucket")
    )


@query(
    "q_events_concurrency",
    oracle="""
    WITH sess AS (
      SELECT user_id, MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
      FROM events GROUP BY user_id
    ),
    deltas AS (
      SELECT s AS t, 1 AS d FROM sess
      UNION ALL
      SELECT e + 1, -1 FROM sess
    ),
    agg AS (
      SELECT t, CAST(SUM(d) AS BIGINT) AS dsum FROM deltas GROUP BY t
    ),
    run AS (
      SELECT t, SUM(dsum) OVER (ORDER BY t
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS live
      FROM agg
    )
    SELECT CAST((SELECT COUNT(*) FROM sess) AS BIGINT) AS n_users,
           CAST(MAX(live) AS BIGINT) AS peak_concurrency,
           strftime(MIN(CASE WHEN live = (SELECT MAX(live) FROM run)
                             THEN to_timestamp(t / 1000000) END),
                    '%Y-%m-%d %H:%M:%S') AS peak_at
    FROM run
    """,
)
def q_events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by sweep line: each user's active interval
    (first→last event) contributes +1/−1 boundary deltas; the running
    sum over sorted boundaries is the live-user count, and its maximum
    is the capacity-planning number ("how many sessions must the system
    hold at once") that no per-window count can produce exactly
    (overlaps cross every window boundary).

    The sweep is over the O(users) boundary relation, not events: one
    user rollup, one delta aggregation (map-side combined), one ordered
    running window.  End boundaries fire at e+1 µs so a user active at
    instant e still counts — the closed-interval convention, identical
    in both engines because boundaries are exact integers.
    """
    e = t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    sess = e.groupBy("user_id").agg(
        F.min(us).alias("s"), F.max(us).alias("e")
    ).localCheckpoint(eager=False)
    deltas = sess.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        sess.select((F.col("e") + 1).alias("t"), F.lit(-1).alias("d"))
    )
    agg = deltas.groupBy("t").agg(F.sum("d").alias("dsum"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    run = agg.withColumn("live", F.sum("dsum").over(w)).localCheckpoint(
        eager=False
    )
    peak = run.agg(F.max("live").alias("mx"))
    n_users = sess.agg(F.count(F.lit(1)).alias("n_users"))
    return (
        run.crossJoin(F.broadcast(peak))
        .crossJoin(F.broadcast(n_users))
        .groupBy("n_users", "mx")
        .agg(
            F.date_format(
                F.min(
                    F.when(
                        F.col("live") == F.col("mx"),
                        F.timestamp_micros(F.col("t")),
                    )
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("peak_at")
        )
        .select(
            F.col("n_users").cast("long").alias("n_users"),
            F.col("mx").cast("long").alias("peak_concurrency"),
            "peak_at",
        )
    )


SLO_TARGET_NUM, SLO_TARGET_DEN = 1, 100  # error budget: 1% of requests
SLO_FAST_BURN = 14  # fast-burn alert multiple (integer form of ~14.4)


@query(
    "q_events_slo_burn",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS errs
      FROM events GROUP BY h
    )
    SELECT strftime(h, '%Y-%m-%d %H') AS hr, CAST(n AS BIGINT) AS n_requests,
           errs AS n_errors,
           round(CAST(errs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS error_rate,
           round(CAST(errs AS DOUBLE) / CAST(n AS DOUBLE)
                 / ({SLO_TARGET_NUM}.0 / {SLO_TARGET_DEN}), 6) AS burn_rate,
           (errs * {SLO_TARGET_DEN} > {SLO_FAST_BURN} * {SLO_TARGET_NUM} * n)
             AS fast_burn_alert
    FROM hourly
    ORDER BY hr
    """,
)
def q_events_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget burn rate per hour: error share over the 1%
    budget, with the fast-burn alert (burn > {SLO_FAST_BURN}×) that
    pages before a sustained incident exhausts the monthly budget — the
    SRE multi-window alerting primitive, stated on the hourly rollup.

    The alert predicate is the integer cross-multiplication
    `errs·{SLO_TARGET_DEN} > {SLO_FAST_BURN}·{SLO_TARGET_NUM}·n`, so
    flag decisions never touch a float; rates are reported at 6 dp for
    humans.  One bounded-key hash aggregate over the scan.
    """
    e = t(spark, sf_dir, "events")
    hourly = (
        e.select(
            F.date_trunc("hour", "ts").alias("h"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
        )
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_err").cast("long").alias("errs"),
        )
    )
    rate = F.col("errs").cast("double") / F.col("n").cast("double")
    return hourly.select(
        F.date_format("h", "yyyy-MM-dd HH").alias("hr"),
        F.col("n").cast("long").alias("n_requests"),
        F.col("errs").alias("n_errors"),
        F.round(rate, 6).alias("error_rate"),
        F.round(rate / F.lit(SLO_TARGET_NUM / SLO_TARGET_DEN), 6).alias(
            "burn_rate"
        ),
        (
            F.col("errs") * SLO_TARGET_DEN
            > F.lit(SLO_FAST_BURN * SLO_TARGET_NUM) * F.col("n")
        ).alias("fast_burn_alert"),
    ).orderBy("hr")


@query(
    "q_events_streaks",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS dn
      FROM events
    ),
    grp AS (
      SELECT user_id, dn,
             dn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dn)
               AS island
      FROM ud
    ),
    streaks AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS streak_days,
             CAST(MIN(dn) AS BIGINT) AS start_dn
      FROM grp GROUP BY user_id, island
    )
    SELECT user_id, streak_days, start_dn,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY streak_days DESC, user_id,
                                   start_dn) AS rk
      FROM streaks
    )
    WHERE rk <= 10
    ORDER BY rk
    """,
)
def q_events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streaks (top-10 across users) —
    the engagement/gamification metric built on the gaps-and-islands
    identity dn − row_number = constant within a consecutive run, here
    applied per user over distinct active days.

    One (user, day) dedup, one per-user window (history-bounded), one
    grouped count per island, then a global top-10
    (TakeOrderedAndProject).  Day numbers are exact integers anchored
    at a fixed epoch so both engines agree on arithmetic and ordering.
    """
    e = t(spark, sf_dir, "events")
    ud = e.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1995-01-01").cast("date")).alias(
            "dn"
        ),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("dn")
    grp = ud.withColumn(
        "island", F.col("dn") - F.row_number().over(w)
    )
    streaks = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("streak_days"),
        F.min("dn").cast("long").alias("start_dn"),
    )
    wr = Window.orderBy(
        F.col("streak_days").desc(), "user_id", "start_dn"
    )
    return (
        streaks.withColumn("rk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rk") <= 10)
        .select("user_id", "streak_days", "start_dn", "rk")
        .orderBy("rk")
    )


@query(
    "q_events_user_entropy",
    oracle="""
    WITH cnt AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    ),
    ue AS (
      SELECT user_id,
             CAST(SUM(c) AS BIGINT) AS n,
             round(log2(CAST(SUM(c) AS DOUBLE))
                   - SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
                     / CAST(SUM(c) AS DOUBLE), 4) AS ent
      FROM cnt GROUP BY user_id
    )
    SELECT CASE WHEN ent < 0.5 THEN '0_lt_0.5'
                WHEN ent < 1.0 THEN '1_lt_1.0'
                WHEN ent < 1.5 THEN '2_lt_1.5'
                WHEN ent < 2.0 THEN '3_lt_2.0'
                ELSE '4_ge_2.0' END AS entropy_bucket,
           COUNT(*) AS n_users,
           CAST(SUM(n) AS BIGINT) AS n_events
    FROM ue GROUP BY entropy_bucket ORDER BY entropy_bucket
    """,
)
def q_events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-entropy histogram: Shannon entropy of each user's
    event-type distribution, bucketed — the population view behind bot
    triage (scripts repeat one action: entropy ≈ 0; engaged humans mix
    the full vocabulary: entropy → log₂ 5) that q_events_bots' explicit
    rules can be calibrated against.

    Entropy per user uses the q_text_entropy identity
    H = log₂n − (Σ c·log₂c)/n over exact per-(user, type) counts,
    pinned at 4 dp before bucketing so both engines bucket identically;
    two map-side-combined rollups, bounded 5-bucket output.
    """
    e = t(spark, sf_dir, "events")
    cnt = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    n = F.sum("c").cast("double")
    ue = cnt.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.round(
            F.log2(n)
            - F.sum(F.col("c").cast("double") * F.log2("c")) / n,
            4,
        ).alias("ent"),
    )
    bucket = (
        F.when(F.col("ent") < 0.5, "0_lt_0.5")
        .when(F.col("ent") < 1.0, "1_lt_1.0")
        .when(F.col("ent") < 1.5, "2_lt_1.5")
        .when(F.col("ent") < 2.0, "3_lt_2.0")
        .otherwise("4_ge_2.0")
    )
    return (
        ue.groupBy(bucket.alias("entropy_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n").cast("long").alias("n_events"),
        )
        .orderBy("entropy_bucket")
    )


# Recency-decay weight table: 0.5^(age_weeks), ages capped at 8 weeks —
# every weight is an exact binary double, so per-user decayed scores sum
# bit-identically in both engines (the q_events_ewma discipline applied
# to a per-entity score instead of a series smoother).
_RECENCY_W = [1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625, 0.0078125,
              0.00390625]


@query(
    "q_events_recency_score",
    oracle=f"""
    WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS mx FROM events),
    aged AS (
      SELECT user_id,
             least(date_diff('day', CAST(ts AS DATE), a.mx) // 7, 8) AS wk
      FROM events CROSS JOIN anchor a
    ),
    scored AS (
      SELECT user_id,
             CAST(SUM(CAST(floor(({_RECENCY_W!r})[wk + 1] * 1e6 + 0.5)
                           AS BIGINT)) AS BIGINT) AS score_c,
             COUNT(*) AS n_events
      FROM aged GROUP BY user_id
    )
    SELECT user_id, n_events,
           round(CAST(score_c AS DOUBLE) / 1e6, 6) AS recency_score,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score_c DESC, user_id) AS rk
      FROM scored
    )
    WHERE rk <= 20
    ORDER BY rk
    """,
)
def q_events_recency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement score (top-20 users): each event
    contributes 0.5^(age in weeks, capped at 8) — the decayed-activity
    ranking behind "most engaged right now" surfaces, where a raw event
    count crowns long-gone power users.

    The decay table is LITERAL exact-binary halves indexed by capped
    integer age, each weight floored onto the 1e6 carrier per event, so
    per-user sums are exact integers at any aggregation order; one
    grouped rollup + TakeOrderedAndProject.
    """
    e = t(spark, sf_dir, "events")
    anchor = e.agg(F.max(F.to_date("ts")).alias("mx"))
    warr = F.array(*[F.lit(x) for x in _RECENCY_W])
    aged = e.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.least(
            (F.datediff(F.col("mx"), F.to_date("ts")) / 7).cast("long"),
            F.lit(8),
        ).alias("wk"),
    )
    scored = aged.groupBy("user_id").agg(
        F.sum(
            F.floor(
                F.element_at(warr, (F.col("wk") + 1).cast("int"))
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long")
        ).alias("score_c"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.orderBy(F.col("score_c").desc(), "user_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 20)
        .select(
            "user_id",
            "n_events",
            F.round(F.col("score_c").cast("double") / 1e6, 6).alias(
                "recency_score"
            ),
            "rk",
        )
        .orderBy("rk")
    )


@query(
    "q_events_incidents",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS errs
      FROM events GROUP BY h
    ),
    alerts AS (
      SELECT h, epoch_us(h) // 3600000000 AS hn
      FROM hourly
      WHERE errs * {SLO_TARGET_DEN} > {SLO_FAST_BURN} * {SLO_TARGET_NUM} * n
    ),
    grp AS (
      SELECT h, hn,
             hn - ROW_NUMBER() OVER (ORDER BY hn) AS island
      FROM alerts
    ),
    incidents AS (
      SELECT island, CAST(COUNT(*) AS BIGINT) AS dur_hours,
             strftime(MIN(h), '%Y-%m-%d %H') AS started_at
      FROM grp GROUP BY island
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_incidents,
           CAST(COALESCE(MAX(dur_hours), 0) AS BIGINT) AS longest_hours,
           CAST(COALESCE(SUM(dur_hours), 0) AS BIGINT) AS total_alert_hours,
           MIN(started_at) AS first_incident_at
    FROM incidents
    """,
)
def q_events_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert debouncing: consecutive fast-burn hours (q_events_slo_burn's
    predicate) merge into INCIDENTS — the count/duration report an
    on-call review actually reads, where the raw alert stream
    over-counts one sustained outage as N pages.  Gaps-and-islands on
    the integer hour number over ONLY the alerting hours, so the
    incident relation is bounded by alert volume, not corpus size.

    Same integer cross-multiplied alert predicate as the burn-rate
    query (no float in the grouping decision); identical hourly rollup
    feeds both, and both engines agree on hour numbers because they are
    exact epoch-microsecond divisions.
    """
    e = t(spark, sf_dir, "events")
    hourly = (
        e.select(
            F.date_trunc("hour", "ts").alias("h"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias(
                "is_err"
            ),
        )
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_err").cast("long").alias("errs"),
        )
    )
    alerts = hourly.filter(
        F.col("errs") * SLO_TARGET_DEN
        > F.lit(SLO_FAST_BURN * SLO_TARGET_NUM) * F.col("n")
    ).select(
        "h",
        F.expr("unix_micros(h) div 3600000000").alias("hn"),
    )
    w = Window.orderBy("hn")
    grp = alerts.withColumn(
        "island", F.col("hn") - F.row_number().over(w)
    )
    incidents = grp.groupBy("island").agg(
        F.count(F.lit(1)).cast("long").alias("dur_hours"),
        F.date_format(F.min("h"), "yyyy-MM-dd HH").alias("started_at"),
    )
    return incidents.agg(
        F.count(F.lit(1)).cast("long").alias("n_incidents"),
        F.coalesce(F.max("dur_hours"), F.lit(0)).cast("long").alias(
            "longest_hours"
        ),
        F.coalesce(F.sum("dur_hours"), F.lit(0)).cast("long").alias(
            "total_alert_hours"
        ),
        F.min("started_at").alias("first_incident_at"),
    )


# ---------------------------------------------------------------------------
# Deadline funnel: ordered steps with a conversion window from step 1
# ---------------------------------------------------------------------------

FUNNEL_DEADLINE_DAYS = 7


@query(
    "q_events_funnel_deadline",
    oracle=f"""
    WITH u1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    u2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN u1 ON u1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > u1.t1
        AND e.ts <= u1.t1 + INTERVAL {FUNNEL_DEADLINE_DAYS} DAY
      GROUP BY e.user_id
    ),
    u3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN u2 ON u2.user_id = e.user_id
      JOIN u1 ON u1.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > u2.t2
        AND e.ts <= u1.t1 + INTERVAL {FUNNEL_DEADLINE_DAYS} DAY
      GROUP BY e.user_id
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS step1_view,
      CAST(COUNT(u2.t2) AS BIGINT) AS step2_click,
      CAST(COUNT(u3.t3) AS BIGINT) AS step3_purchase,
      round(CAST(COUNT(u2.t2) AS DOUBLE) / COUNT(*), 6) AS rate_step2,
      round(CAST(COUNT(u3.t3) AS DOUBLE) / COUNT(*), 6) AS rate_step3
    FROM u1
    LEFT JOIN u2 ON u2.user_id = u1.user_id
    LEFT JOIN u3 ON u3.user_id = u1.user_id
    """,
)
def q_events_funnel_deadline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deadline funnel (the windowFunnel semantics): view → click →
    purchase must happen IN ORDER, and the later steps must land within
    {FUNNEL_DEADLINE_DAYS} days of the user's FIRST view — the funnel
    marketing actually buys ('converted within the attribution
    window'), which q_events_funnel's unbounded ordered variant
    overstates.  Each step anchors on the previous step's first
    qualifying timestamp, so a purchase before the click never counts.

    Three user-keyed aggregations, each one conditional-MIN join
    against the previous step's O(users) relation — the partitioning
    on user_id is REUSED across all three shuffles (no window, no
    per-user collect).  Timestamps compare as exact instants; rates
    are single divisions of exact longs rounded at 6.
    """
    e = t(spark, sf_dir, "events")
    u1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    deadline = F.col("t1") + F.expr(f"INTERVAL {FUNNEL_DEADLINE_DAYS} DAYS")
    u2 = (
        e.filter(F.col("event_type") == "click")
        .join(u1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    u3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(u2, "user_id")
        .join(u1, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    joined = u1.join(u2, "user_id", "left").join(u3, "user_id", "left")
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("step1_view"),
        F.count("t2").cast("long").alias("step2_click"),
        F.count("t3").cast("long").alias("step3_purchase"),
        F.round(F.count("t2").cast("double") / F.count(F.lit(1)), 6).alias(
            "rate_step2"
        ),
        F.round(F.count("t3").cast("double") / F.count(F.lit(1)), 6).alias(
            "rate_step3"
        ),
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction for the A/B readout
# ---------------------------------------------------------------------------

CUPED_SPLIT = "2024-01-16"  # pre-period / experiment-period boundary


@query(
    "q_events_ab_cuped",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'
                           THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS xq,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}'
                           THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS yq
      FROM events GROUP BY user_id
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS sx,
             CAST(SUM(yq) AS BIGINT) AS sy,
             CAST(SUM(CAST(xq AS HUGEINT) * yq) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(xq AS HUGEINT) * xq) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(yq AS HUGEINT) * yq) AS DOUBLE) AS syy
      FROM per_user
    ),
    th AS (
      SELECT n, sx, sy, sxx, syy,
             (sxy - CAST(sx AS DOUBLE) / n * sy)
               / (sxx - CAST(sx AS DOUBLE) / n * sx) AS theta
      FROM pooled
    ),
    arms AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_arm,
             CAST(SUM(xq) AS BIGINT) AS sxa,
             CAST(SUM(yq) AS BIGINT) AS sya
      FROM per_user GROUP BY variant
    )
    SELECT a.variant, a.n_arm,
           round(CAST(a.sya AS DOUBLE) / a.n_arm / 100.0, 6) AS mean_y,
           round((CAST(a.sya AS DOUBLE) / a.n_arm
                  - t.theta * (CAST(a.sxa AS DOUBLE) / a.n_arm
                               - CAST(t.sx AS DOUBLE) / t.n)) / 100.0, 6)
             AS mean_y_adj,
           round(t.theta, 6) AS theta,
           round(t.theta * t.theta
                 * (t.sxx - CAST(t.sx AS DOUBLE) / t.n * t.sx)
                 / (t.syy - CAST(t.sy AS DOUBLE) / t.n * t.sy), 4)
             AS var_reduction
    FROM arms a CROSS JOIN th t
    ORDER BY a.variant
    """,
)
def q_events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al.): adjust each arm's
    experiment-period revenue by θ·(pre-period revenue − grand mean),
    with θ = cov(pre, post)/var(pre) pooled — the industry-standard
    trick that removes the variance explained by pre-experiment
    behavior, shrinking confidence intervals (and q_stats_power's
    required sample size) by the reported var_reduction share without
    touching the treatment effect.  Completes the experimentation
    family: assignment (q_events_ab_test), health (q_events_ab_srm),
    planning (q_stats_power), readout adjustment (this).

    Everything reduces to ONE per-user aggregation plus exact pooled
    moments: the adjusted arm means are algebra over group-level sums
    (mean_adj = ȳ_a − θ(x̄_a − x̄)), so no per-user adjusted column ever
    materializes.  Cross-products ride int128/DECIMAL(38); θ and both
    adjusted means are fixed-order doubles on exact sums, rounded at 6.
    """
    e = t(spark, sf_dir, "events")
    split = F.lit(CUPED_SPLIT).cast("timestamp")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, cents).otherwise(0))
        .cast("long")
        .alias("xq"),
        F.sum(F.when(F.col("ts") >= split, cents).otherwise(0))
        .cast("long")
        .alias("yq"),
    ).select((F.col("user_id") % 2).cast("int").alias("variant"), "xq", "yq")
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq").cast("decimal(38,0)") * F.col("yq"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("xq").cast("decimal(38,0)") * F.col("xq"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("yq").cast("decimal(38,0)") * F.col("yq"))
        .cast("double")
        .alias("syy"),
    )
    th = pooled.withColumn(
        "theta",
        (F.col("sxy") - F.col("sx").cast("double") / F.col("n") * F.col("sy"))
        / (
            F.col("sxx")
            - F.col("sx").cast("double") / F.col("n") * F.col("sx")
        ),
    )
    arms = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_arm"),
        F.sum("xq").cast("long").alias("sxa"),
        F.sum("yq").cast("long").alias("sya"),
    )
    mean_y = F.col("sya").cast("double") / F.col("n_arm")
    mean_x = F.col("sxa").cast("double") / F.col("n_arm")
    grand_x = F.col("sx").cast("double") / F.col("n")
    return (
        arms.crossJoin(F.broadcast(th))
        .select(
            "variant",
            "n_arm",
            F.round(mean_y / 100.0, 6).alias("mean_y"),
            F.round(
                (mean_y - F.col("theta") * (mean_x - grand_x)) / 100.0, 6
            ).alias("mean_y_adj"),
            F.round("theta", 6).alias("theta"),
            F.round(
                F.col("theta")
                * F.col("theta")
                * (
                    F.col("sxx")
                    - F.col("sx").cast("double") / F.col("n") * F.col("sx")
                )
                / (
                    F.col("syy")
                    - F.col("sy").cast("double") / F.col("n") * F.col("sy")
                ),
                4,
            ).alias("var_reduction"),
        )
        .orderBy("variant")
    )


IV_WIDTH_US = 300_000_000  # each event covers [ts, ts + 5 min)


@query(
    "q_time_interval_union",
    oracle=f"""
    WITH iv AS (
      SELECT DISTINCT event_type AS grp, user_id,
             epoch_us(ts) AS s, epoch_us(ts) + {IV_WIDTH_US} AS e
      FROM events
    ),
    flagged AS (
      SELECT grp, user_id, s, e,
             CASE WHEN MAX(e) OVER (PARTITION BY grp, user_id
                    ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                  OR s > MAX(e) OVER (PARTITION BY grp, user_id
                    ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_isl
      FROM iv
    ),
    islid AS (
      SELECT grp, user_id, s, e,
             CAST(SUM(new_isl) OVER (PARTITION BY grp, user_id
                    ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS isl
      FROM flagged
    ),
    islands AS (
      SELECT grp, user_id, isl,
             CAST(MAX(e) - MIN(s) AS BIGINT) AS cover_us
      FROM islid GROUP BY grp, user_id, isl
    ),
    per_user AS (
      SELECT grp, user_id,
             CAST(SUM(cover_us) AS BIGINT) AS union_us,
             CAST(COUNT(*) AS BIGINT) AS n_isl
      FROM islands GROUP BY grp, user_id
    )
    SELECT grp AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(union_us) // 1000000 AS BIGINT) AS union_seconds,
           CAST(SUM(n_isl) AS BIGINT) AS n_islands,
           round(CAST(SUM(n_isl) AS DOUBLE) / COUNT(*), 4)
             AS avg_islands_per_user
    FROM per_user GROUP BY grp ORDER BY grp
    """,
)
def q_time_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage (sweep-line): treat each event as a
    5-minute activity interval and compute, per event type, the TOTAL
    deduplicated active time across users plus the island count — the
    'how much wall-clock was actually covered' metric (billing active
    minutes, SLA coverage, session stitching) that naive SUM(duration)
    overstates wherever intervals overlap.

    The classic sequential sweep becomes three windows over each
    (type, user) partition: running max of interval ends (ROWS ...
    1 PRECEDING) marks island starts, a running flag-sum assigns island
    ids, and each island's coverage is exactly max(end) − min(start)
    because membership guarantees contiguity.  All arithmetic is exact
    epoch-microsecond integers; partitions are per-user (no global
    windows), so the plan scales with the user key like every
    sessionization op here."""
    us = F.unix_micros("ts")
    # DISTINCT intervals + a TOTAL (s, e) sort: identical intervals are
    # idempotent in a union, and a ROWS frame over a NON-total order is
    # tie-order-unstable ACROSS the two window passes — the flagged row
    # can sort after its tie siblings in the island-id pass, attaching
    # them to the previous island and inflating coverage across gaps
    # (sf1 clone-fixture sweep finding: 200x overstated union_seconds)
    iv = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        "user_id",
        us.alias("s"),
        (us + IV_WIDTH_US).alias("e"),
    ).distinct()
    wprev = (
        Window.partitionBy("grp", "user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pme = F.max("e").over(wprev)
    flagged = iv.select(
        "grp",
        "user_id",
        "s",
        "e",
        F.when(pme.isNull() | (F.col("s") > pme), 1).otherwise(0).alias(
            "new_isl"
        ),
    )
    wcum = (
        Window.partitionBy("grp", "user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islid = flagged.select(
        "grp",
        "user_id",
        "s",
        "e",
        F.sum("new_isl").over(wcum).cast("long").alias("isl"),
    )
    islands = islid.groupBy("grp", "user_id", "isl").agg(
        (F.max("e") - F.min("s")).cast("long").alias("cover_us")
    )
    per_user = islands.groupBy("grp", "user_id").agg(
        F.sum("cover_us").cast("long").alias("union_us"),
        F.count(F.lit(1)).cast("long").alias("n_isl"),
    )
    return (
        per_user.groupBy(F.col("grp").alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.expr("sum(union_us) div 1000000")
            .cast("long")
            .alias("union_seconds"),
            F.sum("n_isl").cast("long").alias("n_islands"),
            F.round(
                F.sum("n_isl").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_islands_per_user"),
        )
        .orderBy("event_type")
    )


M4_BUCKETS = 15


@query(
    "q_time_m4_downsample",
    oracle=f"""
    WITH pool AS (
      SELECT event_type AS grp, event_id, epoch_us(ts) AS u,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    span AS (
      SELECT CAST(MIN(u) AS BIGINT) AS mn, CAST(MAX(u) AS BIGINT) AS mx
      FROM pool
    ),
    bucketed AS (
      SELECT grp, event_id, u, xq,
             CAST((u - s.mn) * {M4_BUCKETS} // (s.mx - s.mn + 1)
                  AS BIGINT) AS b
      FROM pool CROSS JOIN span s
    ),
    ranked AS (
      SELECT grp, b, xq,
             ROW_NUMBER() OVER (PARTITION BY grp, b
                                ORDER BY u, event_id) AS ra,
             ROW_NUMBER() OVER (PARTITION BY grp, b
                                ORDER BY u DESC, event_id DESC) AS rd
      FROM bucketed
    )
    SELECT grp, b AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(MIN(xq) / 100.0, 2) AS v_min,
           round(MAX(xq) / 100.0, 2) AS v_max,
           round(MAX(CASE WHEN ra = 1 THEN xq END) / 100.0, 2) AS v_first,
           round(MAX(CASE WHEN rd = 1 THEN xq END) / 100.0, 2) AS v_last
    FROM ranked GROUP BY grp, b ORDER BY grp, b
    """,
)
def q_time_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series decimation: per event type, reduce the raw value
    stream to {M4_BUCKETS} pixel buckets carrying exactly min / max /
    first / last — the aggregation proven to render the visually
    IDENTICAL line chart at any zoom (what Grafana/observability
    backends run), unlike naive per-bucket averaging which erases
    spikes.  The op that turns a 100 TB series into a dashboard
    payload.

    One narrow scan buckets by exact integer epoch-µs arithmetic
    against the broadcast 1-row global span; first/last are
    row_number=1 picks under (ts, event_id) order — unique event ids
    make the selection fully deterministic — and both directions ride
    the same (type, bucket) partitioning as the min/max aggregate, so
    the whole decimation is two window passes + one hash aggregate on
    the uniform bucket key."""
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        "event_id",
        F.unix_micros("ts").alias("u"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    span = pool.agg(
        F.min("u").cast("long").alias("mn"),
        F.max("u").cast("long").alias("mx"),
    )
    bucketed = pool.crossJoin(F.broadcast(span)).select(
        "grp",
        "event_id",
        "u",
        "xq",
        F.expr(f"(u - mn) * {M4_BUCKETS} div (mx - mn + 1)")
        .cast("long")
        .alias("b"),
    )
    wa = Window.partitionBy("grp", "b").orderBy("u", "event_id")
    wd = Window.partitionBy("grp", "b").orderBy(
        F.col("u").desc(), F.col("event_id").desc()
    )
    ranked = bucketed.select(
        "grp",
        "b",
        "xq",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return (
        ranked.groupBy("grp", F.col("b").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("xq") / 100.0, 2).alias("v_min"),
            F.round(F.max("xq") / 100.0, 2).alias("v_max"),
            F.round(
                F.max(F.when(F.col("ra") == 1, F.col("xq"))) / 100.0, 2
            ).alias("v_first"),
            F.round(
                F.max(F.when(F.col("rd") == 1, F.col("xq"))) / 100.0, 2
            ).alias("v_last"),
        )
        .orderBy("grp", "bucket")
    )


@query(
    "q_events_audience_overlap",
    oracle="""
    WITH us AS (
      SELECT DISTINCT event_type AS grp, user_id FROM events
    ),
    sizes AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n FROM us GROUP BY grp
    ),
    common AS (
      SELECT a.grp AS type_a, b.grp AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM us a JOIN us b
        ON b.user_id = a.user_id AND a.grp < b.grp
      GROUP BY a.grp, b.grp
    )
    SELECT c.type_a, c.type_b, sa.n AS n_a, sb.n AS n_b, c.n_common,
           round(CAST(c.n_common AS DOUBLE)
                 / (sa.n + sb.n - c.n_common), 6) AS jaccard
    FROM common c
    JOIN sizes sa ON sa.grp = c.type_a
    JOIN sizes sb ON sb.grp = c.type_b
    ORDER BY c.type_a, c.type_b
    """,
)
def q_events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: Jaccard similarity of the USER SETS
    behind every event-type pair — 'do the people who error overlap the
    people who purchase?' — the segmentation-sanity readout behind
    funnel design and the exact baseline q_agg_hll's sketches
    approximate at scale.

    The corpus collapses to the DISTINCT (type, user) relation first
    (one dedup shuffle on the uniform user key); the pair counts are a
    self-join keyed on user_id — fan-out bounded by the ≤|types| rows
    each user contributes, never a cross join — and union sizes come
    from inclusion-exclusion against the broadcast per-type totals."""
    us = (
        t(spark, sf_dir, "events")
        .select(F.col("event_type").alias("grp"), "user_id")
        .distinct()
    )
    sizes = us.groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("n"))
    common = (
        us.alias("a")
        .join(
            us.alias("b"),
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("a.grp") < F.col("b.grp")),
        )
        .groupBy(
            F.col("a.grp").alias("type_a"), F.col("b.grp").alias("type_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("grp").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("grp").alias("type_b"), F.col("n").alias("n_b"))
    return (
        common.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "q_win_pattern_vshape",
    oracle="""
    WITH daily AS (
      SELECT event_type AS grp, strftime(ts, '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    ctx AS (
      SELECT grp, day, c,
             LAG(c, 2) OVER (PARTITION BY grp ORDER BY day) AS p2,
             LAG(c, 1) OVER (PARTITION BY grp ORDER BY day) AS p1,
             LEAD(c, 1) OVER (PARTITION BY grp ORDER BY day) AS f1,
             LEAD(c, 2) OVER (PARTITION BY grp ORDER BY day) AS f2
      FROM daily
    ),
    vb AS (
      SELECT grp, day, c,
             CAST(LEAST(p2, f2) - c AS BIGINT) AS depth
      FROM ctx
      WHERE p2 > p1 AND p1 > c AND f1 > c AND f2 > f1
    ),
    mx AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_vbottoms,
             CAST(MAX(depth) AS BIGINT) AS max_depth
      FROM vb GROUP BY grp
    )
    SELECT m.grp, m.n_vbottoms, m.max_depth,
           MIN(v.day) AS deepest_day
    FROM mx m JOIN vb v ON v.grp = m.grp AND v.depth = m.max_depth
    GROUP BY m.grp, m.n_vbottoms, m.max_depth
    ORDER BY m.grp
    """,
)
def q_win_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite row-pattern detection: strict V shapes
    (two falling days into a bottom, two rising days out:
    c₋₂>c₋₁>c<c₊₁<c₊₂) in each type's daily count series, with the
    count of V bottoms and the deepest dip — the relational form of
    Flink/Trino's DOWN+ UP+ pattern clause, and the 'was that a real
    incident-and-recovery?' screen on traffic curves.

    The corpus collapses to the bounded (type, day) relation; the
    5-point pattern predicate is pure LAG/LEAD over per-type ordered
    windows (≤31 rows each), depth = least(shoulders) − bottom in exact
    integers, and the deepest day is an exact argmax join with an
    earliest-day tiebreak."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("grp"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("grp").orderBy("day")
    ctx = daily.select(
        "grp",
        "day",
        "c",
        F.lag("c", 2).over(w).alias("p2"),
        F.lag("c", 1).over(w).alias("p1"),
        F.lead("c", 1).over(w).alias("f1"),
        F.lead("c", 2).over(w).alias("f2"),
    )
    vb = ctx.filter(
        (F.col("p2") > F.col("p1"))
        & (F.col("p1") > F.col("c"))
        & (F.col("f1") > F.col("c"))
        & (F.col("f2") > F.col("f1"))
    ).select(
        "grp",
        "day",
        (F.least("p2", "f2") - F.col("c")).cast("long").alias("depth"),
    )
    mx = vb.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_vbottoms"),
        F.max("depth").cast("long").alias("max_depth"),
    )
    return (
        mx.join(
            vb.select(F.col("grp").alias("v_grp"), "depth", "day"),
            (F.col("v_grp") == F.col("grp"))
            & (F.col("depth") == F.col("max_depth")),
        )
        .groupBy("grp", "n_vbottoms", "max_depth")
        .agg(F.min("day").alias("deepest_day"))
        .orderBy("grp")
    )


@query(
    "q_events_forecast_eval",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY event_type, h
    ),
    framed AS (
      SELECT event_type, h, n,
             CAST(SUM(n) OVER w AS BIGINT) AS s24,
             CAST(COUNT(*) OVER w AS BIGINT) AS k24
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT event_type, n,
             CAST(floor(abs(CAST(n AS DOUBLE)
                            - CAST(s24 AS DOUBLE) / k24) * 1e6 + 0.5)
                  AS BIGINT) AS ae6,
             CAST(floor((CAST(n AS DOUBLE)
                         - CAST(s24 AS DOUBLE) / k24) * 1e6 + 0.5)
                  AS BIGINT) AS e6,
             CAST(floor(abs(CAST(n AS DOUBLE)
                            - CAST(s24 AS DOUBLE) / k24)
                        / n * 1e6 + 0.5) AS BIGINT) AS ape6
      FROM framed WHERE k24 >= 12
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
           round(CAST(SUM(ae6) AS DOUBLE) / 1e6
                 / SUM(n), 6) AS wape,
           round(CAST(SUM(ape6) AS DOUBLE) / 1e6 / COUNT(*), 6) AS mape,
           round(CAST(SUM(e6) AS DOUBLE) / 1e6 / COUNT(*), 6) AS bias
    FROM scored GROUP BY event_type ORDER BY event_type
    """,
)
def q_events_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality scorecard for the rolling-24h SMA predictor
    (q_events_forecast_sma reports MAE; production review wants the
    full panel): WAPE (volume-weighted — the planner's number), MAPE
    (per-hour fairness — punishes misses on quiet hours), and signed
    BIAS (systematic over/under-forecast, invisible to both).  Three
    numbers, three different failure modes.

    Same single-pass shape as the forecaster: one hourly rollup, one
    trailing-frame window per type, every error term pinned onto a 1e6
    grid at the row where it is born so the three aggregations are
    order-free integer sums."""
    hourly = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    framed = hourly.select(
        "event_type",
        "n",
        F.sum("n").over(w).cast("long").alias("s24"),
        F.count(F.lit(1)).over(w).cast("long").alias("k24"),
    ).filter(F.col("k24") >= 12)
    err = F.col("n").cast("double") - F.col("s24").cast("double") / F.col(
        "k24"
    )
    scored = framed.select(
        "event_type",
        "n",
        F.floor(F.abs(err) * 1e6 + 0.5).cast("long").alias("ae6"),
        F.floor(err * 1e6 + 0.5).cast("long").alias("e6"),
        F.floor(F.abs(err) / F.col("n") * 1e6 + 0.5)
        .cast("long")
        .alias("ape6"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.round(
                F.sum("ae6").cast("double") / 1e6 / F.sum("n"), 6
            ).alias("wape"),
            F.round(
                F.sum("ape6").cast("double") / 1e6 / F.count(F.lit(1)), 6
            ).alias("mape"),
            F.round(
                F.sum("e6").cast("double") / 1e6 / F.count(F.lit(1)), 6
            ).alias("bias"),
        )
        .orderBy("event_type")
    )


@query(
    "q_events_retention_halflife",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(min(date_trunc('day', ts)) AS TIMESTAMP) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             date_diff('day', f.cohort_day,
                       CAST(date_trunc('day', e.ts) AS TIMESTAMP)) AS d
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    ),
    curve AS (
      SELECT CAST(d AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS active
      FROM activity WHERE d BETWEEN 1 AND 7 GROUP BY d
    ),
    lg AS (
      SELECT d,
             CAST(floor(ln(CAST(active AS DOUBLE)) * 1e9 + 0.5)
                  AS BIGINT) AS y9,
             active
      FROM curve
    ),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(d) AS BIGINT) AS sx,
             CAST(SUM(y9) AS BIGINT) AS sy,
             CAST(SUM(d * d) AS BIGINT) AS sxx,
             CAST(SUM(d * y9) AS BIGINT) AS sxy,
             MAX(CASE WHEN d = 1 THEN active END) AS a1
      FROM lg
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM firsts)
    SELECT f.m AS n_days, t.n_users,
           round(CAST(f.a1 AS DOUBLE) / t.n_users, 6) AS day1_retention,
           round((f.m * CAST(f.sxy AS DOUBLE) / 1e9
                  - f.sx * (CAST(f.sy AS DOUBLE) / 1e9))
                 / (f.m * f.sxx - CAST(f.sx AS DOUBLE) * f.sx), 6)
             AS decay_slope,
           round(-0.6931471805599453
                 / ((f.m * CAST(f.sxy AS DOUBLE) / 1e9
                     - f.sx * (CAST(f.sy AS DOUBLE) / 1e9))
                    / (f.m * f.sxx - CAST(f.sx AS DOUBLE) * f.sx)), 4)
             AS half_life_days
    FROM fit f CROSS JOIN tot t
    """,
)
def q_events_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life: fit exponential decay to days 1-7 of the
    cohort-retention curve (ln-linear OLS on active-user counts) and
    report the decay slope plus the half-life −ln2/slope — the single
    number product reviews quote where q_events_retention hands them a
    7-row curve.

    The curve comes from the retention op's exact two-aggregate shape;
    the 7-point fit pins ln(active) onto a 1e9 grid and runs exact
    integer OLS moments (d ≤ 7, nothing can overflow); ln 2 is an
    embedded literal, so the only in-engine transcendentals are the 7
    ln calls on exact integers."""
    e = t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    firsts = e.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            F.datediff(day, F.col("cohort_day")).cast("long").alias("d"),
        )
        .distinct()
    )
    curve = (
        activity.filter((F.col("d") >= 1) & (F.col("d") <= 7))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("active"))
    )
    lg = curve.select(
        "d",
        F.floor(F.log(F.col("active").cast("double")) * 1e9 + 0.5)
        .cast("long")
        .alias("y9"),
        "active",
    )
    fit = lg.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("d").cast("long").alias("sx"),
        F.sum("y9").cast("long").alias("sy"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sxx"),
        F.sum(F.col("d") * F.col("y9")).cast("long").alias("sxy"),
        F.max(F.when(F.col("d") == 1, F.col("active"))).alias("a1"),
    )
    tot = firsts.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    slope = (
        F.col("m") * F.col("sxy").cast("double") / 1e9
        - F.col("sx") * (F.col("sy").cast("double") / 1e9)
    ) / (
        F.col("m") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    return fit.crossJoin(F.broadcast(tot)).select(
        F.col("m").alias("n_days"),
        "n_users",
        F.round(F.col("a1").cast("double") / F.col("n_users"), 6).alias(
            "day1_retention"
        ),
        F.round(slope, 6).alias("decay_slope"),
        F.round(F.lit(-0.6931471805599453) / slope, 4).alias(
            "half_life_days"
        ),
    )
