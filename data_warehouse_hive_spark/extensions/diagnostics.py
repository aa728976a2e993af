"""Diagnostics extensions (round 6): changepoint localization, heavy-tail
estimation, peak detection, robust trend, Welch's t, n-gram novelty,
bloom-prefiltered joins, market-share shift, embedding-dimension health.

The reference (rendiriz/data-warehouse-hive) delegates all query
execution to deployed Hive (backend/hive_manager.py:118-170) and ships no
analytics of its own; these operators extend the engine's
training-data-pipeline and monitoring surface the same way the earlier
extensions/ modules do — every plan derives its statistics from a bounded
rollup (days, months, dims, sampled top-k) so no raw-row global window or
unbounded pair join appears anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from data_warehouse_hive_spark.registry import query
from data_warehouse_hive_spark.tables import spread, t


# ---------------------------------------------------------------------------
# Changepoint localization on the daily event-rate series
# ---------------------------------------------------------------------------


@query(
    "q_events_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY day
    ),
    idx AS (
      SELECT day, n,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
             CAST(SUM(n) OVER (ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM daily
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                   CAST(SUM(n) AS BIGINT) AS s FROM daily),
    scored AS (
      SELECT i AS split_after, strftime(day, '%Y-%m-%d') AS day,
             round(CAST(cum AS DOUBLE) / i, 6) AS mean_left,
             round(CAST(t.s - cum AS DOUBLE) / (t.nd - i), 6) AS mean_right,
             round(sqrt(CAST(i AS DOUBLE) * (t.nd - i) / t.nd)
                   * abs(CAST(cum AS DOUBLE) / i
                         - CAST(t.s - cum AS DOUBLE) / (t.nd - i)), 6)
               AS cusum_stat
      FROM idx CROSS JOIN tot t
      WHERE i < t.nd
    )
    SELECT split_after, day, mean_left, mean_right, cusum_stat
    FROM scored
    ORDER BY cusum_stat DESC, day
    LIMIT 1
    """,
)
def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint localization (binary-segmentation step 1) on
    the daily event-count series: the split maximizing the scaled
    mean-difference statistic sqrt(k(n−k)/n)·|mean_left − mean_right| —
    the query a rate-monitoring pipeline runs when an alert fires and
    you need WHEN the level shifted, not just that it did (the
    companion to q_events_cusum's sequential detector).

    All O(days²)-free: one day-grain hash aggregate off the raw scan,
    then index + running sum over the bounded daily relation and a
    per-split score — O(days) arithmetic, top-1 via TakeOrdered.  Means
    are exact-integer cumsums divided once; the statistic is identical
    IEEE arithmetic both engines, rounded at 6.
    """
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wi = Window.orderBy("day")
    wc = wi.rowsBetween(Window.unboundedPreceding, 0)
    idx = daily.select(
        "day",
        "n",
        F.row_number().over(wi).cast("long").alias("i"),
        F.sum("n").over(wc).cast("long").alias("cum"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("n").cast("long").alias("s"),
    )
    j = idx.crossJoin(broadcast(tot)).filter(F.col("i") < F.col("nd"))
    ml = F.col("cum").cast("double") / F.col("i")
    mr = (F.col("s") - F.col("cum")).cast("double") / (
        F.col("nd") - F.col("i")
    )
    stat = F.round(
        F.sqrt(
            F.col("i").cast("double")
            * (F.col("nd") - F.col("i"))
            / F.col("nd")
        )
        * F.abs(ml - mr),
        6,
    )
    return (
        j.select(
            F.col("i").alias("split_after"),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(ml, 6).alias("mean_left"),
            F.round(mr, 6).alias("mean_right"),
            stat.alias("cusum_stat"),
        )
        .orderBy(F.col("cusum_stat").desc(), "day")
        .limit(1)
    )


# ---------------------------------------------------------------------------
# Heavy-tail exponent (Hill estimator) of the user-activity distribution
# ---------------------------------------------------------------------------

HILL_K = 100  # order statistics used by the Hill estimator


@query(
    "q_events_powerlaw",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    topk AS (
      SELECT c FROM per_user
      ORDER BY c DESC, user_id
      LIMIT {HILL_K + 1}
    ),
    ref AS (SELECT MIN(c) AS c_ref, COUNT(*) AS m FROM topk),
    terms AS (
      SELECT CAST(floor(ln(CAST(t.c AS DOUBLE) / r.c_ref) * 1e9 + 0.5)
                  AS BIGINT) AS q
      FROM topk t CROSS JOIN ref r
      WHERE t.c > r.c_ref
    )
    SELECT r.m - 1 AS k, CAST(r.c_ref AS BIGINT) AS c_kplus1,
           round(1.0 + (r.m - 1)
                 / (CAST(SUM(t.q) AS DOUBLE) / 1e9), 6) AS hill_alpha
    FROM terms t CROSS JOIN ref r
    GROUP BY r.m, r.c_ref
    """,
)
def q_events_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the activity distribution's tail exponent:
    α = 1 + k / Σ ln(c_(i)/c_(k+1)) over the k most active users — the
    standard check that per-user volume is power-law-tailed (it decides
    whether per-key state needs skew handling: α ≤ 2 means the hottest
    keys dominate and salting is mandatory).

    One shuffle for the per-user counts; the k+1 largest counts come
    via orderBy+limit — Spark plans TakeOrderedAndProject, a per-
    partition heap + driver merge, never a global sort.  Each log term
    is quantized onto the 1e9 carrier before the sum (order-independent
    exact integers); k is fixed, so the estimator relation is ≤101 rows
    at any corpus size.
    """
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    topk = (
        per_user.orderBy(F.col("c").desc(), "user_id")
        .limit(HILL_K + 1)
        .select("c")
    )
    ref = topk.agg(
        F.min("c").alias("c_ref"), F.count(F.lit(1)).alias("m")
    )
    terms = (
        topk.crossJoin(broadcast(ref))
        .filter(F.col("c") > F.col("c_ref"))
        .select(
            "m",
            "c_ref",
            F.floor(
                F.log(F.col("c").cast("double") / F.col("c_ref")) * 1e9
                + 0.5
            )
            .cast("long")
            .alias("q"),
        )
    )
    return terms.groupBy("m", "c_ref").agg(
        F.sum("q").alias("qs")
    ).select(
        (F.col("m") - 1).alias("k"),
        F.col("c_ref").cast("long").alias("c_kplus1"),
        F.round(
            1.0
            + (F.col("m") - 1)
            / (F.col("qs").cast("double") / 1e9),
            6,
        ).alias("hill_alpha"),
    )


# ---------------------------------------------------------------------------
# Local-maximum (peak) detection on the daily series
# ---------------------------------------------------------------------------


@query(
    "q_events_peaks",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY day
    ),
    nb AS (
      SELECT day, n,
             lag(n)  OVER (ORDER BY day) AS prev_n,
             lead(n) OVER (ORDER BY day) AS next_n
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n, prev_n, next_n,
           CAST(n - greatest(prev_n, next_n) AS BIGINT) AS prominence
    FROM nb
    WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
      AND n > prev_n AND n > next_n
    ORDER BY day
    """,
)
def q_events_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum detection on the daily event-count series: days
    strictly above both neighbors, with the (integer) prominence over
    the taller neighbor — the load-peak census capacity planning reads
    (which days spiked, and by how much) next to q_events_spikes'
    trailing-mean alerts.

    One day-grain hash aggregate, then lag/lead over the bounded daily
    relation; every comparison is exact integer arithmetic."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.orderBy("day")
    nb = daily.select(
        "day",
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lead("n").over(w).alias("next_n"),
    )
    return (
        nb.filter(
            F.col("prev_n").isNotNull()
            & F.col("next_n").isNotNull()
            & (F.col("n") > F.col("prev_n"))
            & (F.col("n") > F.col("next_n"))
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            "prev_n",
            "next_n",
            (F.col("n") - F.greatest("prev_n", "next_n"))
            .cast("long")
            .alias("prominence"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend over monthly revenue
# ---------------------------------------------------------------------------


@query(
    "q_stats_theil_sen",
    oracle="""
    WITH monthly AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mon,
             CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev6
      FROM orders GROUP BY mon
    ),
    idx AS (
      SELECT mon, rev6,
             CAST(ROW_NUMBER() OVER (ORDER BY mon) AS BIGINT) AS i
      FROM monthly
    ),
    slopes AS (
      SELECT a.i AS ia, b.i AS ib,
             round((CAST(b.rev6 - a.rev6 AS DOUBLE) / 1e6)
                   / (b.i - a.i), 6) AS slope
      FROM idx a JOIN idx b ON b.i > a.i
    ),
    ranked AS (
      SELECT slope,
             CAST(ROW_NUMBER() OVER (ORDER BY slope, ia, ib) AS BIGINT)
               AS rn,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM slopes
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM monthly) AS n_months,
           m AS n_pairs, slope AS theil_sen_slope
    FROM ranked
    WHERE rn = (m + 1) // 2
    """,
)
def q_stats_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of monthly revenue: the median of all
    pairwise slopes — the slope estimator that shrugs off the outlier
    months OLS (q_stats_regression) gets dragged by; the robust
    companion every revenue-trend report should quote.

    The pair join runs over the BOUNDED month rollup (O(months²) pairs
    — dozens, not data-scale), never raw orders; monthly revenue is the
    exact 1e6-carrier sum, each slope a single double division on exact
    integers, and the median is the deterministic ⌈m/2⌉-th order
    statistic with (ia, ib) tiebreak — no averaging convention to
    disagree on."""
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "mon"
        )
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5).cast("long"))
        .cast("long")
        .alias("rev6")
    )
    wi = Window.orderBy("mon")
    idx = monthly.select(
        "mon", "rev6", F.row_number().over(wi).cast("long").alias("i")
    )
    a = idx.select(
        F.col("i").alias("ia"), F.col("rev6").alias("ra")
    )
    b = idx.select(
        F.col("i").alias("ib"), F.col("rev6").alias("rb")
    )
    slopes = (
        a.join(broadcast(b), F.col("ib") > F.col("ia"))
        .select(
            "ia",
            "ib",
            F.round(
                ((F.col("rb") - F.col("ra")).cast("double") / 1e6)
                / (F.col("ib") - F.col("ia")),
                6,
            ).alias("slope"),
        )
    )
    wr = Window.orderBy("slope", "ia", "ib")
    ranked = slopes.select(
        "slope",
        F.row_number().over(wr).cast("long").alias("rn"),
    ).crossJoin(
        broadcast(slopes.agg(F.count(F.lit(1)).cast("long").alias("m")))
    )
    nm = monthly.agg(F.count(F.lit(1)).cast("long").alias("n_months"))
    return (
        ranked.filter(F.col("rn") == F.expr("(m + 1) DIV 2"))
        .crossJoin(broadcast(nm))
        .select(
            "n_months",
            F.col("m").alias("n_pairs"),
            F.col("slope").alias("theil_sen_slope"),
        )
    )


# ---------------------------------------------------------------------------
# Welch's t-test (unequal variances) between two event segments
# ---------------------------------------------------------------------------


@query(
    "q_stats_welch_t",
    oracle="""
    WITH seg AS (
      SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS g,
             CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    m AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v6) AS BIGINT) AS s1,
             CAST(SUM(CAST(v6 AS HUGEINT) * v6) AS HUGEINT) AS s2
      FROM seg GROUP BY g
    ),
    stats AS (
      SELECT g, n,
             CAST(s1 AS DOUBLE) / 1e6 / n AS mean,
             (CAST(s2 AS DOUBLE) / 1e12
              - (CAST(s1 AS DOUBLE) / 1e6)
                * (CAST(s1 AS DOUBLE) / 1e6) / n) / (n - 1) AS var
      FROM m
    )
    SELECT a.n AS n_a, b.n AS n_b,
           round(a.mean, 6) AS mean_a, round(b.mean, 6) AS mean_b,
           round((a.mean - b.mean)
                 / sqrt(a.var / a.n + b.var / b.n), 6) AS t_stat,
           round(((a.var / a.n + b.var / b.n)
                  * (a.var / a.n + b.var / b.n))
                 / ((a.var / a.n) * (a.var / a.n) / (a.n - 1)
                    + (b.var / b.n) * (b.var / b.n) / (b.n - 1)), 6)
             AS welch_df
    FROM (SELECT * FROM stats WHERE g = 'a') a
    CROSS JOIN (SELECT * FROM stats WHERE g = 'b') b
    """,
)
def q_stats_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test ('click' vs 'purchase' event
    values): t statistic plus the Welch–Satterthwaite effective degrees
    of freedom — the parametric two-sample comparison that does NOT
    assume equal variances (its rank-based sibling is
    q_stats_mannwhitney).  t and df are reported; the p-value lookup is
    a client-side table read (no normal/t CDF exists portably in both
    engines, and approximating one with exp() imports libm last-ulp
    variance — the same reason q_stats_kaplan_meier reports
    log-survival).

    One conditional aggregation pass: per-segment n, Σx, Σx² on the
    exact 1e6 carrier (Σx² of 60-bit squares rides DECIMAL(38) — the
    overflow rule from SCALING.md), then pure scalar IEEE arithmetic on
    the two-row relation."""
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.when(F.col("event_type") == "click", "a")
            .otherwise("b")
            .alias("g"),
            F.floor(F.col("value") * 1e6 + 0.5).cast("long").alias("v6"),
        )
    )
    m = e.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v6").cast("long").alias("s1"),
        F.sum(
            F.col("v6").cast("decimal(38,0)") * F.col("v6")
        ).alias("s2"),
    )
    mean = F.col("s1").cast("double") / 1e6 / F.col("n")
    var = (
        F.col("s2").cast("double") / 1e12
        - (F.col("s1").cast("double") / 1e6)
        * (F.col("s1").cast("double") / 1e6)
        / F.col("n")
    ) / (F.col("n") - 1)
    stats = m.select("g", "n", mean.alias("mean"), var.alias("var"))
    a = stats.filter(F.col("g") == "a").select(
        F.col("n").alias("n_a"),
        F.col("mean").alias("mean_a"),
        F.col("var").alias("var_a"),
    )
    b = stats.filter(F.col("g") == "b").select(
        F.col("n").alias("n_b"),
        F.col("mean").alias("mean_b"),
        F.col("var").alias("var_b"),
    )
    sa = F.col("var_a") / F.col("n_a")
    sb = F.col("var_b") / F.col("n_b")
    return a.crossJoin(broadcast(b)).select(
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(
            (F.col("mean_a") - F.col("mean_b")) / F.sqrt(sa + sb), 6
        ).alias("t_stat"),
        F.round(
            ((sa + sb) * (sa + sb))
            / (
                sa * sa / (F.col("n_a") - 1)
                + sb * sb / (F.col("n_b") - 1)
            ),
            6,
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# Cross-split n-gram novelty (train/val leakage & memorization signal)
# ---------------------------------------------------------------------------

_SPLIT_HASH = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
    "::UBIGINT::BIGINT % 10"
)


@query(
    "q_text_ngram_novelty",
    oracle=rf"""
    WITH assigned AS (
      SELECT CASE WHEN {_SPLIT_HASH} < 8 THEN 'train' ELSE 'val' END AS split,
             string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    grams AS (
      SELECT split, u.g
      FROM assigned,
           LATERAL (SELECT unnest(list_transform(
             range(1, greatest(len(toks) - 1, 1)),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g) u
    ),
    train_g AS (SELECT DISTINCT g FROM grams WHERE split = 'train'),
    val_g AS (SELECT DISTINCT g FROM grams WHERE split = 'val'),
    novel AS (
      SELECT v.g FROM val_g v ANTI JOIN train_g t ON t.g = v.g
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM val_g) AS n_val_grams,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM novel) AS n_novel,
           round((SELECT CAST(COUNT(*) AS DOUBLE) FROM novel)
                 / (SELECT COUNT(*) FROM val_g), 6) AS novelty_rate
    """,
)
def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split trigram novelty: the fraction of the val split's
    distinct trigrams never seen in train — the memorization /
    leakage signal an eval-set audit reads before trusting a held-out
    number (low novelty ⇒ the val set is paraphrases of train and the
    eval is contaminated; the n-gram-level companion to
    q_decontaminate's document-level check).

    The split is the same md5(doc_id) hash as q_corpus_datacard, so
    splits are deterministic and engine-identical.  Shape: explode
    trigrams once, distinct per split (map-side combined), then ONE
    left-anti join keyed on the gram — the shuffle carries distinct
    grams, never raw positions, and the anti join is the scalable
    set-difference (no collect, no broadcast of an unbounded side).
    """
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    assigned = d.select(
        F.when(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 10
            < 8,
            "train",
        )
        .otherwise("val")
        .alias("split"),
        F.split(F.trim("text"), r"\s+").alias("toks"),
    )
    grams = assigned.filter(F.size("toks") >= 3).select(
        "split",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 3),"
                " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
            )
        ).alias("g"),
    )
    train_g = (
        grams.filter(F.col("split") == "train").select("g").distinct()
    )
    val_g = grams.filter(F.col("split") == "val").select("g").distinct()
    novel = val_g.join(train_g, "g", "left_anti")
    nv = val_g.agg(F.count(F.lit(1)).cast("long").alias("n_val_grams"))
    nn = novel.agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
    return nv.crossJoin(nn).select(
        "n_val_grams",
        "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_val_grams"), 6
        ).alias("novelty_rate"),
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered join (the runtime-filter pattern, made explicit)
# ---------------------------------------------------------------------------

BLOOM_BITS = 1024
BLOOM_K = 3


def _bloom_pos_spark(key, j: int):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(f"bloom{j}"), key.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % BLOOM_BITS
    )


def _bloom_pos_sql(key: str, j: int) -> str:
    return (
        f"('0x' || substr(md5('bloom{j}' || '|' ||"
        f" CAST({key} AS VARCHAR)), 1, 8))::UBIGINT::BIGINT % {BLOOM_BITS}"
    )


@query(
    "q_join_bloom",
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    ),
    bits AS (
      SELECT DISTINCT p FROM (
        {' UNION ALL '.join(
            f"SELECT {_bloom_pos_sql('c_custkey', j)} AS p FROM dim"
            for j in range(BLOOM_K)
        )}
      )
    ),
    passed AS (
      SELECT o.o_orderkey, o.o_custkey FROM orders o
      WHERE {' AND '.join(
          f"EXISTS (SELECT 1 FROM bits b"
          f" WHERE b.p = {_bloom_pos_sql('o.o_custkey', j)})"
          for j in range(BLOOM_K)
      )}
    ),
    matched AS (
      SELECT p.o_orderkey FROM passed p
      SEMI JOIN dim d ON d.c_custkey = p.o_custkey
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM passed) AS n_passed,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM matched) AS n_matched,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM passed)
             - (SELECT CAST(COUNT(*) AS BIGINT) FROM matched)
             AS n_false_positives,
           round(((SELECT CAST(COUNT(*) AS DOUBLE) FROM passed)
                  - (SELECT COUNT(*) FROM matched))
                 / greatest((SELECT COUNT(*) FROM passed), 1), 6)
             AS fp_rate
    """,
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join prefilter, the runtime-filter pattern made
    explicit: hash the selective dim's keys into a {BLOOM_BITS}-bit /
    {BLOOM_K}-hash bloom set, prefilter the fact side against it, then
    run the exact join only on survivors — with the false-positive
    audit (passed − matched) that tells you whether the filter earned
    its keep.  This is what Spark's own InjectRuntimeFilter does below
    the surface (and what a 100 TB fact⋈selective-dim join lives on:
    the fact shuffle carries only bloom survivors).

    Declarative all the way: the bit set is a ≤{BLOOM_BITS}-row
    relation; membership per hash is a BROADCAST left-semi join, so the
    fact never shuffles for the prefilter, and only survivors reach the
    exact semi join.  md5-derived positions are engine-identical
    (the MinHash idiom); all outputs exact integers.
    """
    dim = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    bits = None
    for j in range(BLOOM_K):
        pj = dim.select(_bloom_pos_spark(F.col("c_custkey"), j).alias("p"))
        bits = pj if bits is None else bits.unionAll(pj)
    bits = bits.distinct()
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    passed = o
    for j in range(BLOOM_K):
        passed = passed.withColumn(
            "_p", _bloom_pos_spark(F.col("o_custkey"), j)
        ).join(
            broadcast(bits.withColumnRenamed("p", "_p")), "_p", "left_semi"
        )
    passed = passed.select("o_orderkey", "o_custkey")
    matched = passed.join(
        dim, passed.o_custkey == dim.c_custkey, "left_semi"
    )
    no = o.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    np_ = passed.agg(F.count(F.lit(1)).cast("long").alias("n_passed"))
    nm = matched.agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
    return (
        no.crossJoin(np_)
        .crossJoin(nm)
        .select(
            "n_orders",
            "n_passed",
            "n_matched",
            (F.col("n_passed") - F.col("n_matched")).alias(
                "n_false_positives"
            ),
            F.round(
                (F.col("n_passed") - F.col("n_matched")).cast("double")
                / F.greatest(F.col("n_passed"), F.lit(1)),
                6,
            ).alias("fp_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Market-share shift (first vs last month, per nation)
# ---------------------------------------------------------------------------


@query(
    "q_orders_share_shift",
    oracle="""
    WITH monthly AS (
      SELECT n.n_name,
             strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS mon,
             CAST(SUM(CAST(floor(o.o_totalprice * 1e6 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev6
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, mon
    ),
    shared AS (
      SELECT n_name, mon, rev6,
             round(CAST(rev6 AS DOUBLE)
                   / SUM(rev6) OVER (PARTITION BY mon), 6) AS share,
             CAST(RANK() OVER (PARTITION BY mon
                               ORDER BY rev6 DESC, n_name) AS BIGINT) AS rnk
      FROM monthly
    ),
    bounds AS (SELECT MIN(mon) AS lo, MAX(mon) AS hi FROM monthly)
    SELECT s.n_name,
           MAX(CASE WHEN s.mon = b.lo THEN s.share END) AS share_first,
           MAX(CASE WHEN s.mon = b.hi THEN s.share END) AS share_last,
           round(coalesce(MAX(CASE WHEN s.mon = b.hi THEN s.share END), 0)
                 - coalesce(MAX(CASE WHEN s.mon = b.lo THEN s.share END), 0),
                 6) AS share_delta,
           MAX(CASE WHEN s.mon = b.lo THEN s.rnk END) AS rank_first,
           MAX(CASE WHEN s.mon = b.hi THEN s.rnk END) AS rank_last
    FROM shared s CROSS JOIN bounds b
    WHERE s.mon = b.lo OR s.mon = b.hi
    GROUP BY s.n_name
    ORDER BY s.n_name
    """,
)
def q_orders_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share shift per nation: revenue share and rank in the
    FIRST month of the data versus the LAST, with the share delta —
    the who-gained-who-lost table every periodic business review opens
    with.

    One fact aggregation (orders ⋈ broadcast customer-nation path →
    month×nation rollup); shares and ranks are windows PARTITIONED BY
    month over the bounded rollup; the first/last comparison is a
    conditional aggregation over two months only.  Revenue rides the
    exact 1e6 carrier; shares divide exact integers."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            F.date_format(
                F.date_trunc("month", "o_orderdate"), "yyyy-MM"
            ).alias("mon"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1e6 + 0.5).cast("long")
            )
            .cast("long")
            .alias("rev6")
        )
    )
    wm = Window.partitionBy("mon")
    wr = Window.partitionBy("mon").orderBy(
        F.col("rev6").desc(), "n_name"
    )
    shared = monthly.select(
        "n_name",
        "mon",
        F.round(
            F.col("rev6").cast("double") / F.sum("rev6").over(wm), 6
        ).alias("share"),
        F.rank().over(wr).cast("long").alias("rnk"),
    )
    bounds = monthly.agg(
        F.min("mon").alias("lo"), F.max("mon").alias("hi")
    )
    s = shared.crossJoin(broadcast(bounds)).filter(
        (F.col("mon") == F.col("lo")) | (F.col("mon") == F.col("hi"))
    )
    first_share = F.max(
        F.when(F.col("mon") == F.col("lo"), F.col("share"))
    )
    last_share = F.max(
        F.when(F.col("mon") == F.col("hi"), F.col("share"))
    )
    return (
        s.groupBy("n_name")
        .agg(
            first_share.alias("share_first"),
            last_share.alias("share_last"),
            F.round(
                F.coalesce(last_share, F.lit(0.0))
                - F.coalesce(first_share, F.lit(0.0)),
                6,
            ).alias("share_delta"),
            F.max(
                F.when(F.col("mon") == F.col("lo"), F.col("rnk"))
            ).alias("rank_first"),
            F.max(
                F.when(F.col("mon") == F.col("hi"), F.col("rnk"))
            ).alias("rank_last"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Embedding-dimension health profile (collapsed/dead-dimension census)
# ---------------------------------------------------------------------------


@query(
    "q_embed_dim_profile",
    oracle="""
    WITH elems AS (
      SELECT u.pos, CAST(floor(CAST(u.val AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
               AS v6
      FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS pos,
                           unnest(embedding) AS val) u
    )
    SELECT CAST(pos - 1 AS BIGINT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(v6) AS DOUBLE) / 1e6 / COUNT(*), 6) AS mean,
           round((CAST(SUM(v6 * v6) AS DOUBLE) / 1e12
                  - (CAST(SUM(v6) AS DOUBLE) / 1e6)
                    * (CAST(SUM(v6) AS DOUBLE) / 1e6) / COUNT(*))
                 / COUNT(*), 6) AS variance,
           round(CAST(SUM(CASE WHEN abs(v6) < 10000 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS frac_near_zero
    FROM elems
    GROUP BY pos
    ORDER BY dim
    """,
)
def q_embed_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health profile: mean, (population)
    variance, and the fraction of values within ±0.01 of zero for each
    of the 64 dimensions — the collapsed-dimension census an embedding
    pipeline runs after every model update (a dimension whose variance
    drops to ~0 carries no information, wastes index space, and skews
    cosine geometry).

    One posexplode + one hash aggregation on the fixed 64-value
    dimension key (map-side combine does nearly all the work; 64 keys
    never skew).  Moments ride the exact 1e6 carrier with Σv² in
    decimal — order-independent exact integers, then identical IEEE
    division both engines."""
    v = spread(
        t(spark, sf_dir, "embeddings").select("embedding"), spark
    )
    elems = v.select(
        F.posexplode("embedding").alias("pos", "val")
    ).select(
        "pos",
        F.floor(F.col("val").cast("double") * 1e6 + 0.5)
        .cast("long")
        .alias("v6"),
    )
    return (
        elems.groupBy("pos")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v6").cast("long").alias("s1"),
            F.sum(F.col("v6").cast("decimal(38,0)") * F.col("v6")).alias(
                "s2"
            ),
            F.sum(F.when(F.abs("v6") < 10000, 1).otherwise(0))
            .cast("long")
            .alias("s_nz"),
        )
        .select(
            F.col("pos").cast("long").alias("dim"),
            "n",
            F.round(
                F.col("s1").cast("double") / 1e6 / F.col("n"), 6
            ).alias("mean"),
            F.round(
                (
                    F.col("s2").cast("double") / 1e12
                    - (F.col("s1").cast("double") / 1e6)
                    * (F.col("s1").cast("double") / 1e6)
                    / F.col("n")
                )
                / F.col("n"),
                6,
            ).alias("variance"),
            F.round(
                F.col("s_nz").cast("double") / F.col("n"), 6
            ).alias("frac_near_zero"),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# Event-lateness audit (the watermark-choosing table)
# ---------------------------------------------------------------------------

LATE_CAP_MIN = 30  # histogram cap: bucket 30 aggregates everything later


@query(
    "q_events_lateness",
    oracle=f"""
    WITH arr AS (
      SELECT user_id, ts,
             MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS UNBOUNDED PRECEDING) AS runmax
      FROM events
    ),
    lat AS (
      SELECT least((epoch_us(runmax) - epoch_us(ts)) // 60000000,
                   {LATE_CAP_MIN}) AS late_min
      FROM arr
    ),
    hist AS (
      SELECT CAST(late_min AS BIGINT) AS late_min,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM lat GROUP BY late_min
    )
    SELECT late_min, n_events,
           round(CAST(SUM(n_events) OVER (ORDER BY late_min
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / SUM(n_events) OVER (), 6) AS cum_frac
    FROM hist
    ORDER BY late_min
    """,
)
def q_events_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-lateness audit: how far behind the per-user running-max
    event time each event arrives (arrival order ≈ event_id), bucketed
    into minutes and capped at {LATE_CAP_MIN} — THE table read before
    choosing a streaming watermark (`withWatermark` threshold = the
    bucket where cum_frac crosses your completeness SLO; everything
    later is dropped state-free).

    One window pass partitioned by user_id (single shuffle over raw
    events — the same key the stream would carry), then an O(cap)-row
    histogram; lateness is exact integer microseconds floored to
    minutes, and the cumulative fraction divides exact integers over
    the bounded histogram."""
    e = t(spark, sf_dir, "events")
    wa = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    arr = e.select(
        "ts", F.max("ts").over(wa).alias("runmax")
    )
    lat = arr.select(
        F.least(
            F.floor(
                (F.unix_micros("runmax") - F.unix_micros("ts")) / 60000000
            ),
            F.lit(LATE_CAP_MIN),
        )
        .cast("long")
        .alias("late_min")
    )
    hist = lat.groupBy("late_min").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    wcum = Window.orderBy("late_min").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.orderBy("late_min").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hist.select(
        "late_min",
        "n_events",
        F.round(
            F.sum("n_events").over(wcum).cast("double")
            / F.sum("n_events").over(wall),
            6,
        ).alias("cum_frac"),
    ).orderBy("late_min")


# ---------------------------------------------------------------------------
# Delta-method CI for a ratio metric (revenue per event)
# ---------------------------------------------------------------------------


@query(
    "q_stats_ratio_ci",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS x6,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM events GROUP BY user_id
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS u,
             CAST(SUM(x6) AS BIGINT) AS sx,
             CAST(SUM(k) AS BIGINT) AS sk,
             CAST(SUM(CAST(x6 AS HUGEINT) * x6) AS HUGEINT) AS sxx,
             CAST(SUM(k * k) AS BIGINT) AS skk,
             CAST(SUM(CAST(x6 AS HUGEINT) * k) AS HUGEINT) AS sxk
      FROM per_user
    )
    SELECT u AS n_users,
           round(CAST(sx AS DOUBLE) / 1e6 / sk, 6) AS ratio,
           round(sqrt(greatest(
               (CAST(sxx AS DOUBLE) / 1e12 / u
                - (CAST(sx AS DOUBLE) / 1e6 / u)
                  * (CAST(sx AS DOUBLE) / 1e6 / u))
               - 2 * (CAST(sx AS DOUBLE) / 1e6 / sk)
                 * (CAST(sxk AS DOUBLE) / 1e6 / u
                    - (CAST(sx AS DOUBLE) / 1e6 / u)
                      * (CAST(sk AS DOUBLE) / u))
               + (CAST(sx AS DOUBLE) / 1e6 / sk)
                 * (CAST(sx AS DOUBLE) / 1e6 / sk)
                 * (CAST(skk AS DOUBLE) / u
                    - (CAST(sk AS DOUBLE) / u) * (CAST(sk AS DOUBLE) / u)),
               0) / u) / (CAST(sk AS DOUBLE) / u), 6) AS std_err
    FROM mom
    """,
)
def q_stats_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error for a RATIO metric (revenue per
    event, user-randomized): se(R) = sqrt(Var(x − R·k)/U) / mean(k) —
    the correction every A/B platform applies because ratio metrics'
    numerator and denominator are correlated per user and the naive
    event-level variance is wrong (the deng-knight ratio-metric rule).

    One per-user rollup (single shuffle), then one moment aggregation:
    Σx, Σk, Σx², Σk², Σxk all on exact carriers (x on 1e6, products in
    HUGEINT/decimal), so the only doubles are the final fixed-order
    scalar expression — identical IEEE both engines."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 1e6 + 0.5).cast("long"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("x6"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    mom = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("u"),
        F.sum("x6").cast("long").alias("sx"),
        F.sum("k").cast("long").alias("sk"),
        F.sum(F.col("x6").cast("decimal(38,0)") * F.col("x6")).alias(
            "sxx"
        ),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("skk"),
        F.sum(F.col("x6").cast("decimal(38,0)") * F.col("k")).alias(
            "sxk"
        ),
    )
    mx = F.col("sx").cast("double") / 1e6 / F.col("u")
    mk = F.col("sk").cast("double") / F.col("u")
    r = F.col("sx").cast("double") / 1e6 / F.col("sk")
    var_x = F.col("sxx").cast("double") / 1e12 / F.col("u") - mx * mx
    cov_xk = F.col("sxk").cast("double") / 1e6 / F.col("u") - mx * mk
    var_k = F.col("skk").cast("double") / F.col("u") - mk * mk
    return mom.select(
        F.col("u").alias("n_users"),
        F.round(r, 6).alias("ratio"),
        F.round(
            F.sqrt(
                F.greatest(
                    var_x - 2 * r * cov_xk + r * r * var_k, F.lit(0.0)
                )
                / F.col("u")
            )
            / mk,
            6,
        ).alias("std_err"),
    )


# ---------------------------------------------------------------------------
# Wilson-interval proportion estimates (return rate per brand)
# ---------------------------------------------------------------------------

_Z95 = 1.96


@query(
    "q_stats_wilson",
    oracle=f"""
    WITH base AS (
      SELECT p.p_brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand
    )
    SELECT p_brand, n, r,
           round(CAST(r AS DOUBLE) / n, 6) AS rate,
           round(((CAST(r AS DOUBLE) / n
                   + CAST({_Z95} AS DOUBLE) * CAST({_Z95} AS DOUBLE)
                     / (2 * n))
                  - CAST({_Z95} AS DOUBLE)
                    * sqrt((CAST(r AS DOUBLE) / n)
                           * (1 - CAST(r AS DOUBLE) / n) / n
                           + CAST({_Z95} AS DOUBLE) * CAST({_Z95} AS DOUBLE)
                             / (4.0 * n * n)))
                 / (1 + CAST({_Z95} AS DOUBLE) * CAST({_Z95} AS DOUBLE) / n),
                 6) AS wilson_lo,
           round(((CAST(r AS DOUBLE) / n
                   + CAST({_Z95} AS DOUBLE) * CAST({_Z95} AS DOUBLE)
                     / (2 * n))
                  + CAST({_Z95} AS DOUBLE)
                    * sqrt((CAST(r AS DOUBLE) / n)
                           * (1 - CAST(r AS DOUBLE) / n) / n
                           + CAST({_Z95} AS DOUBLE) * CAST({_Z95} AS DOUBLE)
                             / (4.0 * n * n)))
                 / (1 + CAST({_Z95} AS DOUBLE) * CAST({_Z95} AS DOUBLE) / n),
                 6) AS wilson_hi
    FROM base
    ORDER BY p_brand
    """,
)
def q_stats_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score interval (95%) for the per-brand return rate — the
    proportion CI that stays inside [0,1] and behaves at small n, which
    is why ranking dashboards sort by wilson_lo instead of the raw rate
    (a brand with 2/2 returns must not outrank one with 90/100).

    One fact⋈part equi-join (optimizer-chosen strategy — part scales
    with SF, so no broadcast hint) + one hash aggregation; the interval
    is fixed-order scalar IEEE arithmetic on two exact integers per
    group, stated identically in both engines."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            )
            .cast("long")
            .alias("r"),
        )
    )
    z = F.lit(_Z95)
    phat = F.col("r").cast("double") / F.col("n")
    center = phat + z * z / (2 * F.col("n"))
    half = z * F.sqrt(
        phat * (1 - phat) / F.col("n")
        + z * z / (4.0 * F.col("n") * F.col("n"))
    )
    denom = 1 + z * z / F.col("n")
    return base.select(
        "p_brand",
        "n",
        "r",
        F.round(phat, 6).alias("rate"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    ).orderBy("p_brand")


# ---------------------------------------------------------------------------
# Periodogram: DFT power at the first K frequencies of the daily series
# ---------------------------------------------------------------------------

PERIODOGRAM_K = 8  # frequencies evaluated (k = 1..K cycles over the range)


@query(
    "q_events_periodogram",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY day
    ),
    idx AS (
      SELECT n, CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE) AS i,
             CAST(COUNT(*) OVER () AS DOUBLE) AS nd
      FROM daily
    ),
    terms AS (
      SELECT k.k,
             CAST(floor(CAST(n AS DOUBLE)
                        * cos(2.0 * pi() * k.k * i / nd) * 1e6 + 0.5)
                  AS BIGINT) AS cq,
             CAST(floor(CAST(n AS DOUBLE)
                        * sin(2.0 * pi() * k.k * i / nd) * 1e6 + 0.5)
                  AS BIGINT) AS sq,
             nd
      FROM idx CROSS JOIN
           (SELECT CAST(unnest(range(1, {PERIODOGRAM_K} + 1)) AS DOUBLE) AS k) k
    )
    SELECT CAST(k AS BIGINT) AS k,
           round(ANY_VALUE(nd) / k, 6) AS period_days,
           round((CAST(SUM(cq) AS DOUBLE) / 1e6) * (CAST(SUM(cq) AS DOUBLE) / 1e6)
                 + (CAST(SUM(sq) AS DOUBLE) / 1e6) * (CAST(SUM(sq) AS DOUBLE) / 1e6),
                 4) AS power
    FROM terms
    GROUP BY k
    ORDER BY k
    """,
)
def q_events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram of the daily event-count series: DFT power at the
    first K integer frequencies — the seasonality detector that tells a
    pipeline WHICH period to hand q_events_seasonal / Holt-Winters
    (k with the dominant power ⇒ period ≈ n_days/k).

    Cost model: one day-grain hash aggregate off the raw scan, then the
    bounded O(days) rollup cross-joins the K frequency constants —
    O(days·K) arithmetic on driver-sized data; nothing else touches the
    corpus.  Determinism: cos/sin are evaluated on bit-identical double
    arguments (exact integer i, k, nd promoted once), each term is
    quantized to a 1e6-grid long BEFORE summation (associative integer
    adds, any partitioning), and the final power is two fixed-order
    double ops rounded at 4.
    """
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wi = Window.orderBy("day")
    idx = daily.select(
        "n",
        F.row_number().over(wi).cast("double").alias("i"),
        F.count(F.lit(1)).over(
            Window.partitionBy()  # bounded daily rollup: O(days) rows
        ).cast("double").alias("nd"),
    )
    ks = spark.range(1, PERIODOGRAM_K + 1).select(
        F.col("id").cast("double").alias("k")
    )
    ang = F.lit(2.0) * F.lit(math.pi) * F.col("k") * F.col("i") / F.col("nd")
    terms = idx.crossJoin(broadcast(ks)).select(
        "k",
        "nd",
        F.floor(F.col("n").cast("double") * F.cos(ang) * 1e6 + 0.5)
        .cast("long")
        .alias("cq"),
        F.floor(F.col("n").cast("double") * F.sin(ang) * 1e6 + 0.5)
        .cast("long")
        .alias("sq"),
    )
    c = F.sum("cq").cast("double") / 1e6
    s = F.sum("sq").cast("double") / 1e6
    return (
        terms.groupBy("k")
        .agg(
            F.round(F.any_value("nd") / F.col("k"), 6).alias("period_days"),
            F.round(c * c + s * s, 4).alias("power"),
        )
        .select(F.col("k").cast("long").alias("k"), "period_days", "power")
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Markov entropy rate of the behavior transition matrix
# ---------------------------------------------------------------------------


@query(
    "q_events_markov_entropy",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type AS src, event_type AS dst,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    outdeg AS (SELECT src, CAST(SUM(n) AS BIGINT) AS out_n
               FROM trans GROUP BY src),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM trans),
    terms AS (
      SELECT t.src, o.out_n,
             CAST(floor((CAST(t.n AS DOUBLE) / o.out_n)
                        * (ln(CAST(t.n AS DOUBLE) / o.out_n) / ln(2.0))
                        * 1e9 + 0.5) AS BIGINT) AS hq
      FROM trans t JOIN outdeg o ON o.src = t.src
    )
    SELECT s.src, s.out_n,
           round(CAST(s.out_n AS DOUBLE) / x.t, 6) AS pi,
           round(-(CAST(SUM(s.hq) AS DOUBLE) / 1e9), 6) AS h_bits,
           round(-(CAST(SUM(s.hq) AS DOUBLE) / 1e9)
                 * (CAST(s.out_n AS DOUBLE) / x.t), 6) AS contribution
    FROM terms s CROSS JOIN tot x
    GROUP BY s.src, s.out_n, x.t
    ORDER BY s.src
    """,
)
def q_events_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the first-order behavior Markov chain: per source
    state, the conditional next-step entropy H(dst|src) in bits and its
    occupancy-weighted contribution — Σ contribution is the chain's
    entropy rate under the empirical state distribution.  Low-entropy
    states have predictable next actions (prefetchable / cacheable);
    the diagnostic that decides whether a next-event model is worth
    training at all.

    Same heavy/light split as q_events_markov: the only corpus-sized
    work is the per-user lag window; everything downstream lives on the
    O(|types|²) transition relation.  Each −p·log₂p term is quantized to
    a 1e9-grid long on an exactly-representable ratio (n/out_n is one
    IEEE division of two longs), so the per-source sums are associative
    integer adds; pi and the contribution are fixed-order double ops
    rounded at 6.
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("src"), F.col("event_type").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    outdeg = trans.groupBy(F.col("src").alias("o_src")).agg(
        F.sum("n").cast("long").alias("out_n")
    )
    tot = trans.agg(F.sum("n").cast("long").alias("t"))
    p = F.col("n").cast("double") / F.col("out_n")
    terms = (
        trans.join(broadcast(outdeg), F.col("o_src") == F.col("src"))
        .select(
            "src",
            "out_n",
            F.floor(p * (F.log(p) / F.log(F.lit(2.0))) * 1e9 + 0.5)
            .cast("long")
            .alias("hq"),
        )
    )
    h = -(F.sum("hq").cast("double") / 1e9)
    return (
        terms.crossJoin(broadcast(tot))
        .groupBy("src", "out_n", "t")
        .agg(
            F.round(F.col("out_n").cast("double") / F.col("t"), 6).alias("pi"),
            F.round(h, 6).alias("h_bits"),
            F.round(
                h * (F.col("out_n").cast("double") / F.col("t")), 6
            ).alias("contribution"),
        )
        .select("src", "out_n", "pi", "h_bits", "contribution")
        .orderBy("src")
    )


# ---------------------------------------------------------------------------
# Schema/profile drift between two time slices of a table
# ---------------------------------------------------------------------------

DRIFT_SPLIT_DATE = "1998-01-01"  # early vs late slice boundary
PRICE_BIN = 20000.0  # fixed-width bin for the numeric column's category map


@query(
    "q_dq_schema_drift",
    oracle=f"""
    WITH keyed AS (
      SELECT CASE WHEN o_orderdate < DATE '{DRIFT_SPLIT_DATE}'
                  THEN 0 ELSE 1 END AS late,
             col, key
      FROM orders,
           LATERAL (VALUES
             ('o_orderstatus',   o_orderstatus),
             ('o_orderpriority', o_orderpriority),
             ('o_totalprice',    CAST(CAST(floor(o_totalprice / {PRICE_BIN})
                                            AS BIGINT) AS VARCHAR))
           ) u(col, key)
    ),
    counts AS (
      SELECT col, key,
             CAST(SUM(1 - late) AS BIGINT) AS n_early,
             CAST(SUM(late) AS BIGINT) AS n_late
      FROM keyed GROUP BY col, key
    ),
    tots AS (
      SELECT col, CAST(SUM(n_early) AS BIGINT) AS t_early,
                  CAST(SUM(n_late) AS BIGINT) AS t_late
      FROM counts GROUP BY col
    )
    SELECT c.col,
           CAST(COUNT(*) AS BIGINT) AS n_cats,
           ANY_VALUE(t.t_early) AS t_early,
           ANY_VALUE(t.t_late) AS t_late,
           round(CAST(SUM(CAST(floor(abs(CAST(c.n_early AS DOUBLE) / t.t_early
                                      - CAST(c.n_late AS DOUBLE) / t.t_late)
                                 * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 2e9, 6) AS tvd
    FROM counts c JOIN tots t ON t.col = c.col
    GROUP BY c.col
    ORDER BY c.col
    """,
)
def q_dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two time slices of a table, one total
    variation distance (TVD) per monitored column — the scheduled data-
    quality job that catches upstream schema/population changes (a new
    enum value, a price-mix shift) before they poison training data.
    Categorical columns compare share vectors directly; the numeric
    column is mapped through fixed-width bins so the same TVD works.

    One corpus scan: the per-row stack explodes to 3 rows/row (bounded
    fan-out, no joins), then a hash aggregate on the small
    (col, key) domain; shares and |Δ| live on the O(cats) rollup.  Each
    |share_early − share_late| is quantized to a 1e9 long (shares are
    single IEEE divisions of exact longs), so the per-column sum is
    associative integer addition; TVD = Σ/2 rounded at 6.
    """
    o = t(spark, sf_dir, "orders")
    late = F.when(
        F.col("o_orderdate") < F.lit(DRIFT_SPLIT_DATE).cast("date"), 0
    ).otherwise(1)
    keyed = o.select(
        late.alias("late"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_orderstatus").alias("col"),
                    F.col("o_orderstatus").alias("key"),
                ),
                F.struct(
                    F.lit("o_orderpriority").alias("col"),
                    F.col("o_orderpriority").alias("key"),
                ),
                F.struct(
                    F.lit("o_totalprice").alias("col"),
                    F.floor(F.col("o_totalprice") / PRICE_BIN)
                    .cast("long")
                    .cast("string")
                    .alias("key"),
                ),
            )
        ).alias("ck"),
    ).select("late", F.col("ck.col").alias("col"), F.col("ck.key").alias("key"))
    counts = keyed.groupBy("col", "key").agg(
        F.sum(F.lit(1) - F.col("late")).cast("long").alias("n_early"),
        F.sum("late").cast("long").alias("n_late"),
    )
    tots = counts.groupBy(F.col("col").alias("t_col")).agg(
        F.sum("n_early").cast("long").alias("t_early"),
        F.sum("n_late").cast("long").alias("t_late"),
    )
    dq = F.floor(
        F.abs(
            F.col("n_early").cast("double") / F.col("t_early")
            - F.col("n_late").cast("double") / F.col("t_late")
        )
        * 1e9
        + 0.5
    ).cast("long")
    return (
        counts.join(broadcast(tots), F.col("t_col") == F.col("col"))
        .groupBy("col")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cats"),
            F.any_value("t_early").alias("t_early"),
            F.any_value("t_late").alias("t_late"),
            F.round(F.sum(dq).cast("double") / 2e9, 6).alias("tvd"),
        )
        .orderBy("col")
    )


# ---------------------------------------------------------------------------
# M4 time-series downsampling (min/max/first/last per bucket)
# ---------------------------------------------------------------------------

M4_BUCKET_DAYS = 2  # bucket width of the downsampled series


@query(
    "q_time_downsample_m4",
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
             CAST(floor(CAST(epoch_us(ts) AS DOUBLE)
                        / ({M4_BUCKET_DAYS} * 86400e6)) AS BIGINT) AS bucket,
             ts, event_id, value
      FROM events
    ),
    rnk AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM pts
    )
    SELECT event_type, bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(MIN(value), 6) AS v_min,
           round(MAX(value), 6) AS v_max,
           round(MAX(CASE WHEN rn_a = 1 THEN value END), 6) AS v_first,
           round(MAX(CASE WHEN rn_d = 1 THEN value END), 6) AS v_last
    FROM rnk
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def q_time_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling of the per-type value stream: min / max / first /
    last per fixed-width time bucket — the error-free line-chart
    downsampler (every pixel column's extremes and endpoints survive),
    and the rollup a monitoring store keeps when raw points age out.

    One window shuffle on (event_type, bucket) — the same partitioning
    the final aggregate reuses, so Spark plans a single exchange; bucket
    width is fixed, so partition count grows with the time range, never
    with per-bucket density skew beyond what AQE splits.  min/max/first/
    last copy raw doubles without arithmetic (rounded only for display),
    so there is no carrier to manage; first/last ties break on
    (ts, event_id), identical both engines.
    """
    e = t(spark, sf_dir, "events")
    pts = e.select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")).cast("double")
            / (M4_BUCKET_DAYS * 86400e6)
        )
        .cast("long")
        .alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    wa = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    rnk = pts.select(
        "*",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        rnk.groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("value"), 6).alias("v_min"),
            F.round(F.max("value"), 6).alias("v_max"),
            F.round(
                F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 6
            ).alias("v_first"),
            F.round(
                F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 6
            ).alias("v_last"),
        )
        .orderBy("event_type", "bucket")
    )


# ---------------------------------------------------------------------------
# Partial autocorrelation (Durbin-Levinson on lagged-pair correlations)
# ---------------------------------------------------------------------------

_O_ACF_LAG = """
    acf{k} AS (
      SELECT round((kd * sxy - sx * sy)
                   / (sqrt(kd * sxx - sx * sx) * sqrt(kd * syy - sy * sy)),
                   9) AS r
      FROM (
        SELECT CAST(COUNT(*) AS DOUBLE) AS kd,
               CAST(SUM(n) AS DOUBLE) AS sx,
               CAST(SUM(prev_n) AS DOUBLE) AS sy,
               CAST(SUM(n * prev_n) AS DOUBLE) AS sxy,
               CAST(SUM(n * n) AS DOUBLE) AS sxx,
               CAST(SUM(prev_n * prev_n) AS DOUBLE) AS syy
        FROM (
          SELECT n, LAG(n, {k}) OVER (ORDER BY day) AS prev_n FROM daily
        ) WHERE prev_n IS NOT NULL
      )
    )"""


@query(
    "q_stats_pacf",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY day
    ),
    {_O_ACF_LAG.format(k=1)},
    {_O_ACF_LAG.format(k=2)},
    {_O_ACF_LAG.format(k=3)},
    dl AS (
      SELECT a1.r AS r1, a2.r AS r2, a3.r AS r3,
             a1.r AS p1,
             (a2.r - a1.r * a1.r) / (1.0 - a1.r * a1.r) AS p2
      FROM acf1 a1 CROSS JOIN acf2 a2 CROSS JOIN acf3 a3
    ),
    dl2 AS (
      SELECT *, r1 - p2 * r1 AS a21,
             (1.0 - r1 * r1) * (1.0 - p2 * p2) AS v2
      FROM dl
    ),
    final AS (
      SELECT r1, r2, r3, p1, p2,
             (r3 - a21 * r2 - p2 * r1) / v2 AS p3
      FROM dl2
    )
    SELECT u.lag, round(u.acf, 6) AS acf, round(u.pacf, 6) AS pacf
    FROM final, LATERAL (VALUES (1, r1, p1), (2, r2, p2), (3, r3, p3))
                  u(lag, acf, pacf)
    ORDER BY u.lag
    """,
)
def q_stats_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily event-count series at lags
    1–3 via the Durbin-Levinson recursion — the AR-order chooser (ACF
    says 'correlated with 2 days ago'; PACF says whether that is a real
    lag-2 effect or just lag-1 applied twice), the companion diagnostic
    to q_stats_autocorr and the input an AR-model forecast would need.
    Sample ACF here is the lagged-pair Pearson correlation (the
    q_stats_autocorr variant), so every r_k comes from exact integer
    sums over the bounded daily rollup.

    All corpus work is the one day-grain hash aggregate; the three
    lag windows and the DL algebra run on O(days) rows and a 1-row
    relation.  Every r_k is rounded at 9 before the recursion (pinning
    the engines to identical inputs), the recursion is fixed-order
    scalar IEEE arithmetic, and outputs round at 6.
    """
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.orderBy("day")

    def acf(k: int):
        lagged = daily.select(
            "n", F.lag("n", k).over(w).alias("prev_n")
        ).filter(F.col("prev_n").isNotNull())
        m = lagged.agg(
            F.count(F.lit(1)).cast("double").alias("kd"),
            F.sum("n").cast("double").alias("sx"),
            F.sum("prev_n").cast("double").alias("sy"),
            F.sum(F.col("n") * F.col("prev_n")).cast("double").alias("sxy"),
            F.sum(F.col("n") * F.col("n")).cast("double").alias("sxx"),
            F.sum(F.col("prev_n") * F.col("prev_n"))
            .cast("double")
            .alias("syy"),
        )
        return m.select(
            F.round(
                (F.col("kd") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (
                    F.sqrt(F.col("kd") * F.col("sxx") - F.col("sx") * F.col("sx"))
                    * F.sqrt(
                        F.col("kd") * F.col("syy") - F.col("sy") * F.col("sy")
                    )
                ),
                9,
            ).alias(f"r{k}")
        )

    dl = (
        acf(1)
        .crossJoin(broadcast(acf(2)))
        .crossJoin(broadcast(acf(3)))
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    p2 = (r2 - r1 * r1) / (F.lit(1.0) - r1 * r1)
    dl2 = dl.select(
        r1,
        r2,
        r3,
        p2.alias("p2"),
        (r1 - p2 * r1).alias("a21"),
        ((F.lit(1.0) - r1 * r1) * (F.lit(1.0) - p2 * p2)).alias("v2"),
    )
    final = dl2.select(
        "r1",
        "r2",
        "r3",
        "p2",
        ((r3 - F.col("a21") * r2 - F.col("p2") * r1) / F.col("v2")).alias(
            "p3"
        ),
    )
    return final.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("lag"),
                    F.col("r1").alias("acf"),
                    F.col("r1").alias("pacf"),
                ),
                F.struct(
                    F.lit(2).alias("lag"),
                    F.col("r2").alias("acf"),
                    F.col("p2").alias("pacf"),
                ),
                F.struct(
                    F.lit(3).alias("lag"),
                    F.col("r3").alias("acf"),
                    F.col("p3").alias("pacf"),
                ),
            )
        ).alias("u")
    ).select(
        F.col("u.lag").alias("lag"),
        F.round("u.acf", 6).alias("acf"),
        F.round("u.pacf", 6).alias("pacf"),
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# Burstiness / Fano factor of inter-arrival times per event type
# ---------------------------------------------------------------------------


@query(
    "q_events_burstiness",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap_us) AS DOUBLE) AS s,
             CAST(SUM(CAST(gap_us AS HUGEINT) * gap_us) AS DOUBLE) AS ss
      FROM seq WHERE gap_us IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, n,
           round(s / n / 1e6, 6) AS mean_gap_s,
           round(sqrt((ss - s / n * s) / (n - 1)) / 1e6, 6) AS std_gap_s,
           round((sqrt((ss - s / n * s) / (n - 1)) - s / n)
                 / (sqrt((ss - s / n * s) / (n - 1)) + s / n), 6)
             AS burstiness,
           round((ss - s / n * s) / (n - 1) / (s / n) / 1e6, 6)
             AS fano_s
    FROM m
    ORDER BY event_type
    """,
)
def q_events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness coefficient B = (σ−μ)/(σ+μ) and Fano factor of
    inter-arrival gaps per event type — the single-number
    characterization of an arrival process (B≈−1 periodic, 0 Poisson,
    →1 heavy bursts) that sizes streaming buffers and picks watermark
    slack; the distribution-summary complement to
    q_events_interarrival's histogram.

    One window pass partitioned by event_type (the established per-type
    stream shuffle), then exact moments: gaps are exact µs longs, the
    squared sum rides int128/DECIMAL(38) since µs² overflows a long,
    and every output is fixed-order double math on those exact sums,
    rounded at 6.
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    m = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gap_us").cast("double").alias("s"),
        F.sum(F.col("gap_us").cast("decimal(38,0)") * F.col("gap_us"))
        .cast("double")
        .alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    var = (F.col("ss") - mean * F.col("s")) / (F.col("n") - 1)
    std = F.sqrt(var)
    return m.select(
        "event_type",
        "n",
        F.round(mean / 1e6, 6).alias("mean_gap_s"),
        F.round(std / 1e6, 6).alias("std_gap_s"),
        F.round((std - mean) / (std + mean), 6).alias("burstiness"),
        F.round(var / mean / 1e6, 6).alias("fano_s"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Levene's test (mean-based): variance homogeneity across groups
# ---------------------------------------------------------------------------


@query(
    "q_stats_levene",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    gm AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS sx
      FROM q GROUP BY event_type
    ),
    z AS (
      SELECT q.event_type,
             CAST(floor(abs(CAST(q.xq AS DOUBLE)
                            - CAST(g.sx AS DOUBLE) / g.n) + 0.5)
                  AS BIGINT) AS zq
      FROM q JOIN gm g ON g.event_type = q.event_type
    ),
    zg AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(zq) AS BIGINT) AS sz,
             CAST(SUM(zq * zq) AS BIGINT) AS szz
      FROM z GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt,
             CAST(SUM(sz) AS BIGINT) AS szt,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM zg
    ),
    terms AS (
      SELECT
        CAST(floor(g.n * (CAST(g.sz AS DOUBLE) / g.n
                          - CAST(t.szt AS DOUBLE) / t.nt)
                       * (CAST(g.sz AS DOUBLE) / g.n
                          - CAST(t.szt AS DOUBLE) / t.nt) + 0.5)
             AS BIGINT) AS ssb_q,
        CAST(floor(CAST(g.szz AS DOUBLE)
                   - CAST(g.sz AS DOUBLE) * (CAST(g.sz AS DOUBLE) / g.n)
                   + 0.5) AS BIGINT) AS ssw_q,
        t.nt, t.k
      FROM zg g CROSS JOIN tot t
    )
    SELECT k, nt AS n,
           round((CAST(nt - k AS DOUBLE) / (k - 1))
                 * (CAST(SUM(ssb_q) AS DOUBLE) / CAST(SUM(ssw_q) AS DOUBLE)),
                 6) AS levene_w
    FROM terms
    GROUP BY k, nt
    """,
)
def q_stats_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's test (mean-based variant) for variance homogeneity of
    `value` across event types: one-way ANOVA's F statistic applied to
    the absolute deviations z = |x − x̄_group| — large W means the
    groups' SPREADS differ, which is the assumption check both ANOVA
    and the pooled t-test quietly require (q_stats_anova tests means;
    this tests the variances it assumed equal).

    Two corpus passes sharing the event_type partitioning: group
    moments, then deviations re-aggregated per group.  Every between/
    within term is quantized onto the integer grid BEFORE the cross-
    group sums (n·(z̄_g−z̄)² and SSW_g fit longs comfortably at any
    tested SF), so the final W is fixed-order double math on exact
    integer sums, rounded at 6 — no cross-row double accumulation
    anywhere.
    """
    e = t(spark, sf_dir, "events")
    q = e.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    gm = q.groupBy(F.col("event_type").alias("g_type")).agg(
        F.count(F.lit(1)).cast("long").alias("gn"),
        F.sum("xq").cast("long").alias("gsx"),
    )
    z = q.join(broadcast(gm), F.col("g_type") == F.col("event_type")).select(
        "event_type",
        F.floor(
            F.abs(
                F.col("xq").cast("double")
                - F.col("gsx").cast("double") / F.col("gn")
            )
            + 0.5
        )
        .cast("long")
        .alias("zq"),
    )
    zg = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("zq").cast("long").alias("sz"),
        F.sum(F.col("zq") * F.col("zq")).cast("long").alias("szz"),
    )
    tot = zg.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("sz").cast("long").alias("szt"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    mean_g = F.col("sz").cast("double") / F.col("n")
    mean_t = F.col("szt").cast("double") / F.col("nt")
    terms = zg.crossJoin(broadcast(tot)).select(
        "nt",
        "k",
        F.floor(F.col("n") * (mean_g - mean_t) * (mean_g - mean_t) + 0.5)
        .cast("long")
        .alias("ssb_q"),
        F.floor(
            F.col("szz").cast("double") - F.col("sz").cast("double") * mean_g
            + 0.5
        )
        .cast("long")
        .alias("ssw_q"),
    )
    return (
        terms.groupBy("k", "nt")
        .agg(
            F.round(
                ((F.col("nt") - F.col("k")).cast("double") / (F.col("k") - 1))
                * (
                    F.sum("ssb_q").cast("double")
                    / F.sum("ssw_q").cast("double")
                ),
                6,
            ).alias("levene_w")
        )
        .select("k", F.col("nt").alias("n"), "levene_w")
    )


# ---------------------------------------------------------------------------
# Trend / seasonal strength of the daily series (decomposition quality)
# ---------------------------------------------------------------------------


@query(
    "q_stats_seasonal_strength",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY day
    ),
    ma AS (
      SELECT day, n,
             date_diff('day', DATE '1970-01-01', day) % 7 AS dow,
             CAST(COUNT(*) OVER w AS BIGINT) AS win_n,
             CAST(SUM(n) OVER w AS BIGINT) AS win_s
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    detr AS (
      SELECT day, dow, n * 1000000 AS nq,
             n * 1000000
               - CAST(floor(CAST(win_s AS DOUBLE) / win_n * 1e6 + 0.5)
                      AS BIGINT) AS dq
      FROM ma WHERE win_n = 7
    ),
    seas AS (
      SELECT dow, CAST(floor(CAST(SUM(dq) AS DOUBLE) / COUNT(*) + 0.5)
                       AS BIGINT) AS sq
      FROM detr GROUP BY dow
    ),
    comp AS (
      SELECT d.dq - s.sq AS rq, d.dq AS dq, d.nq - s.sq AS trq
      FROM detr d JOIN seas s ON s.dow = d.dow
    ),
    v AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(rq) AS BIGINT) AS s_r,
             CAST(SUM(CAST(rq AS HUGEINT) * rq) AS DOUBLE) AS ss_r,
             CAST(SUM(dq) AS BIGINT) AS s_d,
             CAST(SUM(CAST(dq AS HUGEINT) * dq) AS DOUBLE) AS ss_d,
             CAST(SUM(trq) AS BIGINT) AS s_t,
             CAST(SUM(CAST(trq AS HUGEINT) * trq) AS DOUBLE) AS ss_t
      FROM comp
    )
    SELECT m AS n_days,
           round(greatest(0.0, 1.0 -
             (ss_r - CAST(s_r AS DOUBLE) / m * s_r)
             / (ss_t - CAST(s_t AS DOUBLE) / m * s_t)), 6)
             AS trend_strength,
           round(greatest(0.0, 1.0 -
             (ss_r - CAST(s_r AS DOUBLE) / m * s_r)
             / (ss_d - CAST(s_d AS DOUBLE) / m * s_d)), 6)
             AS seasonal_strength
    FROM v
    """,
)
def q_stats_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend and seasonal STRENGTH (the Hyndman FPP measures,
    F = max(0, 1 − Var(remainder)/Var(component + remainder))) of the
    daily event-count series under a 7-day MA × day-of-week additive
    decomposition — the single-number answer to 'is this series
    actually seasonal enough to justify a seasonal model', grading the
    decomposition q_orders_seasonal_decompose performs and gating which
    forecaster (SMA vs Holt vs seasonal) the pipeline picks.

    All corpus work is the one day-grain hash aggregate; the MA window,
    day-of-week means, and the three variances live on the bounded
    O(days) rollup.  Every component rides a 1e6-scaled long grid
    (trend/seasonal means re-floored onto it), squared sums go through
    int128/DECIMAL(38), and both strengths are fixed-order double math
    on exact sums, rounded at 6.
    """
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "n",
        (F.datediff("day", F.lit("1970-01-01").cast("date")) % 7).alias(
            "dow"
        ),
        F.count(F.lit(1)).over(w).cast("long").alias("win_n"),
        F.sum("n").over(w).cast("long").alias("win_s"),
    )
    detr = ma.filter(F.col("win_n") == 7).select(
        "dow",
        (F.col("n") * 1000000).alias("nq"),
        (
            F.col("n") * 1000000
            - F.floor(
                F.col("win_s").cast("double") / F.col("win_n") * 1e6 + 0.5
            ).cast("long")
        ).alias("dq"),
    )
    seas = detr.groupBy(F.col("dow").alias("s_dow")).agg(
        F.floor(F.sum("dq").cast("double") / F.count(F.lit(1)) + 0.5)
        .cast("long")
        .alias("sq")
    )
    comp = detr.join(broadcast(seas), F.col("s_dow") == F.col("dow")).select(
        (F.col("dq") - F.col("sq")).alias("rq"),
        "dq",
        (F.col("nq") - F.col("sq")).alias("trq"),
    )

    def moments(c: str):
        return [
            F.sum(c).cast("long").alias(f"s_{c}"),
            F.sum(F.col(c).cast("decimal(38,0)") * F.col(c))
            .cast("double")
            .alias(f"ss_{c}"),
        ]

    v = comp.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        *moments("rq"),
        *moments("dq"),
        *moments("trq"),
    )

    def css(c: str):
        return F.col(f"ss_{c}") - F.col(f"s_{c}").cast("double") / F.col(
            "m"
        ) * F.col(f"s_{c}")

    return v.select(
        F.col("m").alias("n_days"),
        F.round(
            F.greatest(F.lit(0.0), F.lit(1.0) - css("rq") / css("trq")), 6
        ).alias("trend_strength"),
        F.round(
            F.greatest(F.lit(0.0), F.lit(1.0) - css("rq") / css("dq")), 6
        ).alias("seasonal_strength"),
    )


# ---------------------------------------------------------------------------
# QQ deciles: quantile-quantile comparison of two distributions
# ---------------------------------------------------------------------------


@query(
    "q_stats_qq_deciles",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    h AS (
      SELECT event_type, xq, CAST(COUNT(*) AS BIGINT) AS c
      FROM q GROUP BY event_type, xq
    ),
    cum AS (
      SELECT event_type, xq,
             CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY xq
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM h
    ),
    picks AS (
      SELECT c.event_type, d.dec,
             MIN(c.xq) AS qx
      FROM cum c CROSS JOIN
           (SELECT unnest(range(1, 10)) AS dec) d
      WHERE c.cum * 10 >= d.dec * c.n
      GROUP BY c.event_type, d.dec
    )
    SELECT a.dec AS decile,
           round(a.qx / 100.0, 2) AS q_click,
           round(b.qx / 100.0, 2) AS q_purchase,
           round((b.qx - a.qx) / 100.0, 2) AS gap
    FROM picks a JOIN picks b ON b.dec = a.dec
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    ORDER BY a.dec
    """,
)
def q_stats_qq_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QQ comparison at the deciles: the d/10-quantile of click values
    against the same quantile of purchase values, plus the gap — the
    distribution-shape diagnostic that tells you WHERE two populations
    differ (a gap only in the upper deciles = heavy-tail divergence;
    uniform gaps = location shift), complementing q_stats_ks's single
    worst-gap number and q_stats_mannwhitney's rank test.

    Quantiles come from the per-distinct-value histogram + running
    count — the midrank machinery, NOT a global row sort: the only
    corpus shuffle is the (type, value) hash aggregate; the cumulative
    window runs over O(distinct values) rows.  The decile pick is the
    exact lower quantile via integer comparison (cum·10 ≥ d·n — no
    float thresholds), so both engines select identical cents values.
    """
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    h = e.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    ).groupBy("event_type", "xq").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wc = Window.partitionBy("event_type").orderBy("xq").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("event_type")
    cum = h.select(
        "event_type",
        "xq",
        F.sum("c").over(wc).cast("long").alias("cum"),
        F.sum("c").over(wn).cast("long").alias("n"),
    )
    decs = spark.range(1, 10).select(F.col("id").cast("long").alias("dec"))
    picks = (
        cum.crossJoin(broadcast(decs))
        .filter(F.col("cum") * 10 >= F.col("dec") * F.col("n"))
        .groupBy("event_type", "dec")
        .agg(F.min("xq").alias("qx"))
    )
    a = picks.filter(F.col("event_type") == "click").select(
        "dec", F.col("qx").alias("qa")
    )
    b = picks.filter(F.col("event_type") == "purchase").select(
        F.col("dec").alias("b_dec"), F.col("qx").alias("qb")
    )
    return (
        a.join(b, F.col("b_dec") == F.col("dec"))
        .select(
            F.col("dec").alias("decile"),
            F.round(F.col("qa") / 100.0, 2).alias("q_click"),
            F.round(F.col("qb") / 100.0, 2).alias("q_purchase"),
            F.round((F.col("qb") - F.col("qa")) / 100.0, 2).alias("gap"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# A/B power analysis: required sample size per arm for a target MDE
# ---------------------------------------------------------------------------

_Z_ALPHA = 1.959963985  # two-sided alpha = 0.05
_Z_BETA = 0.8416212336  # power = 0.80
_POWER_MDES = (0.01, 0.02, 0.05, 0.10)  # relative minimum detectable effects


@query(
    "q_stats_power",
    oracle=f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sx,
             CAST(SUM(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
                           AS HUGEINT)
                      * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
               AS sxx
      FROM events WHERE event_type = 'purchase'
    )
    SELECT CAST(u.mde * 100 AS BIGINT) AS mde_pct,
           round(u.mde * (CAST(m.sx AS DOUBLE) / m.n / 100.0), 4) AS delta,
           CAST(ceil(
             2.0 * ({_Z_ALPHA} + {_Z_BETA}) * ({_Z_ALPHA} + {_Z_BETA})
             * ((m.sxx - CAST(m.sx AS DOUBLE) / m.n * m.sx) / (m.n - 1)
                / 10000.0)
             / (u.mde * (CAST(m.sx AS DOUBLE) / m.n / 100.0)
                * (u.mde * (CAST(m.sx AS DOUBLE) / m.n / 100.0)))
           ) AS BIGINT) AS n_per_arm
    FROM m, LATERAL (VALUES {", ".join(f"({x})" for x in _POWER_MDES)})
              u(mde)
    ORDER BY mde_pct
    """,
)
def q_stats_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B power analysis on the purchase-value metric: the sample size
    each arm needs to detect a 1/2/5/10% relative lift at alpha=0.05,
    power=0.80 — n = 2(z_a+z_b)^2 sigma^2/delta^2 — the pre-experiment
    planning query q_stats_welch_t's post-experiment test assumes
    someone ran; using LAST period's variance makes it the standing
    'how long must this test run' dashboard.

    One conditional scan for the exact carrier moments (cents sums,
    int128 squares), then four rows of fixed-order scalar arithmetic
    on the broadcast 1-row relation; the z constants are shipped
    literals, so no CDF evaluation happens anywhere (the portability
    rule).  ceil() runs on identical doubles in both engines.
    """
    m = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("xq").cast("long").alias("sx"),
            F.sum(F.col("xq").cast("decimal(38,0)") * F.col("xq"))
            .cast("double")
            .alias("sxx"),
        )
    )
    mdes = spark.createDataFrame(
        [(x,) for x in _POWER_MDES], "mde double"
    )
    mean = F.col("sx").cast("double") / F.col("n") / 100.0
    var = (
        F.col("sxx") - F.col("sx").cast("double") / F.col("n") * F.col("sx")
    ) / (F.col("n") - 1) / 10000.0
    delta = F.col("mde") * mean
    zsum = _Z_ALPHA + _Z_BETA
    return (
        m.crossJoin(broadcast(mdes))
        .select(
            (F.col("mde") * 100).cast("long").alias("mde_pct"),
            F.round(delta, 4).alias("delta"),
            F.ceil(F.lit(2.0) * zsum * zsum * var / (delta * delta))
            .cast("long")
            .alias("n_per_arm"),
        )
        .orderBy("mde_pct")
    )


# ---------------------------------------------------------------------------
# Multiple testing: permutation p-values + Benjamini-Hochberg correction
# ---------------------------------------------------------------------------

FDR_B = 32  # permutation replicates (one per sha256 byte)
FDR_Q = 0.10  # target false-discovery rate


def _o_fdr_byte(b: int) -> str:
    return f"('0x' || substr(hx, {2 * b + 1}, 2))::INT"


@query(
    "q_stats_fdr_bh",
    oracle=f"""
    WITH pool AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq,
             sha256(CAST(event_id AS VARCHAR)) AS hx
      FROM events
    ),
    types AS (SELECT DISTINCT event_type AS test FROM pool),
    ex AS (
      SELECT t.test, p.xq, p.hx,
             CASE WHEN p.event_type = t.test THEN 1 ELSE 0 END AS is_a
      FROM pool p CROSS JOIN types t
    ),
    base AS (
      SELECT test, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS s,
             CAST(SUM(is_a) AS BIGINT) AS na_obs,
             CAST(SUM(CASE WHEN is_a = 1 THEN xq END) AS BIGINT) AS sa_obs
      FROM ex GROUP BY test
    ),
    thr AS (
      SELECT test, n, s, na_obs, sa_obs,
             CAST(floor(CAST(na_obs * 256 AS DOUBLE) / n) AS BIGINT) AS th
      FROM base
    ),
    reps AS (
      SELECT e.test,
        {', '.join(
            f"CAST(SUM(CASE WHEN {_o_fdr_byte(b)} < t.th THEN e.xq END) "
            f"AS BIGINT) AS sa{b}, "
            f"CAST(SUM(CASE WHEN {_o_fdr_byte(b)} < t.th THEN 1 END) "
            f"AS BIGINT) AS na{b}"
            for b in range(FDR_B)
        )}
      FROM ex e JOIN thr t ON t.test = e.test
      GROUP BY e.test
    ),
    pvals AS (
      SELECT t.test,
             round(CAST(t.sa_obs AS DOUBLE) / 100.0 / t.na_obs
                   - CAST(t.s - t.sa_obs AS DOUBLE) / 100.0
                     / (t.n - t.na_obs), 6) AS obs_diff,
             round(CAST(1 + len(list_filter([
               {', '.join(
                   f"round(CAST(r.sa{b} AS DOUBLE) / 100.0 / r.na{b} "
                   f"- CAST(t.s - r.sa{b} AS DOUBLE) / 100.0 "
                   f"/ (t.n - r.na{b}), 6)"
                   for b in range(FDR_B)
               )}
             ], x -> abs(x) >= abs(round(CAST(t.sa_obs AS DOUBLE) / 100.0
                     / t.na_obs - CAST(t.s - t.sa_obs AS DOUBLE) / 100.0
                     / (t.n - t.na_obs), 6)))) AS DOUBLE)
                   / {FDR_B + 1}, 6) AS p
      FROM thr t JOIN reps r ON r.test = t.test
    ),
    ranked AS (
      SELECT test, obs_diff, p,
             CAST(ROW_NUMBER() OVER (ORDER BY p, test) AS BIGINT) AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS nt
      FROM pvals
    )
    SELECT test, obs_diff, p, i AS p_rank,
           round(LEAST(1.0, MIN(p * nt / i) OVER (ORDER BY i DESC
                 ROWS UNBOUNDED PRECEDING)), 6) AS p_adj,
           round(LEAST(1.0, MIN(p * nt / i) OVER (ORDER BY i DESC
                 ROWS UNBOUNDED PRECEDING)), 6) <= {FDR_Q} AS significant
    FROM ranked
    ORDER BY i
    """,
)
def q_stats_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing control: permutation p-values for every
    event-type-vs-rest mean difference, then Benjamini-Hochberg
    adjustment (p_adj(i) = min_{{j≥i}} p(j)·m/j, reject at FDR
    q={FDR_Q}) — the correction a metrics platform MUST apply when one
    experiment readout fans into dozens of per-segment tests, where
    uncorrected p<0.05 discoveries are mostly noise.  The p-values
    reuse q_stats_permutation's machinery: one sha256 per row supplies
    all {FDR_B} relabelings of every test.

    The corpus is scanned exactly twice and fanned out NEVER: one cheap
    pass computes each test's observed stats (plain groupBy event_type,
    no hash decode), and one decode pass reads each row's {FDR_B} sha256
    bytes ONCE, collapsing them into a (byte_position, byte_value)
    histogram of at most {FDR_B}*256 rows — because replicate membership
    (byte < per-test threshold) does not depend on the row's own type,
    every test's replicate aggregates derive from that one tiny
    histogram joined against the broadcast threshold relation.  The
    per-(row x test) re-decode the r6 verdict flagged is gone: all
    x|types| work happens on <= {FDR_B}*256 histogram rows.  The BH
    step is a running MIN over the O(tests) p-value relation.  All
    diffs compare on the 6-rounded grid; ranks tie-break by test name.
    """
    ev = t(spark, sf_dir, "events")
    xq = F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq")
    # Pass 1 (no decode): per-test observed stats + thresholds.
    per_type = ev.select("event_type", xq).groupBy(
        F.col("event_type").alias("test")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("na_obs"),
        F.sum("xq").cast("long").alias("sa_obs"),
    )
    totals = per_type.agg(
        F.sum("na_obs").cast("long").alias("n"),
        F.sum("sa_obs").cast("long").alias("s"),
    )
    thr = per_type.crossJoin(F.broadcast(totals)).withColumn(
        "th",
        F.floor((F.col("na_obs") * 256).cast("double") / F.col("n")).cast(
            "long"
        ),
    )
    byte = lambda b: F.conv(  # noqa: E731
        F.substring("hx", 2 * b + 1, 2), 16, 10
    ).cast("int")
    # Pass 2 (one decode per row): (byte_position, byte_value) histogram.
    # spread() the two raw columns FIRST so the sha256 + 32 byte decodes
    # run full-width above the exchange, not serialized on the scan task.
    rep_hist = spread(ev.select("value", "event_id"), spark).select(
        xq, F.sha2(F.col("event_id").cast("string"), 256).alias("hx")
    ).select(
        "xq",
        F.posexplode(F.array(*[byte(b) for b in range(FDR_B)])).alias(
            "b", "val"
        ),
    ).groupBy("b", "val").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("xq").cast("long").alias("sxq"),
    )
    # Replicate aggregates per (test, b) from the histogram: byte < th.
    reps = rep_hist.join(
        F.broadcast(thr.select(F.col("test").alias("r_test"), "th")),
        F.col("val") < F.col("th"),
    ).groupBy(F.col("r_test").alias("test"), "b").agg(
        F.sum("cnt").cast("long").alias("na_b"),
        F.sum("sxq").cast("long").alias("sa_b"),
    )
    # Map keyed by byte position so a replicate with an empty A side
    # (th=0) reads back NULL, matching the conditional-agg semantics.
    rep_map = reps.groupBy("test").agg(
        F.map_from_entries(
            F.collect_list(F.struct("b", F.struct("na_b", "sa_b")))
        ).alias("ra")
    )
    j = thr.join(
        rep_map.withColumnRenamed("test", "m_test"),
        F.col("m_test") == F.col("test"),
        "left",
    )
    diff = lambda sa, na: F.round(  # noqa: E731
        sa.cast("double") / 100.0 / na
        - (F.col("s") - sa).cast("double") / 100.0 / (F.col("n") - na),
        6,
    )
    obs = diff(F.col("sa_obs"), F.col("na_obs"))
    dl = F.array(
        *[
            diff(F.col("ra")[b]["sa_b"], F.col("ra")[b]["na_b"])
            for b in range(FDR_B)
        ]
    )
    n_ge = F.size(F.filter(dl, lambda x: F.abs(x) >= F.abs(obs)))
    pvals = j.select(
        "test",
        obs.alias("obs_diff"),
        F.round((n_ge + 1).cast("double") / (FDR_B + 1), 6).alias("p"),
    )
    wi = Window.orderBy("p", "test")
    ranked = pvals.select(
        "test",
        "obs_diff",
        "p",
        F.row_number().over(wi).cast("long").alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("nt"),
    )
    wmin = Window.orderBy(F.col("i").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    p_adj = F.round(
        F.least(
            F.lit(1.0),
            F.min(F.col("p") * F.col("nt") / F.col("i")).over(wmin),
        ),
        6,
    )
    return ranked.select(
        "test",
        "obs_diff",
        "p",
        F.col("i").alias("p_rank"),
        p_adj.alias("p_adj"),
        (p_adj <= FDR_Q).alias("significant"),
    ).orderBy("p_rank")


# ---------------------------------------------------------------------------
# Round 7: rank-based k-sample tests, normality, randomness of sequences
# ---------------------------------------------------------------------------

# The fixture's event-type domain, pinned so k-sample statistics can sum
# their per-group terms in a FIXED order (a plain SUM over double terms
# is engine-order-dependent; the welch_t a/b pivot generalized to k).
EVT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q_stats_kruskal",
    oracle=f"""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    gv AS (
      SELECT grp, xq, CAST(COUNT(*) AS BIGINT) AS n_gv
      FROM pool GROUP BY grp, xq
    ),
    vals AS (
      SELECT xq, CAST(SUM(n_gv) AS BIGINT) AS n_v FROM gv GROUP BY xq
    ),
    mids AS (
      SELECT xq, n_v,
             2 * (CAST(SUM(n_v) OVER (ORDER BY xq) AS BIGINT) - n_v)
               + n_v + 1 AS mid2
      FROM vals
    ),
    rg AS (
      SELECT g.grp, CAST(SUM(g.n_gv) AS BIGINT) AS n_g,
             CAST(SUM(g.n_gv * m.mid2) AS BIGINT) AS r2_g
      FROM gv g JOIN mids m ON m.xq = g.xq
      GROUP BY g.grp
    ),
    piv AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             {', '.join(
                 f"CAST(MAX(CASE WHEN grp = '{g}' THEN r2_g END) AS BIGINT)"
                 f" AS r2_{g}, "
                 f"CAST(MAX(CASE WHEN grp = '{g}' THEN n_g END) AS BIGINT)"
                 f" AS n_{g}"
                 for g in EVT_TYPES
             )}
      FROM rg
    ),
    ties AS (
      SELECT CAST(SUM(n_v * n_v * n_v - n_v) AS BIGINT) AS tie_sum
      FROM vals
    )
    SELECT p.n, p.k,
           round(12.0 / (p.n * (p.n + 1.0))
                 * ({' + '.join(
                     f"CAST(r2_{g} AS DOUBLE) * r2_{g} / 4.0 / n_{g}"
                     for g in EVT_TYPES
                 )})
                 - 3.0 * (p.n + 1.0), 6) AS h,
           round((12.0 / (p.n * (p.n + 1.0))
                 * ({' + '.join(
                     f"CAST(r2_{g} AS DOUBLE) * r2_{g} / 4.0 / n_{g}"
                     for g in EVT_TYPES
                 )})
                 - 3.0 * (p.n + 1.0))
                 / (1.0 - CAST(t.tie_sum AS DOUBLE)
                    / (CAST(p.n AS DOUBLE) * p.n * p.n - p.n)), 6)
             AS h_tie_adj
    FROM piv p CROSS JOIN ties t
    """,
)
def q_stats_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the {len(EVT_TYPES)} event-type samples —
    the rank-based one-way ANOVA (no normality assumption), reported
    raw and tie-corrected.  Completes the k-sample family next to
    q_stats_anova (parametric) and q_stats_mannwhitney (2-sample
    ranks).

    Ranks never sort raw rows: the histogram-midrank relation (counts
    per distinct cents value + one running sum over the bounded grid)
    supplies midranks on the integer 2x carrier, per-group rank sums
    are exact longs, and the O(n^2)-free tie term rides the same
    histogram.  The k per-group terms are pivoted into ONE row and
    summed in fixed type order, so the only doubles are a fixed-order
    scalar expression — identical IEEE both engines."""
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    gv = (
        pool.groupBy("grp", "xq")
        .agg(F.count(F.lit(1)).cast("long").alias("n_gv"))
        # vals/mids and rg both consume this bounded histogram —
        # checkpoint so the corpus collapse runs ONCE, not per branch
        .localCheckpoint(eager=False)
    )
    vals = gv.groupBy("xq").agg(F.sum("n_gv").cast("long").alias("n_v"))
    wcum = Window.orderBy("xq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    mids = vals.select(
        "xq",
        "n_v",
        (
            2 * (F.sum("n_v").over(wcum) - F.col("n_v"))
            + F.col("n_v")
            + 1
        ).alias("mid2"),
    )
    rg = (
        gv.join(mids.select(F.col("xq").alias("m_xq"), "mid2"),
                F.col("m_xq") == F.col("xq"))
        .groupBy("grp")
        .agg(
            F.sum("n_gv").cast("long").alias("n_g"),
            F.sum(F.col("n_gv") * F.col("mid2")).cast("long").alias("r2_g"),
        )
    )
    piv_aggs = [
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    ]
    for g in EVT_TYPES:
        piv_aggs.append(
            F.max(F.when(F.col("grp") == g, F.col("r2_g")))
            .cast("long")
            .alias(f"r2_{g}")
        )
        piv_aggs.append(
            F.max(F.when(F.col("grp") == g, F.col("n_g")))
            .cast("long")
            .alias(f"n_{g}")
        )
    piv = rg.agg(*piv_aggs)
    ties = vals.agg(
        F.sum(
            F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v")
        ).cast("long").alias("tie_sum")
    )
    j = piv.crossJoin(F.broadcast(ties))
    sterm = None
    for g in EVT_TYPES:
        term = (
            F.col(f"r2_{g}").cast("double")
            * F.col(f"r2_{g}")
            / 4.0
            / F.col(f"n_{g}")
        )
        sterm = term if sterm is None else sterm + term
    h = (
        12.0 / (F.col("n") * (F.col("n") + 1.0)) * sterm
        - 3.0 * (F.col("n") + 1.0)
    )
    c = 1.0 - F.col("tie_sum").cast("double") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    return j.select(
        "n",
        "k",
        F.round(h, 6).alias("h"),
        F.round(h / c, 6).alias("h_tie_adj"),
    )


@query(
    "q_stats_friedman",
    oracle="""
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, event_type AS grp,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sq,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    k AS (SELECT CAST(COUNT(DISTINCT grp) AS BIGINT) AS k FROM daily),
    full_days AS (
      SELECT day FROM daily GROUP BY day
      HAVING COUNT(*) = (SELECT k FROM k)
    ),
    ranked AS (
      SELECT d.day, d.grp,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY d.day
               ORDER BY CAST(d.sq AS DOUBLE) / d.c, d.grp
             ) AS BIGINT) AS rk
      FROM daily d JOIN full_days f ON f.day = d.day
    ),
    rsums AS (
      SELECT grp, CAST(SUM(rk) AS BIGINT) AS r_j,
             CAST(COUNT(*) AS BIGINT) AS n_blocks
      FROM ranked GROUP BY grp
    ),
    tot AS (
      SELECT CAST(MAX(n_blocks) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(r_j * r_j) AS BIGINT) AS ssr
      FROM rsums
    )
    SELECT n AS n_blocks, k AS k_treatments,
           round(12.0 / (n * k * (k + 1.0)) * ssr - 3.0 * n * (k + 1.0), 6)
             AS chi2_f,
           round((12.0 / (n * k * (k + 1.0)) * ssr - 3.0 * n * (k + 1.0))
                 / (n * (k - 1.0)), 6) AS kendall_w
    FROM tot
    """,
)
def q_stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test (+ Kendall's W concordance) of event-type mean
    value across day blocks: within each complete day (all treatments
    present) the k types are ranked by mean value, rank sums feed the
    chi-square statistic — the repeated-measures sibling of
    q_stats_kruskal, asking "does the type ordering hold up day after
    day?".

    The corpus collapses to the bounded (day x type) relation in ONE
    aggregation (days grow with time span, not data volume); ranking,
    block filtering, and the statistic all run on that tiny relation.
    Ranks order by the IEEE double mean with a type-name tiebreak —
    deterministic and identical both engines; rank sums and their
    squares are exact longs, so the statistic is one fixed-order
    double expression."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.col("event_type").alias("grp"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("sq"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        # k_rel / full_days / ranked (and the hypothesis relation) all
        # re-consume this bounded block relation — one corpus collapse
        .localCheckpoint(eager=False)
    )
    k_rel = daily.agg(
        F.countDistinct("grp").cast("long").alias("k_all")
    )
    full_days = (
        daily.groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_types"))
        .crossJoin(F.broadcast(k_rel))
        .filter(F.col("n_types") == F.col("k_all"))
        .select("day")
    )
    wrk = Window.partitionBy("day").orderBy(
        F.col("sq").cast("double") / F.col("c"), "grp"
    )
    ranked = daily.join(full_days, "day").select(
        "day", "grp", F.row_number().over(wrk).cast("long").alias("rk")
    )
    rsums = ranked.groupBy("grp").agg(
        F.sum("rk").cast("long").alias("r_j"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
    )
    tot = rsums.agg(
        F.max("n_blocks").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("r_j") * F.col("r_j")).cast("long").alias("ssr"),
    )
    chi2 = (
        12.0 / (F.col("n") * F.col("k") * (F.col("k") + 1.0))
        * F.col("ssr")
        - 3.0 * F.col("n") * (F.col("k") + 1.0)
    )
    return tot.select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        F.round(chi2, 6).alias("chi2_f"),
        F.round(chi2 / (F.col("n") * (F.col("k") - 1.0)), 6).alias(
            "kendall_w"
        ),
    )


@query(
    "q_stats_jarque_bera",
    oracle="""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS x2
      FROM events
    ),
    sums AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x2) AS BIGINT) AS s1,
             CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s2,
             CAST(SUM(CAST(x2 AS HUGEINT) * x2 * x2) AS HUGEINT) AS s3,
             CAST(SUM(CAST(x2 AS HUGEINT) * x2 * x2 * x2) AS HUGEINT) AS s4
      FROM pool GROUP BY grp
    )
    SELECT grp, n,
           round((CAST(s3 AS DOUBLE) / n
                  - 3.0 * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s2 AS DOUBLE) / n)
                  + 2.0 * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n))
                 / ((CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n)
                       * (CAST(s1 AS DOUBLE) / n))
                    * sqrt(CAST(s2 AS DOUBLE) / n
                           - (CAST(s1 AS DOUBLE) / n)
                             * (CAST(s1 AS DOUBLE) / n))), 6) AS skewness,
           round((CAST(s4 AS DOUBLE) / n
                  - 4.0 * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s3 AS DOUBLE) / n)
                  + 6.0 * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s2 AS DOUBLE) / n)
                  - 3.0 * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n))
                 / ((CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n)
                       * (CAST(s1 AS DOUBLE) / n))
                    * (CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n))) - 3.0, 6)
             AS kurtosis_excess
    FROM sums
    ORDER BY grp
    """,
)
def q_stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normality moments — skewness and excess kurtosis from
    exact raw power sums (the two inputs of the Jarque-Bera statistic
    JB = n/6*(S^2 + K^2/4), left to the client like the p-lookups in
    q_stats_welch_t) — the distribution-shape screen a metrics platform
    runs before trusting any z-based rule on a segment.

    One conditional-aggregation pass: Sum x..x^4 on the integer cents
    carrier, the cube/quartic sums promoted to DECIMAL(38)/HUGEINT
    BEFORE multiplying (the overflow rule from SCALING.md, operand-cast
    first).  Skew/kurtosis are scale-invariant, so the carrier's x100
    factor cancels and the only doubles are the fixed-order central-
    moment expressions — identical IEEE both engines; m2^1.5 is written
    m2*sqrt(m2) (no libm pow)."""
    x2d = F.col("x2").cast("decimal(38,0)")
    sums = (
        t(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("grp"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("x2"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x2").cast("long").alias("s1"),
            F.sum(x2d * F.col("x2")).alias("s2"),
            F.sum(x2d * F.col("x2") * F.col("x2")).alias("s3"),
            F.sum(x2d * F.col("x2") * F.col("x2") * F.col("x2")).alias(
                "s4"
            ),
        )
    )
    m1 = F.col("s1").cast("double") / F.col("n")
    a = F.col("s2").cast("double") / F.col("n")
    b = F.col("s3").cast("double") / F.col("n")
    c4 = F.col("s4").cast("double") / F.col("n")
    m2 = a - m1 * m1
    m3 = b - 3.0 * m1 * a + 2.0 * m1 * m1 * m1
    m4 = c4 - 4.0 * m1 * b + 6.0 * m1 * m1 * a - 3.0 * m1 * m1 * m1 * m1
    return sums.select(
        "grp",
        "n",
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3.0, 6).alias("kurtosis_excess"),
    ).orderBy("grp")


@query(
    "q_stats_runs_test",
    oracle="""
    WITH pool AS (
      SELECT event_type AS grp, ts, event_id,
             strftime(ts, '%Y-%m-%d') AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    hist AS (
      SELECT grp, xq, CAST(COUNT(*) AS BIGINT) AS c
      FROM pool GROUP BY grp, xq
    ),
    med AS (
      SELECT grp, CAST(MIN(xq) AS BIGINT) AS med FROM (
        SELECT grp, xq,
               SUM(c) OVER (PARTITION BY grp ORDER BY xq) AS cum,
               SUM(c) OVER (PARTITION BY grp) AS n_g
        FROM hist
      ) WHERE 2 * cum >= n_g GROUP BY grp
    ),
    signs AS (
      SELECT p.grp, p.day, p.ts, p.event_id,
             CASE WHEN p.xq > m.med THEN 1 ELSE 0 END AS s
      FROM pool p JOIN med m ON m.grp = p.grp
    ),
    flips AS (
      SELECT grp, day, s,
             CASE WHEN s IS DISTINCT FROM
               LAG(s) OVER (PARTITION BY grp, day ORDER BY ts, event_id)
             THEN 1 ELSE 0 END AS flip
      FROM signs
    ),
    agg AS (
      SELECT grp,
             CAST(SUM(s) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2,
             CAST(SUM(flip) AS BIGINT) AS runs
      FROM flips GROUP BY grp
    )
    SELECT grp, n1, n2, runs,
           round((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / sqrt((2.0 * n1 * n2 / (n1 + n2) + 1.0 - 1.0)
                        * (2.0 * n1 * n2 / (n1 + n2) + 1.0 - 2.0)
                        / (n1 + n2 - 1.0)), 6) AS z
    FROM agg
    ORDER BY grp
    """,
)
def q_stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per event type: is the above/below-
    median sequence of values random over time, or do high values
    cluster (autocorrelated pricing, batched bots)?  Sequences are
    DAY-partitioned — each day contributes its first run at the
    boundary — so at scale no per-type global sort ever happens; the
    z-score uses the standard runs-test moments on the aggregated
    counts.

    The median is the exact lower median off the histogram-midrank
    relation (no raw-row sort), signs come from one broadcast join of
    the 5-row median relation, and runs are a LAG flip-count inside
    bounded (type, day) windows summed per type.  Every count is an
    exact long; z is one fixed-order double expression."""
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        "ts",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    hist = pool.groupBy("grp", "xq").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wcum = (
        Window.partitionBy("grp")
        .orderBy("xq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("grp")
    med = (
        hist.select(
            "grp",
            "xq",
            F.sum("c").over(wcum).alias("cum"),
            F.sum("c").over(wall).alias("n_g"),
        )
        .filter(2 * F.col("cum") >= F.col("n_g"))
        .groupBy("grp")
        .agg(F.min("xq").cast("long").alias("med"))
    )
    signs = pool.join(
        F.broadcast(med.withColumnRenamed("grp", "m_grp")),
        F.col("m_grp") == F.col("grp"),
    ).select(
        "grp",
        "day",
        "ts",
        "event_id",
        F.when(F.col("xq") > F.col("med"), 1).otherwise(0).alias("s"),
    )
    wseq = Window.partitionBy("grp", "day").orderBy("ts", "event_id")
    flips = signs.select(
        "grp",
        "s",
        F.when(
            ~F.lag("s").over(wseq).eqNullSafe(F.col("s")), 1
        ).otherwise(0).alias("flip"),
    )
    agg = flips.groupBy("grp").agg(
        F.sum("s").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("long").alias("n2"),
        F.sum("flip").cast("long").alias("runs"),
    )
    mu = 2.0 * F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2")) + 1.0
    z = (F.col("runs") - mu) / F.sqrt(
        (mu - 1.0) * (mu - 2.0) / (F.col("n1") + F.col("n2") - 1.0)
    )
    return agg.select(
        "grp", "n1", "n2", "runs", F.round(z, 6).alias("z")
    ).orderBy("grp")


@query(
    "q_stats_brier",
    oracle="""
    WITH pool AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    scored AS (
      SELECT y,
             (2 * 1000000 * xq + (xq + 10000)) // (2 * (xq + 10000)) AS pq
      FROM pool
    ),
    binned AS (
      SELECT pq // 100000 AS bin, y, pq,
             (pq - y * 1000000) * (pq - y * 1000000) AS err2
      FROM scored
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(pq) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mean_p,
           round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS frac_pos,
           round(CAST(SUM(err2) AS DOUBLE) / COUNT(*) / 1e12, 6) AS brier
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def q_stats_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-calibration audit: a deterministic value-derived
    score p = v/(v+100) is treated as the predicted purchase
    probability, bucketed into deciles, and graded with per-bin mean
    prediction vs observed positive rate plus the Brier score — the
    reliability-diagram query every scored pipeline (quality
    classifiers, conversion models) runs before trusting its
    thresholds.

    The probability is quantized to the 1e6 grid by EXACT integer
    rational rounding ((2*1e6*x + d) div 2d — no double division, so no
    engine-boundary drift), bins are integer division of the quantized
    grid, and squared errors are exact longs; the only doubles are the
    final per-bin mean divisions.  One scan, one bounded hash
    aggregate."""
    pool = t(spark, sf_dir, "events").select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "y"
        ),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    scored = pool.select(
        "y",
        F.expr(
            "(2 * 1000000 * xq + (xq + 10000)) div (2 * (xq + 10000))"
        ).alias("pq"),
    )
    binned = scored.select(
        F.expr("pq div 100000").cast("long").alias("bin"),
        "y",
        "pq",
        (
            (F.col("pq") - F.col("y") * 1000000)
            * (F.col("pq") - F.col("y") * 1000000)
        ).alias("err2"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum("pq").cast("double") / F.count(F.lit(1)) / 1e6, 6
            ).alias("mean_p"),
            F.round(
                F.sum("y").cast("double") / F.count(F.lit(1)), 6
            ).alias("frac_pos"),
            F.round(
                F.sum("err2").cast("double") / F.count(F.lit(1)) / 1e12, 6
            ).alias("brier"),
        )
        .orderBy("bin")
    )


@query(
    "q_stats_grubbs",
    oracle="""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    stats AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS sx,
             CAST(SUM(CAST(xq AS HUGEINT) * xq) AS HUGEINT) AS sxx
      FROM pool GROUP BY grp
    ),
    devs AS (
      SELECT p.grp, s.n, s.sx, s.sxx,
             CAST(MAX(abs(p.xq * s.n - s.sx) * 100000 + p.xq) AS BIGINT)
               AS keyed,
             CAST(MIN(p.xq) AS BIGINT) AS mn,
             CAST(MAX(p.xq) AS BIGINT) AS mx
      FROM pool p JOIN stats s ON s.grp = p.grp
      GROUP BY p.grp, s.n, s.sx, s.sxx
    ),
    guarded AS (
      SELECT * FROM devs
      WHERE CASE WHEN mn < 0 OR mx >= 100000
                 THEN error('q_stats_grubbs: cents value outside [0, 1e5) pack domain')
                 ELSE TRUE END
    )
    SELECT grp, n,
           round((keyed % 100000) / 100.0, 2) AS outlier_value,
           round((CAST(keyed // 100000 AS DOUBLE) / n)
                 / sqrt((CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * sx / n) / (n - 1.0)), 6)
             AS g
    FROM guarded ORDER BY grp
    """,
)
def q_stats_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' outlier statistic per event type: G = max|x - mean|/sd,
    with the achieving value reported — the single-most-extreme-point
    screen that complements the distributional outlier ops
    (q_dq_outlier_iqr flags many, Grubbs asks whether even ONE point is
    implausible under normality).

    Two bounded passes: per-group moment sums, then a broadcast join
    back to max the INTEGER deviation |x*n - sum| (the common-
    denominator trick — no per-row double subtraction), packed with the
    cents value into one argmax key (dev*1e5 + cents, cents < 1e5) so
    max() returns both the deviation and a deterministic
    largest-value tiebreak in a single aggregate.

    The pack assumes 0 <= cents < 1e5 (value in [0, $1000)); both
    engines raise loudly (error()/raise_error) if a fixture change ever
    violates it, instead of silently corrupting the statistic in a way
    the parity gate cannot see."""
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    stats = pool.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum(F.col("xq").cast("decimal(38,0)") * F.col("xq")).alias(
            "sxx"
        ),
    )
    devs = (
        pool.join(
            F.broadcast(stats.withColumnRenamed("grp", "s_grp")),
            F.col("s_grp") == F.col("grp"),
        )
        .groupBy("grp", "n", "sx", "sxx")
        .agg(
            F.max(
                F.abs(F.col("xq") * F.col("n") - F.col("sx")) * 100000
                + F.col("xq")
            )
            .cast("long")
            .alias("keyed"),
            F.min("xq").cast("long").alias("mn"),
            F.max("xq").cast("long").alias("mx"),
        )
        .filter(
            F.when(
                (F.col("mn") < 0) | (F.col("mx") >= 100000),
                F.raise_error(
                    F.lit(
                        "q_stats_grubbs: cents value outside [0, 1e5)"
                        " pack domain"
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
    )
    sd = F.sqrt(
        (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx") / F.col("n")
        )
        / (F.col("n") - 1.0)
    )
    return devs.select(
        "grp",
        "n",
        F.round((F.col("keyed") % 100000) / 100.0, 2).alias(
            "outlier_value"
        ),
        F.round(
            (F.expr("keyed div 100000").cast("double") / F.col("n")) / sd,
            6,
        ).alias("g"),
    ).orderBy("grp")


@query(
    "q_stats_kendall_tau",
    oracle="""
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS r
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT (a.c - b.c) AS dx, (a.r - b.r) AS dy
      FROM daily a JOIN daily b ON a.day < b.day
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS conc,
             CAST(SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS disc,
             CAST(SUM(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS tie_x,
             CAST(SUM(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS tie_y,
             CAST(COUNT(*) AS BIGINT) AS n0
      FROM pairs
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
    SELECT n_days, conc AS concordant, disc AS discordant,
           round((conc - disc)
                 / sqrt(CAST(n0 - tie_x AS DOUBLE) * (n0 - tie_y)), 6)
             AS tau_b
    FROM agg CROSS JOIN nd
    """,
)
def q_stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between daily event volume and daily revenue —
    the concordance-based correlation that asks "do busier days earn
    more?" without assuming linearity (complement to q_agg_corr's
    Pearson and q_stats_spearman's rank rho, which cannot see tied-pair
    structure the way tau-b's tie terms do).

    The corpus collapses to the bounded daily relation first (days grow
    with time span, never with data volume); the O(days^2) pair
    expansion — the textbook reason tau is 'expensive' — happens on
    that tiny relation only, as a self-join producing exact integer
    concordant/discordant/tie counts.  One double expression at the
    end."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("r"),
        )
        # the O(days^2) self-join reads this twice and nd a third time
        .localCheckpoint(eager=False)
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).select(
        (F.col("a.c") - F.col("b.c")).alias("dx"),
        (F.col("a.r") - F.col("b.r")).alias("dy"),
    )
    agg = pairs.agg(
        F.sum(F.when(F.col("dx") * F.col("dy") > 0, 1).otherwise(0))
        .cast("long")
        .alias("conc"),
        F.sum(F.when(F.col("dx") * F.col("dy") < 0, 1).otherwise(0))
        .cast("long")
        .alias("disc"),
        F.sum(F.when(F.col("dx") == 0, 1).otherwise(0))
        .cast("long")
        .alias("tie_x"),
        F.sum(F.when(F.col("dy") == 0, 1).otherwise(0))
        .cast("long")
        .alias("tie_y"),
        F.count(F.lit(1)).cast("long").alias("n0"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    tau = (F.col("conc") - F.col("disc")) / F.sqrt(
        (F.col("n0") - F.col("tie_x")).cast("double")
        * (F.col("n0") - F.col("tie_y"))
    )
    return agg.crossJoin(F.broadcast(nd)).select(
        "n_days",
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        F.round(tau, 6).alias("tau_b"),
    )


# Rescaled-range block sizes for the Hurst estimate (30 fixture days →
# 6/3/2 complete blocks), and the shared x-axis constants of the log-log
# slope, embedded as IDENTICAL literals in both engines so the only
# in-engine ln() calls are the three ln(R/S) terms.
HURST_NS = (5, 10, 15)
_H_XS = tuple(math.log(float(n)) for n in HURST_NS)
_H_XBAR = sum(_H_XS) / 3.0
_H_DEN = sum((x - _H_XBAR) ** 2 for x in _H_XS)


@query(
    "q_events_hurst",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS grp, strftime(ts, '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    idxd AS (
      SELECT grp, c,
             CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY day) - 1
                  AS BIGINT) AS idx
      FROM daily
    ),
    expanded AS (
      SELECT i.grp, i.c, i.idx, n.n, i.idx // n.n AS blk
      FROM idxd i CROSS JOIN (
        SELECT unnest([{', '.join(str(n) for n in HURST_NS)}]) AS n) n
    ),
    sized AS (
      SELECT grp, n, blk, c, idx,
             CAST(SUM(c) OVER (PARTITION BY grp, n, blk) AS BIGINT) AS s,
             CAST(COUNT(*) OVER (PARTITION BY grp, n, blk) AS BIGINT)
               AS bn
      FROM expanded
    ),
    cums AS (
      SELECT grp, n, blk,
             n * c - s AS dev,
             CAST(SUM(n * c - s) OVER (
               PARTITION BY grp, n, blk ORDER BY idx) AS BIGINT) AS cum
      FROM sized WHERE bn = n
    ),
    blocks AS (
      SELECT grp, n, blk,
             CAST(MAX(cum) - MIN(cum) AS BIGINT) AS r_scaled,
             CAST(SUM(dev * dev) AS BIGINT) AS dev2
      FROM cums GROUP BY grp, n, blk
    ),
    rs AS (
      SELECT grp, n, blk,
             CAST(r_scaled AS DOUBLE)
               / sqrt(CAST(dev2 AS DOUBLE) / n) AS rs_b
      FROM blocks WHERE dev2 > 0
        AND CASE WHEN blk > 5
                 THEN error('q_events_hurst: >6 complete blocks; widen the block pivot')
                 ELSE TRUE END
    ),
    avg_rs AS (
      SELECT grp, n,
             ({' + '.join(
                 f"COALESCE(MAX(CASE WHEN blk = {i} THEN rs_b END), 0.0)"
                 for i in range(6)
             )}) / COUNT(*) AS a_rs
      FROM rs GROUP BY grp, n
    ),
    piv AS (
      SELECT grp,
             {', '.join(
                 f"MAX(CASE WHEN n = {n} THEN a_rs END) AS rs{n}"
                 for n in HURST_NS
             )}
      FROM avg_rs GROUP BY grp
    )
    SELECT grp,
           {', '.join(
               f"round(rs{n}, 6) AS rs_{n}" for n in HURST_NS
           )},
           round(({' + '.join(
               f"({x!r} - {_H_XBAR!r}) * ln(rs{n})"
               for n, x in zip(HURST_NS, _H_XS)
           )}) / {_H_DEN!r}, 6) AS hurst
    FROM piv ORDER BY grp
    """,
)
def q_events_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent per event type via rescaled-range (R/S) analysis
    of the daily-count series: H ≈ 0.5 means memoryless traffic, H > 0.5
    long-range persistence (bursts beget bursts) — the load-model
    diagnostic that decides whether capacity planning can assume
    Poisson arrivals.  Average R/S at block sizes {HURST_NS} feeds the
    log-log slope.

    The corpus collapses to the bounded (type, day) relation first;
    blocks, cumulative deviations (integer, scaled by n so no per-row
    double), and R = max-min of the cumulative walk all ride windows
    over that tiny relation.  Per-(type, n) block averages sum in FIXED
    block order (≤6 pivoted terms), the slope's x-axis constants are
    identical embedded literals both engines, and the only in-engine
    transcendentals are three ln(R/S) calls rounded at 6.  The 6-term
    pivot assumes the day span stays within 6 complete blocks of the
    smallest n (30 days / n=5 today); both engines raise loudly if a
    fixture change ever produces a 7th complete block instead of
    silently dropping it from the numerator."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("grp"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    widx = Window.partitionBy("grp").orderBy("day")
    idxd = daily.select(
        "grp", "c", (F.row_number().over(widx) - 1).cast("long").alias("idx")
    )
    ns = spark.range(0, len(HURST_NS)).select(
        F.element_at(
            F.array(*[F.lit(n) for n in HURST_NS]), (F.col("id") + 1).cast("int")
        ).cast("long").alias("n")
    )
    expanded = idxd.crossJoin(F.broadcast(ns)).withColumn(
        "blk", F.expr("idx div n")
    )
    wblk = Window.partitionBy("grp", "n", "blk")
    sized = expanded.select(
        "grp",
        "n",
        "blk",
        "c",
        "idx",
        F.sum("c").over(wblk).cast("long").alias("s"),
        F.count(F.lit(1)).over(wblk).cast("long").alias("bn"),
    )
    wcum = (
        Window.partitionBy("grp", "n", "blk")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = F.col("n") * F.col("c") - F.col("s")
    cums = sized.filter(F.col("bn") == F.col("n")).select(
        "grp",
        "n",
        "blk",
        dev.alias("dev"),
        F.sum(dev).over(wcum).cast("long").alias("cum"),
    )
    blocks = cums.groupBy("grp", "n", "blk").agg(
        (F.max("cum") - F.min("cum")).cast("long").alias("r_scaled"),
        F.sum(F.col("dev") * F.col("dev")).cast("long").alias("dev2"),
    )
    rs = blocks.filter(
        (F.col("dev2") > 0)
        & F.when(
            F.col("blk") > 5,
            F.raise_error(
                F.lit(
                    "q_events_hurst: >6 complete blocks; widen the"
                    " block pivot"
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    ).select(
        "grp",
        "n",
        "blk",
        (
            F.col("r_scaled").cast("double")
            / F.sqrt(F.col("dev2").cast("double") / F.col("n"))
        ).alias("rs_b"),
    )
    terms = None
    for i in range(6):
        term = F.coalesce(
            F.max(F.when(F.col("blk") == i, F.col("rs_b"))), F.lit(0.0)
        )
        terms = term if terms is None else terms + term
    avg_rs = rs.groupBy("grp", "n").agg(
        (terms / F.count(F.lit(1))).alias("a_rs")
    )
    piv = avg_rs.groupBy("grp").agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("a_rs"))).alias(f"rs{n}")
            for n in HURST_NS
        ]
    )
    slope_num = None
    for n, x in zip(HURST_NS, _H_XS):
        term = F.lit(x - _H_XBAR) * F.log(F.col(f"rs{n}"))
        slope_num = term if slope_num is None else slope_num + term
    sel = [F.col("grp")]
    sel += [F.round(F.col(f"rs{n}"), 6).alias(f"rs_{n}") for n in HURST_NS]
    sel.append(F.round(slope_num / F.lit(_H_DEN), 6).alias("hurst"))
    return piv.select(*sel).orderBy("grp")


# ---------------------------------------------------------------------------
# Round 7 (batch 2): serial-correlation, paired-binary, and ordered-trend
# tests over the bounded daily relation
# ---------------------------------------------------------------------------

LB_LAGS = (1, 2, 3, 4, 5)


@query(
    "q_stats_ljung_box",
    oracle=f"""
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
      FROM daily
    ),
    dev AS (
      SELECT d.y * t.n - t.sy AS dv, t.n,
             ROW_NUMBER() OVER (ORDER BY d.day) AS idx
      FROM daily d CROSS JOIN tot t
    ),
    lagged AS (
      SELECT dv, n,
             {', '.join(
                 f"LAG(dv, {k}) OVER (ORDER BY idx) AS dv{k}"
                 for k in LB_LAGS
             )}
      FROM dev
    ),
    sums AS (
      SELECT MAX(n) AS n,
             CAST(SUM(CAST(dv AS HUGEINT) * dv) AS HUGEINT) AS s0,
             {', '.join(
                 f"CAST(SUM(CAST(dv AS HUGEINT) * dv{k}) AS HUGEINT) AS s{k}"
                 for k in LB_LAGS
             )}
      FROM lagged
    )
    SELECT n AS n_days,
           {', '.join(
               f"round(CAST(s{k} AS DOUBLE) / CAST(s0 AS DOUBLE), 6)"
               f" AS r{k}"
               for k in LB_LAGS
           )},
           round(n * (n + 2.0) * (
             {' + '.join(
                 f"CAST(s{k} AS DOUBLE) * CAST(s{k} AS DOUBLE)"
                 f" / CAST(s0 AS DOUBLE) / CAST(s0 AS DOUBLE) / (n - {k})"
                 for k in LB_LAGS
             )}
           ), 6) AS q_lb,
           {len(LB_LAGS)} AS df
    FROM sums
    """,
)
def q_stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on the daily event-count series: are
    the first {len(LB_LAGS)} autocorrelations jointly zero?  The
    white-noise gate every forecasting op (q_orders_forecast_holt,
    q_events_forecast_sma) should pass its residuals through before the
    forecast is trusted — complements q_stats_autocorr (single lag) and
    q_stats_pacf (partial).

    The corpus collapses to the bounded daily relation first; autocorr
    numerators use the common-denominator integer trick (dv = y*n - Σy,
    so r_k = Σ dv·dv_lag / Σ dv² with the n² scale cancelling — exact
    HUGEINT/decimal integers up to the single final division), lags ride
    ONE window over ~30 rows, and the Q statistic is a fixed-order
    scalar expression.  Reference: delegated HiveQL stats class
    (backend/hive_manager.py:400)."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
        # tot and dev both consume the bounded daily series
        .localCheckpoint(eager=False)
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    dev = daily.crossJoin(F.broadcast(tot)).select(
        (F.col("y") * F.col("n") - F.col("sy")).alias("dv"),
        "n",
        F.row_number().over(Window.orderBy("day")).alias("idx"),
    )
    wl = Window.orderBy("idx")
    lagged = dev.select(
        "dv",
        "n",
        *[F.lag("dv", k).over(wl).alias(f"dv{k}") for k in LB_LAGS],
    )
    dvd = F.col("dv").cast("decimal(38,0)")
    sums = lagged.agg(
        F.max("n").alias("n"),
        F.sum(dvd * F.col("dv")).alias("s0"),
        *[
            F.sum(dvd * F.col(f"dv{k}")).alias(f"s{k}")
            for k in LB_LAGS
        ],
    )
    s0 = F.col("s0").cast("double")
    q = F.lit(0.0)
    for k in LB_LAGS:
        sk = F.col(f"s{k}").cast("double")
        q = q + sk * sk / s0 / s0 / (F.col("n") - F.lit(k))
    return sums.select(
        F.col("n").alias("n_days"),
        *[
            F.round(F.col(f"s{k}").cast("double") / s0, 6).alias(f"r{k}")
            for k in LB_LAGS
        ],
        F.round(F.col("n") * (F.col("n") + 2.0) * q, 6).alias("q_lb"),
        F.lit(len(LB_LAGS)).cast("int").alias("df"),
    )


@query(
    "q_stats_durbin_watson",
    oracle="""
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    idxd AS (
      SELECT y, ROW_NUMBER() OVER (ORDER BY day) - 1 AS tt FROM daily
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(tt) AS BIGINT) AS st,
             CAST(SUM(tt * tt) AS BIGINT) AS stt,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(tt * y) AS BIGINT) AS sty
      FROM idxd
    ),
    coef AS (
      SELECT n, st, stt, sy, sty,
             n * stt - st * st AS dd,
             n * sty - st * sy AS bnum,
             sy * stt - st * sty AS anum
      FROM s
    ),
    resid AS (
      SELECT i.tt,
             CAST(i.y AS HUGEINT) * c.dd - c.anum
               - CAST(c.bnum AS HUGEINT) * i.tt AS e,
             c.n, c.bnum, c.dd
      FROM idxd i CROSS JOIN coef c
    ),
    lagd AS (
      SELECT e, LAG(e) OVER (ORDER BY tt) AS ep, n, bnum, dd FROM resid
    )
    SELECT MAX(n) AS n_days,
           round(CAST(MAX(bnum) AS DOUBLE) / CAST(MAX(dd) AS DOUBLE), 6)
             AS slope,
           round(CAST(SUM(CASE WHEN ep IS NULL THEN NULL
                               ELSE (e - ep) * (e - ep) END) AS DOUBLE)
                 / CAST(SUM(e * e) AS DOUBLE), 6) AS dw
    FROM lagd
    """,
)
def q_stats_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic of the daily-count-vs-time OLS residuals
    — first-order serial correlation in the detrended series (DW ≈ 2
    means none; < 1 means the trend line is missing structure).  The
    companion q_stats_ljung_box tests the raw series; DW tests what the
    regression q_stats_regression leaves behind.

    Residuals are EXACT integers via the common-denominator trick:
    e_t·D = y_t·D − (SyStt − StSty) − (nSty − StSy)·t with
    D = nStt − St², and DW's ratio cancels D², so both engines divide
    the same two exact integers.  Products are HUGEINT/decimal with
    operands cast BEFORE multiplying; everything rides the bounded
    daily relation."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    idxd = daily.select(
        "y", (F.row_number().over(Window.orderBy("day")) - 1).alias("tt")
        # the moment relation and the residual pass both re-consume this
    ).localCheckpoint(eager=False)
    s = idxd.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("tt").cast("long").alias("st"),
        F.sum(F.col("tt") * F.col("tt")).cast("long").alias("stt"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("tt") * F.col("y")).cast("long").alias("sty"),
    )
    coef = s.select(
        "n",
        "st",
        "stt",
        "sy",
        "sty",
        (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).alias("dd"),
        (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).alias(
            "bnum"
        ),
        (F.col("sy") * F.col("stt") - F.col("st") * F.col("sty")).alias(
            "anum"
        ),
    )
    resid = idxd.crossJoin(F.broadcast(coef)).select(
        "tt",
        (
            F.col("y").cast("decimal(38,0)") * F.col("dd")
            - F.col("anum")
            - F.col("bnum").cast("decimal(38,0)") * F.col("tt")
        ).alias("e"),
        "n",
        "bnum",
        "dd",
    )
    lagd = resid.select(
        "e",
        F.lag("e").over(Window.orderBy("tt")).alias("ep"),
        "n",
        "bnum",
        "dd",
    )
    diff = F.col("e") - F.col("ep")
    return lagd.agg(
        F.max("n").alias("n_days"),
        F.round(
            F.max("bnum").cast("double") / F.max("dd").cast("double"), 6
        ).alias("slope"),
        F.round(
            F.sum(
                F.when(F.col("ep").isNull(), None).otherwise(diff * diff)
            ).cast("double")
            / F.sum(F.col("e") * F.col("e")).cast("double"),
            6,
        ).alias("dw"),
    )


@query(
    "q_stats_mcnemar",
    oracle="""
    WITH bounds AS (
      SELECT (CAST(epoch_us(MIN(ts)) AS BIGINT)
              + CAST(epoch_us(MAX(ts)) AS BIGINT)) // 2 AS mid
      FROM events
    ),
    per_user AS (
      SELECT e.user_id,
             MAX(CASE WHEN e.event_type = 'purchase'
                       AND CAST(epoch_us(e.ts) AS BIGINT) < b.mid
                      THEN 1 ELSE 0 END) AS h1,
             MAX(CASE WHEN e.event_type = 'purchase'
                       AND CAST(epoch_us(e.ts) AS BIGINT) >= b.mid
                      THEN 1 ELSE 0 END) AS h2
      FROM events e CROSS JOIN bounds b
      GROUP BY e.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(h1 * (1 - h2)) AS BIGINT) AS b_only_first,
           CAST(SUM((1 - h1) * h2) AS BIGINT) AS c_only_second,
           round(CASE WHEN SUM(h1 * (1 - h2)) + SUM((1 - h1) * h2) = 0
                      THEN 0.0
                      ELSE (abs(CAST(SUM(h1 * (1 - h2)) AS DOUBLE)
                                - SUM((1 - h1) * h2)) - 1)
                         * (abs(CAST(SUM(h1 * (1 - h2)) AS DOUBLE)
                                - SUM((1 - h1) * h2)) - 1)
                         / (SUM(h1 * (1 - h2)) + SUM((1 - h1) * h2))
                 END, 6) AS chi2_cc
    FROM per_user
    """,
)
def q_stats_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired-proportion test: did each user purchase in the
    FIRST half of the observation window vs the SECOND half?  Only the
    discordant pairs (b = converted-then-stopped, c = newly-converted)
    carry information — the before/after test for launches and
    migrations where q_stats_chi2's independent-samples assumption is
    wrong because the same users appear on both sides.

    The window midpoint is an exact integer (epoch-microsecond floor
    average — identical both engines), the per-user half indicators are
    one bounded-key aggregate, and the continuity-corrected statistic
    (|b−c|−1)²/(b+c) is computed from exact integer counts."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    bounds = ev.agg(
        F.expr("(min(us) + max(us)) div 2").cast("long").alias("mid")
    )
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") < F.col("mid")),
                    1,
                ).otherwise(0)
            ).alias("h1"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") >= F.col("mid")),
                    1,
                ).otherwise(0)
            ).alias("h2"),
        )
    )
    b = F.sum(F.col("h1") * (1 - F.col("h2"))).cast("long")
    c = F.sum((1 - F.col("h1")) * F.col("h2")).cast("long")
    diff = F.abs(b.cast("double") - c) - 1
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        b.alias("b_only_first"),
        c.alias("c_only_second"),
        F.round(
            F.when(b + c == 0, F.lit(0.0)).otherwise(
                diff * diff / (b + c)
            ),
            6,
        ).alias("chi2_cc"),
    )


@query(
    "q_stats_cochran_q",
    oracle="""
    WITH cell AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    rows_ AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS r_i
      FROM cell GROUP BY user_id
    ),
    cols AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c_j
      FROM cell GROUP BY event_type
    ),
    k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM cols),
    rsum AS (
      SELECT CAST(SUM(r_i) AS BIGINT) AS nn,
             CAST(SUM(r_i * r_i) AS BIGINT) AS sr2,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM rows_
    ),
    csum AS (
      SELECT CAST(SUM(c_j * c_j) AS BIGINT) AS sc2 FROM cols
    )
    SELECT k.k AS k_treatments, r.n_users,
           round((k.k - 1.0) * (k.k * c.sc2 - CAST(r.nn AS DOUBLE) * r.nn)
                 / NULLIF(k.k * CAST(r.nn AS DOUBLE) - r.sr2, 0.0), 6)
             AS q_cochran
    FROM k CROSS JOIN rsum r CROSS JOIN csum c
    """,
)
def q_stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q: across the k event-type "treatments", do users have
    the same propensity to exhibit each type at least once?  The
    k-sample generalization of McNemar over the user × type binary
    incidence matrix — the engagement-breadth test (if Q is large, some
    event types reach systematically fewer users).

    The incidence matrix never materializes: one DISTINCT collapse to
    (user, type) cells, then row sums (types per user) and column sums
    (users per type) are two bounded aggregates; N, ΣR², ΣC² are exact
    longs and Q = (k−1)(k·ΣC² − N²)/(k·N − ΣR²) is one final double
    expression."""
    cell = (
        t(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        # row sums and column sums both consume the incidence cells
        .localCheckpoint(eager=False)
    )
    rows_ = cell.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("r_i")
    )
    cols = cell.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c_j")
    )
    k_rel = cols.agg(F.count(F.lit(1)).cast("long").alias("k"))
    rsum = rows_.agg(
        F.sum("r_i").cast("long").alias("nn"),
        F.sum(F.col("r_i") * F.col("r_i")).cast("long").alias("sr2"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    csum = cols.agg(
        F.sum(F.col("c_j") * F.col("c_j")).cast("long").alias("sc2")
    )
    return (
        k_rel.crossJoin(F.broadcast(rsum))
        .crossJoin(F.broadcast(csum))
        .select(
            F.col("k").alias("k_treatments"),
            "n_users",
            F.round(
                (F.col("k") - 1.0)
                * (
                    F.col("k") * F.col("sc2")
                    - F.col("nn").cast("double") * F.col("nn")
                )
                # saturated incidence (every user has every type) has
                # zero within-user variance: Q undefined -> NULL
                / F.nullif(
                    F.col("k") * F.col("nn").cast("double")
                    - F.col("sr2"),
                    F.lit(0.0),
                ),
                6,
            ).alias("q_cochran"),
        )
    )


@query(
    "q_stats_page_trend",
    oracle="""
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, event_type AS grp,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sq,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    k AS (SELECT CAST(COUNT(DISTINCT grp) AS BIGINT) AS k FROM daily),
    full_days AS (
      SELECT day FROM daily GROUP BY day
      HAVING COUNT(*) = (SELECT k FROM k)
    ),
    ranked AS (
      SELECT d.day, d.grp,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY d.day
               ORDER BY CAST(d.sq AS DOUBLE) / d.c, d.grp
             ) AS BIGINT) AS rk
      FROM daily d JOIN full_days f ON f.day = d.day
    ),
    hyp AS (
      SELECT grp,
             CAST(ROW_NUMBER() OVER (ORDER BY grp) AS BIGINT) AS c_j
      FROM (SELECT DISTINCT grp FROM daily) g
    ),
    l AS (
      SELECT CAST(SUM(r.rk * h.c_j) AS BIGINT) AS l_stat,
             CAST(COUNT(DISTINCT r.day) AS BIGINT) AS b
      FROM ranked r JOIN hyp h ON h.grp = r.grp
    )
    SELECT l.b AS n_blocks, k.k AS k_treatments, l.l_stat,
           round((l.l_stat - l.b * k.k * (k.k + 1.0) * (k.k + 1.0) / 4.0)
                 / sqrt(l.b * CAST(k.k AS DOUBLE) * k.k * (k.k + 1.0)
                        * (k.k * k.k - 1.0) / 144.0), 6) AS z
    FROM l CROSS JOIN k
    """,
)
def q_stats_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L trend test over the day-blocked event-type rankings:
    does the ALPHABETICAL type ordering predict the within-day ranking
    of mean values, day after day?  The ordered-alternative sibling of
    q_stats_friedman — Friedman asks "any difference?", Page asks "a
    monotone trend in a pre-declared order?" (here the fixed
    lexicographic order stands in for the analyst's hypothesis, keeping
    both engines deterministic).

    Same bounded machinery as Friedman: one (day × type) collapse,
    complete-block filter, ROW_NUMBER ranks with a type-name tiebreak;
    L = Σ c_j·R_j is an exact long and the z-score is one fixed-order
    double expression."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.col("event_type").alias("grp"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("sq"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        # k_rel / full_days / ranked (and the hypothesis relation) all
        # re-consume this bounded block relation — one corpus collapse
        .localCheckpoint(eager=False)
    )
    k_rel = daily.agg(F.countDistinct("grp").cast("long").alias("k"))
    full_days = (
        daily.groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_types"))
        .crossJoin(F.broadcast(k_rel))
        .filter(F.col("n_types") == F.col("k"))
        .select("day")
    )
    wrk = Window.partitionBy("day").orderBy(
        F.col("sq").cast("double") / F.col("c"), F.col("grp")
    )
    ranked = (
        daily.join(full_days, "day")
        .select("day", "grp", F.row_number().over(wrk).cast("long").alias("rk"))
    )
    hyp = (
        daily.select("grp")
        .distinct()
        .select(
            "grp",
            F.row_number()
            .over(Window.orderBy("grp"))
            .cast("long")
            .alias("c_j"),
        )
    )
    l_rel = ranked.join(F.broadcast(hyp), "grp").agg(
        F.sum(F.col("rk") * F.col("c_j")).cast("long").alias("l_stat"),
        F.countDistinct("day").cast("long").alias("b"),
    )
    kk = F.col("k").cast("double")
    mean_l = F.col("b") * kk * (kk + 1.0) * (kk + 1.0) / 4.0
    var_l = (
        F.col("b") * kk * kk * (kk + 1.0) * (kk * kk - 1.0) / 144.0
    )
    return l_rel.crossJoin(F.broadcast(k_rel)).select(
        F.col("b").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        "l_stat",
        F.round((F.col("l_stat") - mean_l) / F.sqrt(var_l), 6).alias("z"),
    )


@query(
    "q_events_odds_ratio",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS exposed,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS outcome
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT CAST(SUM(exposed * outcome) AS BIGINT) AS a,
             CAST(SUM(exposed * (1 - outcome)) AS BIGINT) AS b,
             CAST(SUM((1 - exposed) * outcome) AS BIGINT) AS c,
             CAST(SUM((1 - exposed) * (1 - outcome)) AS BIGINT) AS d
      FROM per_user
    )
    SELECT a, b, c, d,
           round((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)), 6)
             AS or_haldane,
           round(exp(ln((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)))
                     - 1.959964 * sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                                       + 1.0 / (c + 0.5)
                                       + 1.0 / (d + 0.5))), 6) AS ci_lo,
           round(exp(ln((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)))
                     + 1.959964 * sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                                       + 1.0 / (c + 0.5)
                                       + 1.0 / (d + 0.5))), 6) AS ci_hi
    FROM cells
    """,
)
def q_events_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-to-purchase odds ratio with a Wald 95% CI: per user, does
    having hit at least one error change the odds of ever purchasing?
    The epidemiology-style 2×2 effect-size readout that q_stats_chi2 /
    q_stats_cramers_v (association strength) and q_events_ab_test
    (proportions) don't give directly — with the Haldane-Anscombe +0.5
    correction so empty cells can't blow up the estimate.

    One bounded per-user aggregate builds the 2×2 from exact integer
    cells; +0.5 is IEEE-exact on integer-valued doubles, and the
    ln/exp/sqrt closure is a fixed-order scalar expression over those
    exact cells (z* = 1.959964 embedded identically both engines)."""
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("exposed"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("outcome"),
        )
    )
    cells = per_user.agg(
        F.sum(F.col("exposed") * F.col("outcome")).cast("long").alias("a"),
        F.sum(F.col("exposed") * (1 - F.col("outcome")))
        .cast("long")
        .alias("b"),
        F.sum((1 - F.col("exposed")) * F.col("outcome"))
        .cast("long")
        .alias("c"),
        F.sum((1 - F.col("exposed")) * (1 - F.col("outcome")))
        .cast("long")
        .alias("d"),
    )
    a, b, c, d = (F.col(x) + 0.5 for x in "abcd")
    or_h = a * d / (b * c)
    se = F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round(or_h, 6).alias("or_haldane"),
        F.round(F.exp(F.log(or_h) - 1.959964 * se), 6).alias("ci_lo"),
        F.round(F.exp(F.log(or_h) + 1.959964 * se), 6).alias("ci_hi"),
    )


@query(
    "q_stats_boxplot",
    oracle="""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    hist AS (
      SELECT grp, xq, CAST(COUNT(*) AS BIGINT) AS c
      FROM pool GROUP BY grp, xq
    ),
    cum AS (
      SELECT grp, xq, c,
             CAST(SUM(c) OVER (PARTITION BY grp ORDER BY xq) AS BIGINT)
               AS cc,
             CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n
      FROM hist
    ),
    quart AS (
      SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
             CAST(MIN(CASE WHEN cc * 4 >= n THEN xq END) AS BIGINT) AS q1,
             CAST(MIN(CASE WHEN cc * 2 >= n THEN xq END) AS BIGINT)
               AS med,
             CAST(MIN(CASE WHEN cc * 4 >= 3 * n THEN xq END) AS BIGINT)
               AS q3
      FROM cum GROUP BY grp
    ),
    fences AS (
      SELECT grp, n, q1, med, q3,
             2 * q1 - 3 * (q3 - q1) AS lo2,
             2 * q3 + 3 * (q3 - q1) AS hi2
      FROM quart
    )
    SELECT f.grp, f.n,
           round(f.q1 / 100.0, 2) AS q1,
           round(f.med / 100.0, 2) AS median,
           round(f.q3 / 100.0, 2) AS q3,
           CAST(SUM(CASE WHEN 2 * h.xq < f.lo2 THEN h.c ELSE 0 END)
                AS BIGINT) AS n_low_outliers,
           CAST(SUM(CASE WHEN 2 * h.xq > f.hi2 THEN h.c ELSE 0 END)
                AS BIGINT) AS n_high_outliers,
           round(MIN(CASE WHEN 2 * h.xq >= f.lo2 THEN h.xq END) / 100.0, 2)
             AS whisker_lo,
           round(MAX(CASE WHEN 2 * h.xq <= f.hi2 THEN h.xq END) / 100.0, 2)
             AS whisker_hi
    FROM fences f JOIN hist h ON h.grp = f.grp
    GROUP BY f.grp, f.n, f.q1, f.med, f.q3, f.lo2, f.hi2
    ORDER BY f.grp
    """,
)
def q_stats_boxplot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey box-plot statistics per event type — quartiles, 1.5·IQR
    whiskers (the most extreme values INSIDE the fences), and outlier
    counts beyond each fence — the dashboard five-number summary that
    q_dq_outlier_iqr (which lists the outlier rows) presupposes.

    All quantiles are percentile_disc off the per-group value histogram
    (cum·4 ≥ n exact integer crossings — no raw-row sort, no double
    thresholds), the 1.5·IQR fences ride a 2× integer carrier
    (lo·2 = 2q1 − 3·IQR, compared against 2·xq), and outlier/whisker
    aggregation REJOINS THE HISTOGRAM, not the corpus — one corpus
    collapse total."""
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    hist = (
        pool.groupBy("grp", "xq")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # quartiles and the fence rejoin both consume the histogram
        .localCheckpoint(eager=False)
    )
    wcum = (
        Window.partitionBy("grp")
        .orderBy("xq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("grp")
    cum = hist.select(
        "grp",
        "xq",
        "c",
        F.sum("c").over(wcum).cast("long").alias("cc"),
        F.sum("c").over(wall).cast("long").alias("n"),
    )
    quart = cum.groupBy("grp").agg(
        F.max("n").cast("long").alias("n"),
        F.min(F.when(F.col("cc") * 4 >= F.col("n"), F.col("xq")))
        .cast("long")
        .alias("q1"),
        F.min(F.when(F.col("cc") * 2 >= F.col("n"), F.col("xq")))
        .cast("long")
        .alias("med"),
        F.min(F.when(F.col("cc") * 4 >= 3 * F.col("n"), F.col("xq")))
        .cast("long")
        .alias("q3"),
    )
    fences = quart.select(
        F.col("grp").alias("f_grp"),
        "n",
        "q1",
        "med",
        "q3",
        (2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1"))).alias("lo2"),
        (2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1"))).alias("hi2"),
    )
    return (
        fences.join(hist, F.col("f_grp") == F.col("grp"))
        .groupBy("f_grp", "n", "q1", "med", "q3", "lo2", "hi2")
        .agg(
            F.sum(
                F.when(2 * F.col("xq") < F.col("lo2"), F.col("c")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("n_low_outliers"),
            F.sum(
                F.when(2 * F.col("xq") > F.col("hi2"), F.col("c")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("n_high_outliers"),
            F.round(
                F.min(
                    F.when(2 * F.col("xq") >= F.col("lo2"), F.col("xq"))
                )
                / 100.0,
                2,
            ).alias("whisker_lo"),
            F.round(
                F.max(
                    F.when(2 * F.col("xq") <= F.col("hi2"), F.col("xq"))
                )
                / 100.0,
                2,
            ).alias("whisker_hi"),
        )
        .select(
            F.col("f_grp").alias("grp"),
            "n",
            F.round(F.col("q1") / 100.0, 2).alias("q1"),
            F.round(F.col("med") / 100.0, 2).alias("median"),
            F.round(F.col("q3") / 100.0, 2).alias("q3"),
            "n_low_outliers",
            "n_high_outliers",
            "whisker_lo",
            "whisker_hi",
        )
        .orderBy("grp")
    )


TOST_MARGIN = 0.5  # equivalence margin in value units, embedded both engines


@query(
    "q_stats_tost",
    oracle=f"""
    WITH pool AS (
      SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS g,
             CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
      FROM events WHERE event_type IN ('click', 'view')
    ),
    m AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v6) AS BIGINT) AS s1,
             CAST(SUM(CAST(v6 AS HUGEINT) * v6) AS HUGEINT) AS s2
      FROM pool GROUP BY g
    ),
    stats AS (
      SELECT g, n,
             CAST(s1 AS DOUBLE) / 1e6 / n AS mean,
             (CAST(s2 AS DOUBLE) / 1e12
              - (CAST(s1 AS DOUBLE) / 1e6) * (CAST(s1 AS DOUBLE) / 1e6)
                / n) / (n - 1) AS var
      FROM m
    ),
    wide AS (
      SELECT MAX(CASE WHEN g = 'a' THEN n END) AS n_a,
             MAX(CASE WHEN g = 'a' THEN mean END) AS mean_a,
             MAX(CASE WHEN g = 'a' THEN var END) AS var_a,
             MAX(CASE WHEN g = 'b' THEN n END) AS n_b,
             MAX(CASE WHEN g = 'b' THEN mean END) AS mean_b,
             MAX(CASE WHEN g = 'b' THEN var END) AS var_b
      FROM stats
    )
    SELECT n_a, n_b,
           round(mean_a - mean_b, 6) AS diff,
           round(sqrt(var_a / n_a + var_b / n_b), 6) AS se,
           round((mean_a - mean_b + {TOST_MARGIN!r})
                 / sqrt(var_a / n_a + var_b / n_b), 6) AS t_lower,
           round(({TOST_MARGIN!r} - (mean_a - mean_b))
                 / sqrt(var_a / n_a + var_b / n_b), 6) AS t_upper,
           ((mean_a - mean_b + {TOST_MARGIN!r})
              / sqrt(var_a / n_a + var_b / n_b) > 1.644854
            AND ({TOST_MARGIN!r} - (mean_a - mean_b))
              / sqrt(var_a / n_a + var_b / n_b) > 1.644854)
             AS equivalent_90
    FROM wide
    """,
)
def q_stats_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (two one-sided t-tests) between 'click'
    and 'view' event values with a ±{TOST_MARGIN} margin: unlike
    q_stats_welch_t, which can only FAIL to find a difference, TOST
    can positively conclude "these segments are the same to within
    the margin" — the right tool for no-regression launch checks.

    Same exact-carrier machinery as welch_t (one conditional pass,
    1e6-scaled longs, DECIMAL/HUGEINT squares with operands cast before
    multiplying); both one-sided t statistics and the z* = 1.644854
    (90% TOST) decision are fixed-order doubles on the 1-row pivot."""
    pool = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            F.when(F.col("event_type") == "click", "a")
            .otherwise("b")
            .alias("g"),
            F.floor(F.col("value") * 1e6 + 0.5).cast("long").alias("v6"),
        )
    )
    m = pool.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v6").cast("long").alias("s1"),
        F.sum(F.col("v6").cast("decimal(38,0)") * F.col("v6")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / 1e6 / F.col("n")
    var = (
        F.col("s2").cast("double") / 1e12
        - (F.col("s1").cast("double") / 1e6)
        * (F.col("s1").cast("double") / 1e6)
        / F.col("n")
    ) / (F.col("n") - 1)
    stats = m.select("g", "n", mean.alias("mean"), var.alias("var"))
    wide = stats.agg(
        F.max(F.when(F.col("g") == "a", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("g") == "a", F.col("mean"))).alias("mean_a"),
        F.max(F.when(F.col("g") == "a", F.col("var"))).alias("var_a"),
        F.max(F.when(F.col("g") == "b", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("g") == "b", F.col("mean"))).alias("mean_b"),
        F.max(F.when(F.col("g") == "b", F.col("var"))).alias("var_b"),
    )
    d = F.col("mean_a") - F.col("mean_b")
    se = F.sqrt(
        F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    )
    t_lo = (d + TOST_MARGIN) / se
    t_hi = (F.lit(TOST_MARGIN) - d) / se
    return wide.select(
        "n_a",
        "n_b",
        F.round(d, 6).alias("diff"),
        F.round(se, 6).alias("se"),
        F.round(t_lo, 6).alias("t_lower"),
        F.round(t_hi, 6).alias("t_upper"),
        ((t_lo > 1.644854) & (t_hi > 1.644854)).alias("equivalent_90"),
    )


@query(
    "q_stats_bartlett",
    oracle="""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    sums AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS s1,
             CAST(SUM(CAST(xq AS HUGEINT) * xq) AS HUGEINT) AS s2
      FROM pool GROUP BY grp
    ),
    pergrp AS (
      SELECT grp, n,
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) / n * s1) / (n - 1)
               AS v
      FROM sums
    ),
    terms AS (
      SELECT grp, n, v,
             CAST(floor((n - 1) * ln(v) * 1e9 + 0.5) AS BIGINT) AS lv9,
             CAST(floor(1e12 / (n - 1) + 0.5) AS BIGINT) AS inv12
      FROM pergrp
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS nt,
             CAST(SUM(CAST((n - 1) AS HUGEINT) * CAST(floor(v * 1e4 + 0.5)
                  AS BIGINT)) AS HUGEINT) AS sv4,
             CAST(SUM(lv9) AS BIGINT) AS slv9,
             CAST(SUM(inv12) AS BIGINT) AS sinv12
      FROM terms
    )
    SELECT k, nt AS n_total,
           round(CAST(sv4 AS DOUBLE) / 1e4 / (nt - k) / 1e4, 6)
             AS pooled_var,
           round(((nt - k) * ln(CAST(sv4 AS DOUBLE) / 1e4 / (nt - k))
                  - CAST(slv9 AS DOUBLE) / 1e9)
                 / (1.0 + (CAST(sinv12 AS DOUBLE) / 1e12
                           - 1.0 / (nt - k)) / (3.0 * (k - 1))), 6)
             AS bartlett_chi2,
           k - 1 AS df
    FROM tot
    """,
)
def q_stats_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test for homogeneity of variances across event types
    (chi-square with k-1 df) — the parametric sibling of q_stats_levene:
    more powerful when the per-segment distributions are near-normal,
    which is exactly what q_stats_jarque_bera / q_stats_anderson_darling
    establish first.

    One corpus collapse to per-group (n, Sx, Sx2) on the integer-cents
    carrier (squares operand-cast to DECIMAL(38) first).  The k ln-
    variance terms and the 1/(n_i-1) correction terms are pinned onto
    1e9 / 1e12 summand grids before the cross-group integer sum, so the
    k-row reduction is order-free; Bartlett's statistic is scale-
    invariant (the cents^2 factor cancels between the pooled and
    per-group ln terms), and pooled_var is reported back in value^2
    units.  The final statistic is a fixed-order expression on the
    1-row total relation."""
    xqd = F.col("xq").cast("decimal(38,0)")
    sums = (
        t(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("grp"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("xq").cast("long").alias("s1"),
            F.sum(xqd * F.col("xq")).alias("s2"),
        )
    )
    v = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") / F.col("n") * F.col("s1")
    ) / (F.col("n") - 1)
    terms = sums.select(
        "grp",
        "n",
        v.alias("v"),
        F.floor((F.col("n") - 1) * F.log(v) * 1e9 + 0.5)
        .cast("long")
        .alias("lv9"),
        F.floor(1e12 / (F.col("n") - 1) + 0.5).cast("long").alias("inv12"),
    )
    tot = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nt"),
        F.sum(
            (F.col("n") - 1).cast("decimal(38,0)")
            * F.floor(F.col("v") * 1e4 + 0.5).cast("long")
        ).alias("sv4"),
        F.sum("lv9").cast("long").alias("slv9"),
        F.sum("inv12").cast("long").alias("sinv12"),
    )
    pooled = F.col("sv4").cast("double") / 1e4 / (F.col("nt") - F.col("k"))
    chi2 = (
        (F.col("nt") - F.col("k")) * F.log(pooled)
        - F.col("slv9").cast("double") / 1e9
    ) / (
        1.0
        + (
            F.col("sinv12").cast("double") / 1e12
            - 1.0 / (F.col("nt") - F.col("k"))
        )
        / (3.0 * (F.col("k") - 1))
    )
    return tot.select(
        "k",
        F.col("nt").alias("n_total"),
        F.round(pooled / 1e4, 6).alias("pooled_var"),
        F.round(chi2, 6).alias("bartlett_chi2"),
        (F.col("k") - 1).alias("df"),
    )


@query(
    "q_stats_mood_median",
    oracle="""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    hist AS (
      SELECT grp, xq, CAST(COUNT(*) AS BIGINT) AS c
      FROM pool GROUP BY grp, xq
    ),
    ghist AS (
      SELECT xq, CAST(SUM(c) AS BIGINT) AS c FROM hist GROUP BY xq
    ),
    med AS (
      SELECT CAST(MIN(xq) AS BIGINT) AS med FROM (
        SELECT xq,
               SUM(c) OVER (ORDER BY xq) AS cum,
               SUM(c) OVER () AS n
        FROM ghist
      ) WHERE 2 * cum >= n
    ),
    pergrp AS (
      SELECT h.grp,
             CAST(SUM(h.c) AS BIGINT) AS n_i,
             CAST(SUM(CASE WHEN h.xq > m.med THEN h.c ELSE 0 END)
                  AS BIGINT) AS a_i
      FROM hist h CROSS JOIN med m
      GROUP BY h.grp
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_i) AS BIGINT) AS n,
             CAST(SUM(a_i) AS BIGINT) AS a
      FROM pergrp
    ),
    terms AS (
      SELECT CAST(floor(
               CAST(CAST(p.a_i AS HUGEINT) * t.n
                    - CAST(p.n_i AS HUGEINT) * t.a AS DOUBLE)
               * CAST(CAST(p.a_i AS HUGEINT) * t.n
                      - CAST(p.n_i AS HUGEINT) * t.a AS DOUBLE)
               / p.n_i / t.a / (t.n - t.a) * 1e9 + 0.5) AS BIGINT) AS q9,
             t.k, t.n, t.a
      FROM pergrp p CROSS JOIN tot t
    )
    SELECT MAX(k) AS k, MAX(n) AS n_total,
           round(CAST((SELECT med FROM med) AS DOUBLE) / 100.0, 2)
             AS grand_median,
           MAX(a) AS n_above,
           round(CAST(SUM(q9) AS DOUBLE) / 1e9, 6) AS chi2,
           MAX(k) - 1 AS df
    FROM terms
    """,
)
def q_stats_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across event types: count each segment's
    values above vs at-or-below the GRAND median and Pearson-chi-square
    the 2xk table — the coarse, outlier-immune cousin of
    q_stats_kruskal (no ranks at all, only sides of one cut point).

    One corpus collapse to the (grp, value-cent) histogram; the grand
    median re-aggregates that histogram (no second corpus scan) and is
    an exact cum*2 >= n crossing on the bounded distinct-value relation.
    Each group's chi-square contribution (a_i*N - n_i*A)^2/(n_i*A*B) is
    an exact-integer numerator (HUGEINT/decimal cross products) pinned
    onto a 1e9 summand grid, so the k-row reduction is order-free."""
    ev = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    hist = (
        ev.groupBy("grp", "xq")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # grand-median rollup + per-group sides both consume this
        .localCheckpoint(eager=False)
    )
    ghist = hist.groupBy("xq").agg(F.sum("c").cast("long").alias("c"))
    wcum = Window.orderBy("xq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    med = (
        ghist.select(
            "xq",
            F.sum("c").over(wcum).alias("cum"),
            F.sum("c").over(wall).alias("n"),
        )
        .filter(2 * F.col("cum") >= F.col("n"))
        .agg(F.min("xq").cast("long").alias("med"))
    )
    pergrp = (
        hist.crossJoin(F.broadcast(med))
        .groupBy("grp")
        .agg(
            F.sum("c").cast("long").alias("n_i"),
            F.sum(F.when(F.col("xq") > F.col("med"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("a_i"),
        )
    )
    tot = pergrp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_i").cast("long").alias("n"),
        F.sum("a_i").cast("long").alias("a"),
    )
    d = (
        F.col("a_i").cast("decimal(38,0)") * F.col("n")
        - F.col("n_i").cast("decimal(38,0)") * F.col("a")
    ).cast("double")
    terms = pergrp.crossJoin(F.broadcast(tot)).select(
        F.floor(
            d * d / F.col("n_i") / F.col("a") / (F.col("n") - F.col("a"))
            * 1e9
            + 0.5
        )
        .cast("long")
        .alias("q9"),
        "k",
        "n",
        "a",
    )
    return terms.crossJoin(F.broadcast(med)).agg(
        F.max("k").alias("k"),
        F.max("n").alias("n_total"),
        F.round(F.max("med").cast("double") / 100.0, 2).alias(
            "grand_median"
        ),
        F.max("a").alias("n_above"),
        F.round(F.sum("q9").cast("double") / 1e9, 6).alias("chi2"),
        (F.max("k") - 1).alias("df"),
    )


@query(
    "q_stats_anderson_darling",
    oracle="""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    sums AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS s1,
             CAST(SUM(CAST(xq AS HUGEINT) * xq) AS HUGEINT) AS s2
      FROM pool GROUP BY grp
    ),
    mom AS (
      SELECT grp, n, s1,
             sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) / n * s1)
                  / (n - 1)) AS sd
      FROM sums
    ),
    hist AS (
      SELECT grp, xq, CAST(COUNT(*) AS BIGINT) AS c
      FROM pool GROUP BY grp, xq
    ),
    ranked AS (
      SELECT grp, xq, c,
             CAST(SUM(c) OVER (PARTITION BY grp ORDER BY xq) - c
                  AS BIGINT) AS a
      FROM hist
    ),
    zed AS (
      SELECT r.grp, r.c, r.a, m.n,
             (CAST(r.xq AS DOUBLE) - CAST(m.s1 AS DOUBLE) / m.n) / m.sd
               AS z
      FROM ranked r JOIN mom m ON m.grp = r.grp
    ),
    erfd AS (
      SELECT grp, c, a, n, z,
             1.0 - (1.0 / (1.0 + 0.3275911 * (abs(z)
                    * 0.7071067811865476)))
                   * (0.254829592 + (1.0 / (1.0 + 0.3275911 * (abs(z)
                        * 0.7071067811865476)))
                   * (-0.284496736 + (1.0 / (1.0 + 0.3275911 * (abs(z)
                        * 0.7071067811865476)))
                   * (1.421413741 + (1.0 / (1.0 + 0.3275911 * (abs(z)
                        * 0.7071067811865476)))
                   * (-1.453152027 + (1.0 / (1.0 + 0.3275911 * (abs(z)
                        * 0.7071067811865476)))
                   * 1.061405429))))
                   * exp(-(abs(z) * 0.7071067811865476)
                         * (abs(z) * 0.7071067811865476)) AS er
      FROM zed
    ),
    phi AS (
      SELECT grp, c, a, n,
             GREATEST(LEAST(0.5 * (CASE WHEN z >= 0.0 THEN 1.0 + er
                                        ELSE 1.0 - er END),
                            1.0 - 1e-15), 1e-15) AS p
      FROM erfd
    ),
    terms AS (
      SELECT grp, n,
             CAST(c * (2 * a + c) AS HUGEINT)
               * CAST(floor(ln(p) * 1e9 + 0.5) AS BIGINT)
             + CAST(c * (2 * (n - a) - c) AS HUGEINT)
               * CAST(floor(ln(1.0 - p) * 1e9 + 0.5) AS BIGINT) AS t9
      FROM phi
    ),
    agg AS (
      SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(t9) AS HUGEINT) AS s9
      FROM terms GROUP BY grp
    )
    SELECT a.grp, a.n,
           round(CAST(m.s1 AS DOUBLE) / a.n / 100.0, 4) AS mean_value,
           round(m.sd / 100.0, 4) AS sd_value,
           round(-CAST(a.n AS DOUBLE) - CAST(a.s9 AS DOUBLE) / 1e9 / a.n,
                 6) AS a2,
           round((-CAST(a.n AS DOUBLE) - CAST(a.s9 AS DOUBLE) / 1e9 / a.n)
                 * (1.0 + 0.75 / a.n
                    + 2.25 / (CAST(a.n AS DOUBLE) * a.n)), 6) AS a2_star
    FROM agg a JOIN mom m ON m.grp = a.grp
    ORDER BY a.grp
    """,
)
def q_stats_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anderson-Darling normality statistic A2 (and the small-sample
    adjusted A2*) per event type — the tail-weighted EDF test that
    completes the normality family: q_stats_jarque_bera screens via
    moments, q_stats_ks via max CDF gap, AD weights the tails where
    revenue-style data actually breaks normality.  q_stats_bartlett's
    docstring cites this op as the gate for its near-normality
    assumption.

    No global row sort: the order-statistic weights collapse onto the
    per-distinct-value histogram — positions a+1..a+c of value v
    contribute exactly c*(2a+c) to the ln(Phi) side and c*(2(n-a)-c)
    to the ln(1-Phi) side (closed-form sums of (2i-1) resp. (2n+1-2i)),
    both exact integers off one running count over the bounded distinct
    relation.  Phi is the Abramowitz-Stegun 7.1.26 erf closure (identical
    fixed-order literal arithmetic in both engines; z itself is exact:
    integer moment carriers + IEEE sqrt/divide), clamped to
    [1e-15, 1-1e-15]; each ln term is pinned onto a 1e9 summand grid and
    weighted into HUGEINT/DECIMAL(38) products, so the per-group
    reduction is order-free at any partition count.  A2 = -n - S/n on
    the k-row relation; A2* applies the (1 + 0.75/n + 2.25/n^2)
    finite-sample factor."""
    xqd = F.col("xq").cast("decimal(38,0)")
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    sums = pool.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("s1"),
        F.sum(xqd * F.col("xq")).alias("s2"),
    )
    mom = sums.select(
        "grp",
        "n",
        "s1",
        F.sqrt(
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") / F.col("n") * F.col("s1")
            )
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    hist = pool.groupBy("grp", "xq").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wcum = Window.partitionBy("grp").orderBy("xq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = hist.select(
        "grp",
        "xq",
        "c",
        (F.sum("c").over(wcum) - F.col("c")).cast("long").alias("a"),
    )
    zed = ranked.join(
        F.broadcast(mom.withColumnRenamed("grp", "m_grp")),
        F.col("m_grp") == F.col("grp"),
    ).select(
        "grp",
        "c",
        "a",
        "n",
        (
            (
                F.col("xq").cast("double")
                - F.col("s1").cast("double") / F.col("n")
            )
            / F.col("sd")
        ).alias("z"),
    )
    xx = F.abs(F.col("z")) * 0.7071067811865476
    tt = 1.0 / (1.0 + 0.3275911 * xx)
    er = F.lit(1.0) - tt * (
        0.254829592
        + tt
        * (
            -0.284496736
            + tt * (1.421413741 + tt * (-1.453152027 + tt * 1.061405429))
        )
    ) * F.exp(-xx * xx)
    phi = zed.select(
        "grp",
        "c",
        "a",
        "n",
        F.greatest(
            F.least(
                0.5
                * F.when(F.col("z") >= 0.0, F.lit(1.0) + er).otherwise(
                    F.lit(1.0) - er
                ),
                F.lit(1.0 - 1e-15),
            ),
            F.lit(1e-15),
        ).alias("p"),
    )
    terms = phi.select(
        "grp",
        "n",
        (
            (F.col("c") * (2 * F.col("a") + F.col("c"))).cast(
                "decimal(38,0)"
            )
            * F.floor(F.log("p") * 1e9 + 0.5).cast("long")
            + (
                F.col("c") * (2 * (F.col("n") - F.col("a")) - F.col("c"))
            ).cast("decimal(38,0)")
            * F.floor(F.log(F.lit(1.0) - F.col("p")) * 1e9 + 0.5).cast(
                "long"
            )
        ).alias("t9"),
    )
    agg = terms.groupBy("grp").agg(
        F.max("n").cast("long").alias("n"), F.sum("t9").alias("s9")
    )
    a2 = (
        -F.col("n").cast("double")
        - F.col("s9").cast("double") / 1e9 / F.col("n")
    )
    return (
        agg.join(
            F.broadcast(
                mom.select(F.col("grp").alias("m_grp"), "s1", "sd")
            ),
            F.col("m_grp") == F.col("grp"),
        )
        .select(
            "grp",
            "n",
            F.round(
                F.col("s1").cast("double") / F.col("n") / 100.0, 4
            ).alias("mean_value"),
            F.round(F.col("sd") / 100.0, 4).alias("sd_value"),
            F.round(a2, 6).alias("a2"),
            F.round(
                a2
                * (
                    1.0
                    + 0.75 / F.col("n")
                    + 2.25 / (F.col("n").cast("double") * F.col("n"))
                ),
                6,
            ).alias("a2_star"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# Round 8: EDF-statistic family completion (CvM, Lilliefors) + D'Agostino K2
# — all on the q_stats_anderson_darling machinery: histogram order-statistic
# weights + the mirrored A-S 7.1.26 erf closure, no global row sort anywhere
# ---------------------------------------------------------------------------

# the A-S 7.1.26 normal-CDF closure as a SQL fragment (DuckDB) — identical
# literal arithmetic to _phi_col below so both engines compute the same
# IEEE doubles; {z} is the (already exact) standardized-value expression
_PHI_SQL = """GREATEST(LEAST(0.5 * (CASE WHEN {z} >= 0.0
             THEN 1.0 + (1.0 - (1.0 / (1.0 + 0.3275911 * (abs({z})
                    * 0.7071067811865476)))
                   * (0.254829592 + (1.0 / (1.0 + 0.3275911 * (abs({z})
                        * 0.7071067811865476)))
                   * (-0.284496736 + (1.0 / (1.0 + 0.3275911 * (abs({z})
                        * 0.7071067811865476)))
                   * (1.421413741 + (1.0 / (1.0 + 0.3275911 * (abs({z})
                        * 0.7071067811865476)))
                   * (-1.453152027 + (1.0 / (1.0 + 0.3275911 * (abs({z})
                        * 0.7071067811865476)))
                   * 1.061405429))))
                   * exp(-(abs({z}) * 0.7071067811865476)
                         * (abs({z}) * 0.7071067811865476)))
             ELSE 1.0 - (1.0 - (1.0 / (1.0 + 0.3275911 * (abs({z})
                    * 0.7071067811865476)))
                   * (0.254829592 + (1.0 / (1.0 + 0.3275911 * (abs({z})
                        * 0.7071067811865476)))
                   * (-0.284496736 + (1.0 / (1.0 + 0.3275911 * (abs({z})
                        * 0.7071067811865476)))
                   * (1.421413741 + (1.0 / (1.0 + 0.3275911 * (abs({z})
                        * 0.7071067811865476)))
                   * (-1.453152027 + (1.0 / (1.0 + 0.3275911 * (abs({z})
                        * 0.7071067811865476)))
                   * 1.061405429))))
                   * exp(-(abs({z}) * 0.7071067811865476)
                         * (abs({z}) * 0.7071067811865476)))
             END), 1.0 - 1e-15), 1e-15)"""


def _phi_col(z):
    """Spark twin of _PHI_SQL: the clamped A-S 7.1.26 Phi(z) Column."""
    xx = F.abs(z) * 0.7071067811865476
    tt = 1.0 / (1.0 + 0.3275911 * xx)
    er = F.lit(1.0) - tt * (
        0.254829592
        + tt
        * (
            -0.284496736
            + tt * (1.421413741 + tt * (-1.453152027 + tt * 1.061405429))
        )
    ) * F.exp(-xx * xx)
    return F.greatest(
        F.least(
            0.5 * F.when(z >= 0.0, F.lit(1.0) + er).otherwise(F.lit(1.0) - er),
            F.lit(1.0 - 1e-15),
        ),
        F.lit(1e-15),
    )


# shared CTE prefix: per-group moments + distinct-value histogram with the
# running count a (values strictly below v), exactly q_stats_anderson_darling's
_EDF_CTE = """pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    sums AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS s1,
             CAST(SUM(CAST(xq AS HUGEINT) * xq) AS HUGEINT) AS s2
      FROM pool GROUP BY grp
    ),
    mom AS (
      SELECT grp, n, s1,
             sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) / n * s1)
                  / (n - 1)) AS sd
      FROM sums
    ),
    hist AS (
      SELECT grp, xq, CAST(COUNT(*) AS BIGINT) AS c
      FROM pool GROUP BY grp, xq
    ),
    ranked AS (
      SELECT grp, xq, c,
             CAST(SUM(c) OVER (PARTITION BY grp ORDER BY xq) - c
                  AS BIGINT) AS a
      FROM hist
    ),
    zed AS (
      SELECT r.grp, r.c, r.a, m.n,
             (CAST(r.xq AS DOUBLE) - CAST(m.s1 AS DOUBLE) / m.n) / m.sd
               AS z
      FROM ranked r JOIN mom m ON m.grp = r.grp
    )"""


def _edf_zed(spark: SparkSession, sf_dir: str):
    """Spark twin of _EDF_CTE: returns (zed DataFrame with
    grp/c/a/n/z columns)."""
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    xqd = F.col("xq").cast("decimal(38,0)")
    sums = pool.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("s1"),
        F.sum(xqd * F.col("xq")).alias("s2"),
    )
    mom = sums.select(
        "grp",
        "n",
        "s1",
        F.sqrt(
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") / F.col("n") * F.col("s1")
            )
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    hist = pool.groupBy("grp", "xq").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wcum = Window.partitionBy("grp").orderBy("xq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = hist.select(
        "grp",
        "xq",
        "c",
        (F.sum("c").over(wcum) - F.col("c")).cast("long").alias("a"),
    )
    return ranked.join(
        F.broadcast(mom.withColumnRenamed("grp", "m_grp")),
        F.col("m_grp") == F.col("grp"),
    ).select(
        "grp",
        "c",
        "a",
        "n",
        (
            (
                F.col("xq").cast("double")
                - F.col("s1").cast("double") / F.col("n")
            )
            / F.col("sd")
        ).alias("z"),
    )


@query(
    "q_stats_cvm",
    oracle=f"""
    WITH {_EDF_CTE},
    terms AS (
      SELECT grp, n,
             CAST(c AS HUGEINT)
               * CAST(floor(({_PHI_SQL.format(z="z")})
                            * ({_PHI_SQL.format(z="z")}) * 1e12 + 0.5)
                      AS BIGINT) AS t12,
             CAST(c * (2 * a + c) AS HUGEINT)
               * CAST(floor(({_PHI_SQL.format(z="z")}) * 1e12 + 0.5)
                      AS BIGINT) AS u12
      FROM zed
    )
    SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
           round(CAST(SUM(t12) AS DOUBLE) / 1e12
                 - CAST(SUM(u12) AS DOUBLE) / 1e12 / MAX(n)
                 + MAX(n) / 3.0, 6) AS w2,
           round((CAST(SUM(t12) AS DOUBLE) / 1e12
                  - CAST(SUM(u12) AS DOUBLE) / 1e12 / MAX(n)
                  + MAX(n) / 3.0) * (1.0 + 0.5 / MAX(n)), 6) AS w2_star
    FROM terms GROUP BY grp ORDER BY grp
    """,
)
def q_stats_cvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér-von Mises normality statistic W² per event type — the
    mean-square EDF distance, between q_stats_ks (max distance, blunt)
    and q_stats_anderson_darling (tail-weighted): the third member of
    the EDF family, sensitive to body-of-distribution misfit.

    Same no-global-sort machinery as AD, with one extra telescoping
    identity: W² = Σ(Φ(z_(i)) - (2i-1)/2n)² + 1/12n expands per distinct
    value into c·Φ² - Φ·c(2a+c)/n + Σ(2i-1)²/4n², and the pure
    Σ(2i-1)²/4n² term telescopes across the whole group to exactly
    (4n²-1)/12n — so W² = Σ c·Φ² - (Σ Φ·c(2a+c))/n + n/3 needs only the
    SAME exact-integer weight c(2a+c) as AD.  Φ and Φ² are pinned onto
    1e12 summand grids into HUGEINT/DECIMAL(38) products (c ≤ n makes
    c·Φ²·1e12 overflow BIGINT at sf10 — hence the 128-bit carriers);
    the k-row finish applies the (1 + 0.5/n) small-sample factor."""
    zed = _edf_zed(spark, sf_dir)
    p = _phi_col(F.col("z"))
    terms = zed.select(
        "grp",
        "n",
        (
            F.col("c").cast("decimal(38,0)")
            * F.floor(p * p * 1e12 + 0.5).cast("long")
        ).alias("t12"),
        (
            (F.col("c") * (2 * F.col("a") + F.col("c"))).cast(
                "decimal(38,0)"
            )
            * F.floor(p * 1e12 + 0.5).cast("long")
        ).alias("u12"),
    )
    w2 = (
        F.sum("t12").cast("double") / 1e12
        - F.sum("u12").cast("double") / 1e12 / F.max("n")
        + F.max("n") / 3.0
    )
    return (
        terms.groupBy("grp")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.round(w2, 6).alias("w2"),
            F.round(w2 * (1.0 + 0.5 / F.max("n")), 6).alias("w2_star"),
        )
        .orderBy("grp")
    )


@query(
    "q_stats_lilliefors",
    oracle=f"""
    WITH {_EDF_CTE},
    gaps AS (
      SELECT grp, n,
             CAST(a + c AS DOUBLE) / n - ({_PHI_SQL.format(z="z")})
               AS d_plus,
             ({_PHI_SQL.format(z="z")}) - CAST(a AS DOUBLE) / n AS d_minus
      FROM zed
    )
    SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
           round(GREATEST(MAX(d_plus), MAX(d_minus)), 6) AS d,
           round(GREATEST(MAX(d_plus), MAX(d_minus))
                 * sqrt(CAST(MAX(n) AS DOUBLE)), 6) AS d_scaled
    FROM gaps GROUP BY grp ORDER BY grp
    """,
)
def q_stats_lilliefors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lilliefors test statistic per event type: the Kolmogorov-Smirnov
    max-gap D against the FITTED normal (mean and sd estimated from the
    same sample — the composite-hypothesis form q_stats_ks's two-sample
    drift check does not cover).  d_scaled = D·√n is the size-free
    comparison value.

    The empirical CDF steps only at distinct values, so both one-sided
    gaps ride the histogram: D⁺ = max((a+c)/n - Φ(z_v)) (CDF just after
    the step) and D⁻ = max(Φ(z_v) - a/n) (just before) — exact integer
    cumulative counts, the mirrored erf closure for Φ, and max() is
    order-free by construction (no grids needed)."""
    zed = _edf_zed(spark, sf_dir)
    p = _phi_col(F.col("z"))
    gaps = zed.select(
        "grp",
        "n",
        ((F.col("a") + F.col("c")).cast("double") / F.col("n") - p).alias(
            "d_plus"
        ),
        (p - F.col("a").cast("double") / F.col("n")).alias("d_minus"),
    )
    d = F.greatest(F.max("d_plus"), F.max("d_minus"))
    return (
        gaps.groupBy("grp")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.round(d, 6).alias("d"),
            F.round(d * F.sqrt(F.max("n").cast("double")), 6).alias(
                "d_scaled"
            ),
        )
        .orderBy("grp")
    )


# D'Agostino moment-transform building blocks (SQL side): m_k = s_k/n as
# doubles in the same fixed order as q_stats_jarque_bera
_DA_M1 = "(CAST(s1 AS DOUBLE) / n)"
_DA_M2 = f"(CAST(s2 AS DOUBLE) / n - {_DA_M1} * {_DA_M1})"
_DA_SK = (
    f"((CAST(s3 AS DOUBLE) / n - 3.0 * {_DA_M1} * (CAST(s2 AS DOUBLE) / n)"
    f" + 2.0 * {_DA_M1} * {_DA_M1} * {_DA_M1})"
    f" / ({_DA_M2} * sqrt({_DA_M2})))"
)
_DA_B2 = (
    f"((CAST(s4 AS DOUBLE) / n - 4.0 * {_DA_M1} * (CAST(s3 AS DOUBLE) / n)"
    f" + 6.0 * {_DA_M1} * {_DA_M1} * (CAST(s2 AS DOUBLE) / n)"
    f" - 3.0 * {_DA_M1} * {_DA_M1} * {_DA_M1} * {_DA_M1})"
    f" / ({_DA_M2} * {_DA_M2}))"
)


@query(
    "q_stats_dagostino",
    oracle=f"""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    sums AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS s1,
             CAST(SUM(CAST(xq AS HUGEINT) * xq) AS HUGEINT) AS s2,
             CAST(SUM(CAST(xq AS HUGEINT) * xq * xq) AS HUGEINT) AS s3,
             CAST(SUM(CAST(xq AS HUGEINT) * xq * xq * xq) AS HUGEINT) AS s4
      FROM pool GROUP BY grp
    ),
    der AS (
      SELECT grp, n, CAST(n AS DOUBLE) AS nd,
             {_DA_SK} AS sk, {_DA_B2} AS b2
      FROM sums
    ),
    skewside AS (
      SELECT grp, n, nd, sk, b2,
             sk * sqrt((nd + 1.0) * (nd + 3.0) / (6.0 * (nd - 2.0))) AS y,
             3.0 * (nd * nd + 27.0 * nd - 70.0) * (nd + 1.0) * (nd + 3.0)
               / ((nd - 2.0) * (nd + 5.0) * (nd + 7.0) * (nd + 9.0))
               AS beta2
      FROM der
    ),
    skewz AS (
      SELECT grp, n, nd, b2, y,
             -1.0 + sqrt(2.0 * (beta2 - 1.0)) AS w2
      FROM skewside
    ),
    zs_cte AS (
      SELECT grp, n, nd, b2,
             (1.0 / sqrt(0.5 * ln(w2)))
               * ln(y / sqrt(2.0 / (w2 - 1.0))
                    + sqrt((y / sqrt(2.0 / (w2 - 1.0)))
                           * (y / sqrt(2.0 / (w2 - 1.0))) + 1.0)) AS zs
      FROM skewz
    ),
    kurtside AS (
      SELECT grp, n, nd, zs,
             (b2 - 3.0 * (nd - 1.0) / (nd + 1.0))
               / sqrt(24.0 * nd * (nd - 2.0) * (nd - 3.0)
                      / ((nd + 1.0) * (nd + 1.0) * (nd + 3.0)
                         * (nd + 5.0))) AS x,
             6.0 * (nd * nd - 5.0 * nd + 2.0) / ((nd + 7.0) * (nd + 9.0))
               * sqrt(6.0 * (nd + 3.0) * (nd + 5.0)
                      / (nd * (nd - 2.0) * (nd - 3.0))) AS sb1
      FROM zs_cte
    ),
    kurta AS (
      SELECT grp, n, zs, x,
             6.0 + 8.0 / sb1 * (2.0 / sb1
                                + sqrt(1.0 + 4.0 / (sb1 * sb1))) AS aa
      FROM kurtside
    ),
    zk_cte AS (
      SELECT grp, n, zs,
             (1.0 - 2.0 / (9.0 * aa)
              - cbrt((1.0 - 2.0 / aa)
                     / (1.0 + x * sqrt(2.0 / (aa - 4.0)))))
               * sqrt(9.0 * aa / 2.0) AS zk
      FROM kurta
    )
    SELECT grp, n, round(zs, 6) AS skew_z, round(zk, 6) AS kurt_z,
           round(zs * zs + zk * zk, 6) AS k2
    FROM zk_cte ORDER BY grp
    """,
)
def q_stats_dagostino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D'Agostino-Pearson K² omnibus normality test per event type: the
    skewness z (D'Agostino 1970 Johnson-SU transform) and kurtosis z
    (Anscombe-Glynn 1983 Wilson-Hilferty cube-root transform) combined
    as K² = z_s² + z_k² — the MOMENT-side omnibus that complements the
    EDF family (ks/lilliefors/cvm/anderson_darling): q_stats_jarque_bera
    reports the raw moments, this op finishes them into the properly
    size-normalized test.

    Everything derives from the one conditional-aggregation pass of
    exact power sums Σx..x⁴ on the cents carrier (DECIMAL(38)/HUGEINT,
    operand-cast-first — the jarque_bera machinery verbatim); all the
    finite-sample constants are fixed-order double arithmetic on the
    k-row relation with n pre-cast to double ONCE (the (n+1)²(n+3)(n+5)
    products overflow BIGINT at sf10 if left integer).  cbrt is the
    only non-ln/exp transcendental — present and sign-correct in both
    engines."""
    xqd = F.col("xq").cast("decimal(38,0)")
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    sums = pool.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("s1"),
        F.sum(xqd * F.col("xq")).alias("s2"),
        F.sum(xqd * F.col("xq") * F.col("xq")).alias("s3"),
        F.sum(xqd * F.col("xq") * F.col("xq") * F.col("xq")).alias("s4"),
    )
    m1 = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n") - m1 * m1
    sk = (
        F.col("s3").cast("double") / F.col("n")
        - 3.0 * m1 * (F.col("s2").cast("double") / F.col("n"))
        + 2.0 * m1 * m1 * m1
    ) / (m2 * F.sqrt(m2))
    b2 = (
        F.col("s4").cast("double") / F.col("n")
        - 4.0 * m1 * (F.col("s3").cast("double") / F.col("n"))
        + 6.0 * m1 * m1 * (F.col("s2").cast("double") / F.col("n"))
        - 3.0 * m1 * m1 * m1 * m1
    ) / (m2 * m2)
    der = sums.select(
        "grp",
        "n",
        F.col("n").cast("double").alias("nd"),
        sk.alias("sk"),
        b2.alias("b2"),
    )
    nd = F.col("nd")
    skewside = der.select(
        "grp",
        "n",
        "nd",
        "sk",
        "b2",
        (
            F.col("sk")
            * F.sqrt((nd + 1.0) * (nd + 3.0) / (6.0 * (nd - 2.0)))
        ).alias("y"),
        (
            3.0
            * (nd * nd + 27.0 * nd - 70.0)
            * (nd + 1.0)
            * (nd + 3.0)
            / ((nd - 2.0) * (nd + 5.0) * (nd + 7.0) * (nd + 9.0))
        ).alias("beta2"),
    )
    skewz = skewside.select(
        "grp",
        "n",
        "nd",
        "b2",
        "y",
        (F.lit(-1.0) + F.sqrt(2.0 * (F.col("beta2") - 1.0))).alias("w2"),
    )
    ya = F.col("y") / F.sqrt(2.0 / (F.col("w2") - 1.0))
    zs_cte = skewz.select(
        "grp",
        "n",
        "nd",
        "b2",
        (
            (1.0 / F.sqrt(0.5 * F.log(F.col("w2"))))
            * F.log(ya + F.sqrt(ya * ya + 1.0))
        ).alias("zs"),
    )
    kurtside = zs_cte.select(
        "grp",
        "n",
        "nd",
        "zs",
        (
            (F.col("b2") - 3.0 * (nd - 1.0) / (nd + 1.0))
            / F.sqrt(
                24.0
                * nd
                * (nd - 2.0)
                * (nd - 3.0)
                / ((nd + 1.0) * (nd + 1.0) * (nd + 3.0) * (nd + 5.0))
            )
        ).alias("x"),
        (
            6.0
            * (nd * nd - 5.0 * nd + 2.0)
            / ((nd + 7.0) * (nd + 9.0))
            * F.sqrt(
                6.0 * (nd + 3.0) * (nd + 5.0)
                / (nd * (nd - 2.0) * (nd - 3.0))
            )
        ).alias("sb1"),
    )
    sb1 = F.col("sb1")
    kurta = kurtside.select(
        "grp",
        "n",
        "zs",
        "x",
        (
            F.lit(6.0)
            + 8.0 / sb1 * (2.0 / sb1 + F.sqrt(1.0 + 4.0 / (sb1 * sb1)))
        ).alias("aa"),
    )
    aa = F.col("aa")
    zk_cte = kurta.select(
        "grp",
        "n",
        "zs",
        (
            (
                F.lit(1.0)
                - 2.0 / (9.0 * aa)
                - F.cbrt(
                    (1.0 - 2.0 / aa)
                    / (1.0 + F.col("x") * F.sqrt(2.0 / (aa - 4.0)))
                )
            )
            * F.sqrt(9.0 * aa / 2.0)
        ).alias("zk"),
    )
    return zk_cte.select(
        "grp",
        "n",
        F.round(F.col("zs"), 6).alias("skew_z"),
        F.round(F.col("zk"), 6).alias("kurt_z"),
        F.round(
            F.col("zs") * F.col("zs") + F.col("zk") * F.col("zk"), 6
        ).alias("k2"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# Acklam inverse normal CDF (probit) — the second mirrored-closure primitive
# next to the A-S 7.1.26 erf: a 3-region rational polynomial, fixed-order
# literal arithmetic, identical in both engines.  Unlocks the rank-score
# test family (Fligner-Killeen, van der Waerden) without any CDF tables.
# ---------------------------------------------------------------------------

_ACKLAM_A = (-3.969683028665376e+01, 2.209460984245205e+02,
             -2.759285104469687e+02, 1.383577518672690e+02,
             -3.066479806614716e+01, 2.506628277459239e+00)
_ACKLAM_B = (-5.447609879822406e+01, 1.615858368580409e+02,
             -1.556989798598866e+02, 6.680131188771972e+01,
             -1.328068155288572e+01)
_ACKLAM_C = (-7.784894002430293e-03, -3.223964580411365e-01,
             -2.400758277161838e+00, -2.549732539343734e+00,
             4.374664141464968e+00, 2.938163982698783e+00)
_ACKLAM_D = (7.784695709041462e-03, 3.224671290700398e-01,
             2.445134137142996e+00, 3.754408661907416e+00)
_ACKLAM_PLOW = 0.02425


def _probit_sql(p: str) -> str:
    """DuckDB fragment computing Acklam's probit of expression {p}."""
    a, b, c, d = _ACKLAM_A, _ACKLAM_B, _ACKLAM_C, _ACKLAM_D
    cen = (f"((((({a[0]!r} * (({p} - 0.5) * ({p} - 0.5)) + {a[1]!r})"
           f" * (({p} - 0.5) * ({p} - 0.5)) + {a[2]!r})"
           f" * (({p} - 0.5) * ({p} - 0.5)) + {a[3]!r})"
           f" * (({p} - 0.5) * ({p} - 0.5)) + {a[4]!r})"
           f" * (({p} - 0.5) * ({p} - 0.5)) + {a[5]!r}) * ({p} - 0.5)"
           f" / ((((({b[0]!r} * (({p} - 0.5) * ({p} - 0.5)) + {b[1]!r})"
           f" * (({p} - 0.5) * ({p} - 0.5)) + {b[2]!r})"
           f" * (({p} - 0.5) * ({p} - 0.5)) + {b[3]!r})"
           f" * (({p} - 0.5) * ({p} - 0.5)) + {b[4]!r})"
           f" * (({p} - 0.5) * ({p} - 0.5)) + 1.0)")
    qlo = f"sqrt(-2.0 * ln({p}))"
    lo = (f"((((({c[0]!r} * {qlo} + {c[1]!r}) * {qlo} + {c[2]!r})"
          f" * {qlo} + {c[3]!r}) * {qlo} + {c[4]!r}) * {qlo} + {c[5]!r})"
          f" / (((({d[0]!r} * {qlo} + {d[1]!r}) * {qlo} + {d[2]!r})"
          f" * {qlo} + {d[3]!r}) * {qlo} + 1.0)")
    qhi = f"sqrt(-2.0 * ln(1.0 - ({p})))"
    hi = (f"-((((({c[0]!r} * {qhi} + {c[1]!r}) * {qhi} + {c[2]!r})"
          f" * {qhi} + {c[3]!r}) * {qhi} + {c[4]!r}) * {qhi} + {c[5]!r})"
          f" / (((({d[0]!r} * {qhi} + {d[1]!r}) * {qhi} + {d[2]!r})"
          f" * {qhi} + {d[3]!r}) * {qhi} + 1.0)")
    return (f"(CASE WHEN ({p}) < {_ACKLAM_PLOW!r} THEN ({lo})"
            f" WHEN ({p}) > {1.0 - _ACKLAM_PLOW!r} THEN ({hi})"
            f" ELSE ({cen}) END)")


def _probit_col(p):
    """Spark twin of _probit_sql (same fixed-order arithmetic)."""
    a, b, c, d = _ACKLAM_A, _ACKLAM_B, _ACKLAM_C, _ACKLAM_D
    q = p - 0.5
    r = q * q
    cen = (
        (((((F.lit(a[0]) * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
         * r + a[5]) * q
        / (((((F.lit(b[0]) * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4])
           * r + 1.0)
    )
    qlo = F.sqrt(-2.0 * F.log(p))
    lo = (
        ((((F.lit(c[0]) * qlo + c[1]) * qlo + c[2]) * qlo + c[3]) * qlo
         + c[4]) * qlo + c[5]
    ) / (
        (((F.lit(d[0]) * qlo + d[1]) * qlo + d[2]) * qlo + d[3]) * qlo
        + 1.0
    )
    qhi = F.sqrt(-2.0 * F.log(F.lit(1.0) - p))
    hi = -(
        ((((F.lit(c[0]) * qhi + c[1]) * qhi + c[2]) * qhi + c[3]) * qhi
         + c[4]) * qhi + c[5]
    ) / (
        (((F.lit(d[0]) * qhi + d[1]) * qhi + d[2]) * qhi + d[3]) * qhi
        + 1.0
    )
    return (
        F.when(p < _ACKLAM_PLOW, lo)
        .when(p > 1.0 - _ACKLAM_PLOW, hi)
        .otherwise(cen)
    )


@query(
    "q_stats_fligner",
    oracle=f"""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    ghist AS (
      SELECT grp, xq, CAST(COUNT(*) AS BIGINT) AS c
      FROM pool GROUP BY grp, xq
    ),
    gmed AS (
      SELECT grp, CAST(MIN(xq) AS BIGINT) AS med FROM (
        SELECT grp, xq,
               SUM(c) OVER (PARTITION BY grp ORDER BY xq) AS cum,
               SUM(c) OVER (PARTITION BY grp) AS ng
        FROM ghist
      ) WHERE 2 * cum >= ng GROUP BY grp
    ),
    devh AS (
      SELECT h.grp, abs(h.xq - m.med) AS u, CAST(SUM(h.c) AS BIGINT) AS cg
      FROM ghist h JOIN gmed m ON m.grp = h.grp
      GROUP BY h.grp, abs(h.xq - m.med)
    ),
    uhist AS (
      SELECT u, CAST(SUM(cg) AS BIGINT) AS cu FROM devh GROUP BY u
    ),
    tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS n FROM uhist),
    scores AS (
      SELECT u, cu,
             CAST(floor(({_probit_sql(
                 "0.5 + (2.0 * au + cu + 1.0) / (4.0 * (n + 1.0))"
             )}) * 1e9 + 0.5) AS BIGINT) AS t9,
             CAST(floor(({_probit_sql(
                 "0.5 + (2.0 * au + cu + 1.0) / (4.0 * (n + 1.0))"
             )}) * ({_probit_sql(
                 "0.5 + (2.0 * au + cu + 1.0) / (4.0 * (n + 1.0))"
             )}) * 1e9 + 0.5) AS BIGINT) AS t18
      FROM (
        SELECT u, cu,
               CAST(SUM(cu) OVER (ORDER BY u) - cu AS BIGINT) AS au
        FROM uhist
      ) CROSS JOIN tot
    ),
    pergrp AS (
      SELECT d.grp, CAST(SUM(d.cg) AS BIGINT) AS ng,
             CAST(SUM(d.cg * s.t9) AS BIGINT) AS sg9
      FROM devh d JOIN scores s ON s.u = d.u
      GROUP BY d.grp
    ),
    gstats AS (
      SELECT CAST(SUM(cu * t9) AS BIGINT) AS s9,
             CAST(SUM(cu * t18) AS BIGINT) AS s18
      FROM scores
    ),
    terms AS (
      SELECT p.grp, p.ng, t.n, g.s9, g.s18,
             CAST(floor(p.ng
               * ((CAST(p.sg9 AS DOUBLE) / 1e9 / p.ng)
                  - (CAST(g.s9 AS DOUBLE) / 1e9 / t.n))
               * ((CAST(p.sg9 AS DOUBLE) / 1e9 / p.ng)
                  - (CAST(g.s9 AS DOUBLE) / 1e9 / t.n)) * 1e9 + 0.5)
               AS BIGINT) AS g9
      FROM pergrp p CROSS JOIN tot t CROSS JOIN gstats g
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k, MAX(n) AS n,
           round((CAST(SUM(g9) AS DOUBLE) / 1e9)
                 / ((CAST(MAX(s18) AS DOUBLE) / 1e9
                     - MAX(n) * (CAST(MAX(s9) AS DOUBLE) / 1e9 / MAX(n))
                       * (CAST(MAX(s9) AS DOUBLE) / 1e9 / MAX(n)))
                    / (MAX(n) - 1)), 6) AS fligner_chi2,
           CAST(COUNT(*) AS BIGINT) - 1 AS df
    FROM terms
    """,
)
def q_stats_fligner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fligner-Killeen test for variance homogeneity across event types
    — the RANK-based member of the scale-test family (q_stats_levene =
    mean-based, q_stats_bartlett = parametric): median-centered absolute
    deviations are midranked over the POOLED sample and transformed
    through the normal quantile a = Phi^-1(0.5 + r/(2(N+1))); the
    chi-square compares per-group mean scores.  Most robust of the
    three to heavy tails — exactly the regime revenue data lives in.

    No global row sort and no CDF tables: per-group medians are exact
    cum*2 >= n crossings on the per-group histogram; |x - med| collapses
    back to a (grp, deviation) histogram; POOLED midranks are one
    running count over the bounded distinct-deviation relation
    (half-integers kept as the exact 2a+c+1 integer); Phi^-1 is the
    Acklam 3-region rational closure (_probit_sql/_probit_col — new
    mirrored primitive, bitwise-identical across engines); each score
    and its square are pinned onto 1e9 summand grids so every
    aggregation is order-free.  The k-row finish is fixed-order IEEE."""
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    ghist = pool.groupBy("grp", "xq").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wg = Window.partitionBy("grp").orderBy("xq")
    wgall = Window.partitionBy("grp")
    gmed = (
        ghist.select(
            "grp",
            "xq",
            F.sum("c").over(wg).alias("cum"),
            F.sum("c").over(wgall).alias("ng"),
        )
        .filter(2 * F.col("cum") >= F.col("ng"))
        .groupBy("grp")
        .agg(F.min("xq").cast("long").alias("med"))
    )
    devh = (
        ghist.join(
            F.broadcast(gmed.withColumnRenamed("grp", "m_grp")),
            F.col("m_grp") == F.col("grp"),
        )
        .groupBy("grp", F.abs(F.col("xq") - F.col("med")).alias("u"))
        .agg(F.sum("c").cast("long").alias("cg"))
    )
    uhist = devh.groupBy("u").agg(F.sum("cg").cast("long").alias("cu"))
    tot = uhist.agg(F.sum("cu").cast("long").alias("n"))
    wu = Window.orderBy("u").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    au = uhist.select(
        "u", "cu", (F.sum("cu").over(wu) - F.col("cu")).cast("long").alias("au")
    )
    pexpr = 0.5 + (
        2.0 * F.col("au") + F.col("cu") + 1.0
    ) / (4.0 * (F.col("n") + 1.0))
    # project the Acklam closure ONCE, then pin both grids off the
    # materialized column — inlining it expands the rational polynomial
    # three times in codegen (measured 2.6s -> ~1.3s at sf0.1); the
    # pinned values are identical either way
    scores = (
        au.crossJoin(F.broadcast(tot))
        .select("u", "cu", _probit_col(pexpr).alias("aq"))
        .select(
            "u",
            "cu",
            F.floor(F.col("aq") * 1e9 + 0.5).cast("long").alias("t9"),
            F.floor(F.col("aq") * F.col("aq") * 1e9 + 0.5)
            .cast("long")
            .alias("t18"),
        )
    )
    pergrp = (
        devh.join(scores.select("u", "t9"), "u")
        .groupBy("grp")
        .agg(
            F.sum("cg").cast("long").alias("ng"),
            F.sum(F.col("cg") * F.col("t9")).cast("long").alias("sg9"),
        )
    )
    glob = scores.agg(
        F.sum(F.col("cu") * F.col("t9")).cast("long").alias("s9"),
        F.sum(F.col("cu") * F.col("t18")).cast("long").alias("s18"),
    )
    dev = (
        F.col("sg9").cast("double") / 1e9 / F.col("ng")
    ) - (F.col("s9").cast("double") / 1e9 / F.col("n"))
    terms = (
        pergrp.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(glob))
        .select(
            "grp",
            "ng",
            "n",
            "s9",
            "s18",
            F.floor(F.col("ng") * dev * dev * 1e9 + 0.5)
            .cast("long")
            .alias("g9"),
        )
    )
    abar = F.max("s9").cast("double") / 1e9 / F.max("n")
    v = (
        F.max("s18").cast("double") / 1e9 - F.max("n") * abar * abar
    ) / (F.max("n") - 1)
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("n").alias("n"),
        F.round((F.sum("g9").cast("double") / 1e9) / v, 6).alias(
            "fligner_chi2"
        ),
        (F.count(F.lit(1)).cast("long") - 1).alias("df"),
    )


@query(
    "q_stats_vanderwaerden",
    oracle=f"""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    ghist AS (
      SELECT grp, xq, CAST(COUNT(*) AS BIGINT) AS cg
      FROM pool GROUP BY grp, xq
    ),
    uhist AS (
      SELECT xq, CAST(SUM(cg) AS BIGINT) AS cu FROM ghist GROUP BY xq
    ),
    tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS n FROM uhist),
    scores AS (
      SELECT xq, cu,
             CAST(floor(({_probit_sql(
                 "((2.0 * au + cu + 1.0) / 2.0) / (n + 1.0)"
             )}) * 1e9 + 0.5) AS BIGINT) AS t9,
             CAST(floor(({_probit_sql(
                 "((2.0 * au + cu + 1.0) / 2.0) / (n + 1.0)"
             )}) * ({_probit_sql(
                 "((2.0 * au + cu + 1.0) / 2.0) / (n + 1.0)"
             )}) * 1e9 + 0.5) AS BIGINT) AS t18
      FROM (
        SELECT xq, cu,
               CAST(SUM(cu) OVER (ORDER BY xq) - cu AS BIGINT) AS au
        FROM uhist
      ) CROSS JOIN tot
    ),
    pergrp AS (
      SELECT g.grp, CAST(SUM(g.cg) AS BIGINT) AS ng,
             CAST(SUM(g.cg * s.t9) AS BIGINT) AS sg9
      FROM ghist g JOIN scores s ON s.xq = g.xq
      GROUP BY g.grp
    ),
    gstats AS (
      SELECT CAST(SUM(cu * t9) AS BIGINT) AS s9,
             CAST(SUM(cu * t18) AS BIGINT) AS s18
      FROM scores
    ),
    terms AS (
      SELECT p.grp, p.ng, t.n, g.s9, g.s18,
             CAST(floor(p.ng
               * ((CAST(p.sg9 AS DOUBLE) / 1e9 / p.ng)
                  - (CAST(g.s9 AS DOUBLE) / 1e9 / t.n))
               * ((CAST(p.sg9 AS DOUBLE) / 1e9 / p.ng)
                  - (CAST(g.s9 AS DOUBLE) / 1e9 / t.n)) * 1e9 + 0.5)
               AS BIGINT) AS g9
      FROM pergrp p CROSS JOIN tot t CROSS JOIN gstats g
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k, MAX(n) AS n,
           round((CAST(SUM(g9) AS DOUBLE) / 1e9)
                 / ((CAST(MAX(s18) AS DOUBLE) / 1e9
                     - MAX(n) * (CAST(MAX(s9) AS DOUBLE) / 1e9 / MAX(n))
                       * (CAST(MAX(s9) AS DOUBLE) / 1e9 / MAX(n)))
                    / (MAX(n) - 1)), 6) AS vdw_chi2,
           CAST(COUNT(*) AS BIGINT) - 1 AS df
    FROM terms
    """,
)
def q_stats_vanderwaerden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Van der Waerden normal-scores test across event types — the
    LOCATION sibling of q_stats_fligner (which scores deviations for
    scale): pooled value midranks are transformed through
    Phi^-1(r/(N+1)) and the chi-square compares per-group mean scores.
    Asymptotically as powerful as ANOVA under normality while staying
    rank-robust — the bridge between q_stats_anova and q_stats_kruskal.

    Identical scale shape to fligner minus the median-centering step:
    one (grp, value) histogram, pooled midranks as one running count
    over the distinct-value relation (exact 2a+c+1 half-integer
    algebra), the Acklam probit closure for scores, 1e9-grid pinning
    before every order-free sum, fixed-order k-row finish (tie-general
    centered form: scores' pooled mean is subtracted, so heavy ties
    cannot bias the statistic)."""
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    ghist = pool.groupBy("grp", "xq").agg(
        F.count(F.lit(1)).cast("long").alias("cg")
    )
    uhist = ghist.groupBy("xq").agg(F.sum("cg").cast("long").alias("cu"))
    tot = uhist.agg(F.sum("cu").cast("long").alias("n"))
    wu = Window.orderBy("xq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    au = uhist.select(
        "xq",
        "cu",
        (F.sum("cu").over(wu) - F.col("cu")).cast("long").alias("au"),
    )
    pexpr = (
        (2.0 * F.col("au") + F.col("cu") + 1.0) / 2.0
    ) / (F.col("n") + 1.0)
    # single probit projection (see q_stats_fligner's codegen note)
    scores = (
        au.crossJoin(F.broadcast(tot))
        .select("xq", "cu", _probit_col(pexpr).alias("aq"))
        .select(
            "xq",
            "cu",
            F.floor(F.col("aq") * 1e9 + 0.5).cast("long").alias("t9"),
            F.floor(F.col("aq") * F.col("aq") * 1e9 + 0.5)
            .cast("long")
            .alias("t18"),
        )
    )
    pergrp = (
        ghist.join(scores.select("xq", "t9"), "xq")
        .groupBy("grp")
        .agg(
            F.sum("cg").cast("long").alias("ng"),
            F.sum(F.col("cg") * F.col("t9")).cast("long").alias("sg9"),
        )
    )
    gstats = scores.agg(
        F.sum(F.col("cu") * F.col("t9")).cast("long").alias("s9"),
        F.sum(F.col("cu") * F.col("t18")).cast("long").alias("s18"),
    )
    dev = (
        F.col("sg9").cast("double") / 1e9 / F.col("ng")
    ) - (F.col("s9").cast("double") / 1e9 / F.col("n"))
    terms = (
        pergrp.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(gstats))
        .select(
            "grp",
            "ng",
            "n",
            "s9",
            "s18",
            F.floor(F.col("ng") * dev * dev * 1e9 + 0.5)
            .cast("long")
            .alias("g9"),
        )
    )
    abar = F.max("s9").cast("double") / 1e9 / F.max("n")
    v = (
        F.max("s18").cast("double") / 1e9 - F.max("n") * abar * abar
    ) / (F.max("n") - 1)
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("n").alias("n"),
        F.round((F.sum("g9").cast("double") / 1e9) / v, 6).alias(
            "vdw_chi2"
        ),
        (F.count(F.lit(1)).cast("long") - 1).alias("df"),
    )


PH_DELTA = 0.5


@query(
    "q_events_page_hinkley",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS grp, strftime(ts, '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    idxd AS (
      SELECT grp, day, c,
             CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY day)
                  AS BIGINT) AS i,
             CAST(SUM(c) OVER (PARTITION BY grp ORDER BY day)
                  AS BIGINT) AS cum
      FROM daily
    ),
    walk AS (
      SELECT grp, day, i,
             SUM(CAST(c AS DOUBLE) - CAST(cum AS DOUBLE) / i
                 - {PH_DELTA!r})
               OVER (PARTITION BY grp ORDER BY i) AS m
      FROM idxd
    ),
    ph AS (
      SELECT grp, day, i,
             CAST(floor((m - MIN(m) OVER (PARTITION BY grp ORDER BY i))
                        * 1e6 + 0.5) AS BIGINT) AS phq
      FROM walk
    ),
    mx AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(MAX(phq) AS BIGINT) AS mxq
      FROM ph GROUP BY grp
    )
    SELECT m.grp, m.n_days,
           round(CAST(m.mxq AS DOUBLE) / 1e6, 4) AS ph_max,
           MIN(p.day) AS alarm_day
    FROM mx m JOIN ph p ON p.grp = m.grp AND p.phq = m.mxq
    GROUP BY m.grp, m.n_days, m.mxq
    ORDER BY m.grp
    """,
)
def q_events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift detector on the per-type daily count series:
    the cumulative deviation-from-running-mean walk m_t (drift
    allowance δ={PH_DELTA}), its running minimum, and the peak
    excursion PH = max_t(m_t − min_s≤t m_s) with the day it peaks —
    the classic sequential changepoint alarm (complements
    q_events_cusum's known-baseline form: PH needs NO baseline, the
    running mean is the baseline).

    The corpus collapses to the bounded (type, day) relation first;
    the walk, its running minimum, and the excursion all ride ordered
    windows over ≤31 rows per type — sequential cumulative doubles are
    deterministic here because each group's window is a single ordered
    partition evaluated in the same order by both engines.  The peak
    day is an exact pinned-grid argmax (earliest day on ties)."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("grp"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wo = Window.partitionBy("grp").orderBy("day")
    wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    idxd = daily.select(
        "grp",
        "day",
        "c",
        F.row_number().over(wo).cast("long").alias("i"),
        F.sum("c").over(wcum).cast("long").alias("cum"),
    )
    wi = Window.partitionBy("grp").orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walk = idxd.select(
        "grp",
        "day",
        "i",
        F.sum(
            F.col("c").cast("double")
            - F.col("cum").cast("double") / F.col("i")
            - PH_DELTA
        )
        .over(wi)
        .alias("m"),
    )
    ph = walk.select(
        "grp",
        "day",
        "i",
        F.floor((F.col("m") - F.min("m").over(wi)) * 1e6 + 0.5)
        .cast("long")
        .alias("phq"),
    )
    mx = ph.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("phq").cast("long").alias("mxq"),
    )
    return (
        mx.join(
            ph.select(F.col("grp").alias("p_grp"), "phq", "day"),
            (F.col("p_grp") == F.col("grp")) & (F.col("phq") == F.col("mxq")),
        )
        .groupBy("grp", "n_days", "mxq")
        .agg(F.min("day").alias("alarm_day"))
        .select(
            "grp",
            "n_days",
            F.round(F.col("mxq").cast("double") / 1e6, 4).alias("ph_max"),
            "alarm_day",
        )
        .orderBy("grp")
    )


AB_G1, AB_G2 = "click", "purchase"


@query(
    "q_stats_ansari_bradley",
    oracle=f"""
    WITH pool AS (
      SELECT CASE WHEN event_type = '{AB_G1}' THEN 1 ELSE 2 END AS s,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events WHERE event_type IN ('{AB_G1}', '{AB_G2}')
    ),
    hist AS (
      SELECT xq, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM pool GROUP BY xq
    ),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(c1) AS BIGINT) AS n1
      FROM hist
    ),
    ranked AS (
      SELECT xq, c, c1,
             CAST(SUM(c) OVER (ORDER BY xq) - c AS BIGINT) AS a
      FROM hist
    ),
    runs AS (
      SELECT c, c1, t.n, t.n1,
             a + 1 AS lo, a + c AS hi, (t.n + 1) // 2 AS m
      FROM ranked CROSS JOIN tot t
    ),
    sv AS (
      SELECT c, c1, n, n1,
             (CASE WHEN LEAST(hi, m) >= lo
                   THEN (lo + LEAST(hi, m))
                        * (LEAST(hi, m) - lo + 1) // 2
                   ELSE 0 END
              + CASE WHEN hi >= GREATEST(lo, m + 1)
                     THEN (hi - GREATEST(lo, m + 1) + 1) * (n + 1)
                          - (GREATEST(lo, m + 1) + hi)
                            * (hi - GREATEST(lo, m + 1) + 1) // 2
                     ELSE 0 END) AS sc
      FROM runs
    ),
    agg AS (
      SELECT MAX(n) AS n, MAX(n1) AS n1,
             CAST(SUM(sc) AS BIGINT) AS s_all,
             CAST(SUM(CAST(floor(c1 * (CAST(sc AS DOUBLE) / c) * 1e6
                                 + 0.5) AS HUGEINT)) AS HUGEINT) AS ab6,
             CAST(SUM(CAST(floor((CAST(sc AS DOUBLE) * sc / c) * 1e6
                                 + 0.5) AS HUGEINT)) AS HUGEINT) AS sq6
      FROM sv
    )
    SELECT n1, n - n1 AS n2,
           round(CAST(ab6 AS DOUBLE) / 1e6, 4) AS ab,
           round(CAST(n1 AS DOUBLE) * s_all / n, 4) AS e_ab,
           round((CAST(ab6 AS DOUBLE) / 1e6
                  - CAST(n1 AS DOUBLE) * s_all / n)
                 / sqrt(CAST(n1 AS DOUBLE) * (n - n1)
                        * (n * (CAST(sq6 AS DOUBLE) / 1e6)
                           - CAST(s_all AS DOUBLE) * s_all)
                        / (CAST(n AS DOUBLE) * n * (n - 1))), 6) AS z
    FROM agg
    """,
)
def q_stats_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley two-sample scale test ({AB_G1} vs {AB_G2} event
    values): pooled ranks folded toward the extremes via the score
    min(r, N+1−r), tie-corrected normal approximation — the TWO-sample
    member of the dispersion family (bartlett parametric-k, levene
    mean-k, fligner rank-k; AB asks 'same spread?' for a pair without
    any normality assumption).

    No global row sort and no per-row score: for a tied run occupying
    positions a+1..a+c the score SUM is closed-form — Σi over the
    below-midpoint stretch plus Σ(N+1−i) over the above stretch, both
    exact integer arithmetic off the histogram's running count.  Tied
    observations share the run's average score S/c (the standard tie
    treatment), carried on 1e6 grids into HUGEINT/DECIMAL(38) sums (the
    Σ S²/c term reaches ~N³/4·1e6 at sf10 — far past BIGINT).  The
    1-row finish is the tie-corrected moment form
    Var = n1·n2·(N·Σs² − S²)/(N²(N−1))."""
    pool = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(AB_G1, AB_G2))
        .select(
            F.when(F.col("event_type") == AB_G1, 1).otherwise(2).alias("s"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
        )
    )
    hist = pool.groupBy("xq").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    tot = hist.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum("c1").cast("long").alias("n1"),
    )
    wcum = Window.orderBy("xq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = hist.select(
        "xq",
        "c",
        "c1",
        (F.sum("c").over(wcum) - F.col("c")).cast("long").alias("a"),
    )
    runs = ranked.crossJoin(F.broadcast(tot)).select(
        "c",
        "c1",
        "n",
        "n1",
        (F.col("a") + 1).alias("lo"),
        (F.col("a") + F.col("c")).alias("hi"),
        F.expr("(n + 1) div 2").alias("m"),
    )
    lo, hi, m, n = F.col("lo"), F.col("hi"), F.col("m"), F.col("n")
    low_q = F.least(hi, m)
    hi_p = F.greatest(lo, m + 1)
    sc = F.when(
        low_q >= lo, F.expr("(lo + least(hi, m)) * (least(hi, m) - lo + 1) div 2")
    ).otherwise(0) + F.when(
        hi >= hi_p,
        (hi - hi_p + 1) * (n + 1)
        - F.expr(
            "(greatest(lo, m + 1) + hi)"
            " * (hi - greatest(lo, m + 1) + 1) div 2"
        ),
    ).otherwise(0)
    sv = runs.select("c", "c1", "n", "n1", sc.alias("sc"))
    agg = sv.agg(
        F.max("n").alias("n"),
        F.max("n1").alias("n1"),
        F.sum("sc").cast("long").alias("s_all"),
        F.sum(
            F.floor(
                F.col("c1") * (F.col("sc").cast("double") / F.col("c")) * 1e6
                + 0.5
            ).cast("decimal(38,0)")
        ).alias("ab6"),
        F.sum(
            F.floor(
                (F.col("sc").cast("double") * F.col("sc") / F.col("c")) * 1e6
                + 0.5
            ).cast("decimal(38,0)")
        ).alias("sq6"),
    )
    ab = F.col("ab6").cast("double") / 1e6
    e_ab = F.col("n1").cast("double") * F.col("s_all") / F.col("n")
    var = (
        F.col("n1").cast("double")
        * (F.col("n") - F.col("n1"))
        * (
            F.col("n") * (F.col("sq6").cast("double") / 1e6)
            - F.col("s_all").cast("double") * F.col("s_all")
        )
        / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
    )
    return agg.select(
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        F.round(ab, 4).alias("ab"),
        F.round(e_ab, 4).alias("e_ab"),
        F.round((ab - e_ab) / F.sqrt(var), 6).alias("z"),
    )


KDE_POINTS = 20
KDE_STEP = 25.0   # evaluation grid 0, 25, ..., 475 (value domain)
KDE_BW = 25.0     # Gaussian bandwidth
_KDE_NORM = 0.3989422804014327  # 1/sqrt(2*pi)


@query(
    "q_events_kde",
    oracle=f"""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    hist AS (
      SELECT grp, xq, CAST(COUNT(*) AS BIGINT) AS c
      FROM pool GROUP BY grp, xq
    ),
    tot AS (
      SELECT grp, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY grp
    ),
    grid AS (
      SELECT CAST(unnest(range({KDE_POINTS})) AS BIGINT) * {KDE_STEP!r}
        AS g
    ),
    terms AS (
      SELECT h.grp, d.g,
             CAST(floor(h.c * exp(-0.5
               * ((CAST(h.xq AS DOUBLE) / 100.0 - d.g) / {KDE_BW!r})
               * ((CAST(h.xq AS DOUBLE) / 100.0 - d.g) / {KDE_BW!r}))
               * 1e6 + 0.5) AS BIGINT) AS k6
      FROM hist h CROSS JOIN grid d
    )
    SELECT t.grp, t.g AS grid_x,
           round(CAST(SUM(t.k6) AS DOUBLE) / 1e6 * {_KDE_NORM!r}
                 / ({KDE_BW!r} * n.n), 8) AS density
    FROM terms t JOIN tot n ON n.grp = t.grp
    GROUP BY t.grp, t.g, n.n
    ORDER BY t.grp, t.g
    """,
)
def q_events_kde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian kernel density estimate of the per-type value
    distribution on a fixed {KDE_POINTS}-point grid (bandwidth
    {KDE_BW:.0f}) — the smooth density curve behind every histogram
    dashboard, and the shape screen that catches bimodality that
    q_stats_profile's moments and q_stats_boxplot's fences both miss.

    The corpus collapses to the (type, cent-value) histogram FIRST, so
    the kernel evaluates once per DISTINCT value per grid point (a
    bounded |distinct|×{KDE_POINTS} relation) with the count as the
    weight — never per raw row.  Each weighted kernel term is pinned
    onto a 1e6 summand grid (the exp closure evaluates on identical
    IEEE operands both engines), making the per-(type, grid) reduction
    order-free; the normalization constant 1/√2π is an embedded
    literal."""
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    hist = pool.groupBy("grp", "xq").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = hist.groupBy("grp").agg(F.sum("c").cast("long").alias("n"))
    grid = spark.range(KDE_POINTS).select(
        (F.col("id").cast("long") * KDE_STEP).alias("g")
    )
    z = (F.col("xq").cast("double") / 100.0 - F.col("g")) / KDE_BW
    terms = hist.crossJoin(F.broadcast(grid)).select(
        "grp",
        "g",
        F.floor(F.col("c") * F.exp(-0.5 * z * z) * 1e6 + 0.5)
        .cast("long")
        .alias("k6"),
    )
    return (
        terms.join(F.broadcast(tot), "grp")
        .groupBy("grp", F.col("g").alias("grid_x"), "n")
        .agg(
            F.round(
                F.sum("k6").cast("double")
                / 1e6
                * _KDE_NORM
                / (KDE_BW * F.col("n")),
                8,
            ).alias("density")
        )
        .select("grp", "grid_x", "density")
        .orderBy("grp", "grid_x")
    )


EV_RETURN_T = (30, 365)
_EULER_GAMMA = 0.5772156649015329
_SQRT6_OVER_PI = 0.7796968012336393


@query(
    "q_stats_extreme_value",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS grp, strftime(ts, '%Y-%m-%d') AS day,
             CAST(MAX(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS mx
      FROM events GROUP BY 1, 2
    ),
    mom AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(mx) AS BIGINT) AS s1,
             CAST(SUM(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS s2
      FROM daily GROUP BY grp
    ),
    fitted AS (
      SELECT grp, n_days,
             sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) / n_days * s1)
                  / (n_days - 1)) * {_SQRT6_OVER_PI!r} AS beta,
             CAST(s1 AS DOUBLE) / n_days
               - {_EULER_GAMMA!r}
                 * (sqrt((CAST(s2 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) / n_days * s1)
                         / (n_days - 1)) * {_SQRT6_OVER_PI!r}) AS mu
      FROM mom
    )
    SELECT grp, n_days,
           round(mu / 100.0, 4) AS gumbel_mu,
           round(beta / 100.0, 4) AS gumbel_beta,
           round((mu - beta * ln(-ln(1.0 - 1.0 / {EV_RETURN_T[0]})))
                 / 100.0, 4) AS return_level_30,
           round((mu - beta * ln(-ln(1.0 - 1.0 / {EV_RETURN_T[1]})))
                 / 100.0, 4) AS return_level_365
    FROM fitted ORDER BY grp
    """,
)
def q_stats_extreme_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit of DAILY MAXIMUM event values per type
    (method of moments: β = sd·√6/π, μ = mean − γ·β) with 30-day and
    365-day return levels x_T = μ − β·ln(−ln(1−1/T)) — the capacity
    question ('what's the biggest value we should expect this year?')
    that quantiles of the raw distribution systematically under-answer,
    because maxima follow the extreme-value family, not the parent.

    Block maxima are exact integer cents off one (type, day) collapse;
    the moment fit is fixed-order IEEE on exact HUGEINT carriers over
    the ≤31-row daily-max relation; γ and √6/π are embedded literals
    and the only transcendentals are two ln calls on constants per
    group."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("grp"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.max(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("mx")
        )
    )
    mom = daily.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("mx").cast("long").alias("s1"),
        F.sum(F.col("mx").cast("decimal(38,0)") * F.col("mx")).alias("s2"),
    )
    sd = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double") / F.col("n_days") * F.col("s1")
        )
        / (F.col("n_days") - 1)
    )
    beta = sd * _SQRT6_OVER_PI
    mu = F.col("s1").cast("double") / F.col("n_days") - _EULER_GAMMA * beta
    fitted = mom.select("grp", "n_days", beta.alias("beta"), mu.alias("mu"))
    import math as _math

    rl = {
        T: F.col("mu")
        - F.col("beta") * _math.log(-_math.log(1.0 - 1.0 / T))
        for T in EV_RETURN_T
    }
    return fitted.select(
        "grp",
        "n_days",
        F.round(F.col("mu") / 100.0, 4).alias("gumbel_mu"),
        F.round(F.col("beta") / 100.0, 4).alias("gumbel_beta"),
        F.round(rl[30] / 100.0, 4).alias("return_level_30"),
        F.round(rl[365] / 100.0, 4).alias("return_level_365"),
    ).orderBy("grp")


@query(
    "q_stats_tukey_hsd",
    oracle="""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    mom AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS s1,
             CAST(SUM(CAST(xq AS HUGEINT) * xq) AS HUGEINT) AS s2
      FROM pool GROUP BY grp
    ),
    msw AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) / n * s1)
               / (SUM(n) - COUNT(*)) AS w
      FROM mom
    )
    SELECT a.grp AS type_a, b.grp AS type_b,
           round((CAST(a.s1 AS DOUBLE) / a.n
                  - CAST(b.s1 AS DOUBLE) / b.n) / 100.0, 4) AS mean_diff,
           round(abs(CAST(a.s1 AS DOUBLE) / a.n
                     - CAST(b.s1 AS DOUBLE) / b.n)
                 / sqrt(m.w / 2.0 * (1.0 / a.n + 1.0 / b.n)), 6)
             AS q_stat,
           m.nt - m.k AS df_within
    FROM mom a JOIN mom b ON a.grp < b.grp CROSS JOIN msw m
    ORDER BY a.grp, b.grp
    """,
)
def q_stats_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-Kramer HSD post-hoc: the studentized-range statistic
    q = |mean_i − mean_j| / √(MSW/2·(1/nᵢ+1/nⱼ)) for every event-type
    pair — the step AFTER q_stats_anova rejects: WHICH pairs differ,
    with family-wise error control (compare q to the studentized-range
    critical value, left to the client like every p-lookup here).

    One corpus collapse to per-group exact moment carriers; MSW pools
    the within-group sums in the same fixed operand order as
    q_stats_anova; the pair grid is a k²-row self-join of the 5-row
    moment relation — zero additional corpus scans.  Unequal group
    sizes use the Tukey-Kramer form."""
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    mom = pool.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("s1"),
        F.sum(F.col("xq").cast("decimal(38,0)") * F.col("xq")).alias("s2"),
    )
    msw = mom.agg(
        F.sum("n").cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("k"),
        (
            F.sum(
                F.col("s2").cast("double")
                - F.col("s1").cast("double") / F.col("n") * F.col("s1")
            )
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("w"),
    )
    a = mom.select(
        F.col("grp").alias("type_a"),
        F.col("n").alias("na"),
        F.col("s1").alias("s1a"),
    )
    b = mom.select(
        F.col("grp").alias("type_b"),
        F.col("n").alias("nb"),
        F.col("s1").alias("s1b"),
    )
    diff = (
        F.col("s1a").cast("double") / F.col("na")
        - F.col("s1b").cast("double") / F.col("nb")
    )
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(msw))
        .select(
            "type_a",
            "type_b",
            F.round(diff / 100.0, 4).alias("mean_diff"),
            F.round(
                F.abs(diff)
                / F.sqrt(
                    F.col("w")
                    / 2.0
                    * (1.0 / F.col("na") + 1.0 / F.col("nb"))
                ),
                6,
            ).alias("q_stat"),
            (F.col("nt") - F.col("k")).alias("df_within"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "q_stats_dunn",
    oracle="""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    ghist AS (
      SELECT grp, xq, CAST(COUNT(*) AS BIGINT) AS cg
      FROM pool GROUP BY grp, xq
    ),
    uhist AS (
      SELECT xq, CAST(SUM(cg) AS BIGINT) AS cu FROM ghist GROUP BY xq
    ),
    tot AS (
      SELECT CAST(SUM(cu) AS BIGINT) AS n,
             CAST(SUM(CAST(cu AS HUGEINT) * cu * cu - cu) AS HUGEINT)
               AS ties
      FROM uhist
    ),
    au AS (
      SELECT xq, cu,
             CAST(SUM(cu) OVER (ORDER BY xq) - cu AS BIGINT) AS a
      FROM uhist
    ),
    pergrp AS (
      SELECT g.grp, CAST(SUM(g.cg) AS BIGINT) AS ng,
             CAST(SUM(g.cg * (2 * u.a + u.cu + 1)) AS BIGINT) AS r2
      FROM ghist g JOIN au u ON u.xq = g.xq
      GROUP BY g.grp
    )
    SELECT a.grp AS type_a, b.grp AS type_b,
           round(CAST(a.r2 AS DOUBLE) / 2.0 / a.ng, 4) AS mean_rank_a,
           round(CAST(b.r2 AS DOUBLE) / 2.0 / b.ng, 4) AS mean_rank_b,
           round((CAST(a.r2 AS DOUBLE) / 2.0 / a.ng
                  - CAST(b.r2 AS DOUBLE) / 2.0 / b.ng)
                 / sqrt((CAST(t.n AS DOUBLE) * (t.n + 1) / 12.0
                         - CAST(t.ties AS DOUBLE) / (12.0 * (t.n - 1)))
                        * (1.0 / a.ng + 1.0 / b.ng)), 6) AS z
    FROM pergrp a JOIN pergrp b ON a.grp < b.grp CROSS JOIN tot t
    ORDER BY a.grp, b.grp
    """,
)
def q_stats_dunn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's test: the rank-based post-hoc that follows
    q_stats_kruskal exactly the way q_stats_tukey_hsd follows
    q_stats_anova — pairwise z on POOLED mean ranks with the standard
    tie correction Σ(t³−t)/(12(N−1)) (compare |z| to the
    Bonferroni-adjusted normal critical value, p-lookup left to the
    client).

    The pooled midranks are kruskal's histogram machinery verbatim: one
    (type, cent) collapse, one running count over the distinct-value
    relation, rank sums as the exact 2a+c+1 half-integer algebra (no
    per-row ranks, no global sort); the tie term rides HUGEINT (cu³
    passes BIGINT at sf10); the k²-row pair grid self-joins the bounded
    per-group relation."""
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    ghist = pool.groupBy("grp", "xq").agg(
        F.count(F.lit(1)).cast("long").alias("cg")
    )
    uhist = ghist.groupBy("xq").agg(F.sum("cg").cast("long").alias("cu"))
    tot = uhist.agg(
        F.sum("cu").cast("long").alias("n"),
        F.sum(
            F.col("cu").cast("decimal(38,0)") * F.col("cu") * F.col("cu")
            - F.col("cu")
        ).alias("ties"),
    )
    wcum = Window.orderBy("xq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    au = uhist.select(
        "xq",
        "cu",
        (F.sum("cu").over(wcum) - F.col("cu")).cast("long").alias("a"),
    )
    pergrp = (
        ghist.join(au, "xq")
        .groupBy("grp")
        .agg(
            F.sum("cg").cast("long").alias("ng"),
            F.sum(
                F.col("cg") * (2 * F.col("a") + F.col("cu") + 1)
            )
            .cast("long")
            .alias("r2"),
        )
    )
    a = pergrp.select(
        F.col("grp").alias("type_a"),
        F.col("ng").alias("na"),
        F.col("r2").alias("r2a"),
    )
    b = pergrp.select(
        F.col("grp").alias("type_b"),
        F.col("ng").alias("nb"),
        F.col("r2").alias("r2b"),
    )
    ra = F.col("r2a").cast("double") / 2.0 / F.col("na")
    rb = F.col("r2b").cast("double") / 2.0 / F.col("nb")
    var = (
        F.col("n").cast("double") * (F.col("n") + 1) / 12.0
        - F.col("ties").cast("double") / (12.0 * (F.col("n") - 1))
    ) * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            F.round(ra, 4).alias("mean_rank_a"),
            F.round(rb, 4).alias("mean_rank_b"),
            F.round((ra - rb) / F.sqrt(var), 6).alias("z"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "q_stats_cochran_armitage",
    oracle="""
    WITH cells AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(r) AS BIGINT) AS rt,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM cells
    ),
    sums AS (
      SELECT MAX(t.nt) AS nt, MAX(t.rt) AS rt, MAX(t.k) AS k,
             CAST(SUM(c.w * (c.r * t.nt - c.n * t.rt)) AS BIGINT) AS a,
             CAST(SUM(c.w * c.w * c.n) AS BIGINT) AS sw2n,
             CAST(SUM(c.w * c.n) AS BIGINT) AS swn
      FROM cells c CROSS JOIN tot t
    )
    SELECT k, nt AS n, rt AS n_success,
           round(CAST(a AS DOUBLE) / nt, 6) AS trend_t,
           round(CAST(a AS DOUBLE) * sqrt(CAST(nt AS DOUBLE))
                 / sqrt(CAST(rt AS DOUBLE) * (nt - rt)
                        * (CAST(nt AS DOUBLE) * sw2n
                           - CAST(swn AS DOUBLE) * swn)), 6) AS z
    FROM sums
    """,
)
def q_stats_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: is the 'F' (fulfilled) rate
    MONOTONE in order priority (scores 1..5 from the priority prefix)?
    — the ordered-categories question a plain chi-square of
    independence (q_stats_chi2 family) throws away, and the standard
    dose-response screen re-aimed at operational tiers.

    One conditional-aggregation pass to the ≤5 (priority, n, successes)
    cells; T = Σw(rN − nR)/N and its variance are EXACT integer
    cross-products (every carrier bounded by w·N² ≈ 1e15 at sf10,
    inside BIGINT), combined in one fixed-order z expression —
    z = A·√N / √(R(N−R)·(N·Σw²n − (Σwn)²)), i.e. T/√(p̄(1−p̄)
    (Σw²n − (Σwn)²/N)) with T = A/N (r8 ADVICE fix: the earlier
    form kept a stray /N inside the √, inflating z by √N)."""
    cells = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.substring("o_orderpriority", 1, 1).cast("long").alias("w")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("r"),
        )
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("r").cast("long").alias("rt"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    sums = cells.crossJoin(F.broadcast(tot)).agg(
        F.max("nt").alias("nt"),
        F.max("rt").alias("rt"),
        F.max("k").alias("k"),
        F.sum(
            F.col("w") * (F.col("r") * F.col("nt") - F.col("n") * F.col("rt"))
        )
        .cast("long")
        .alias("a"),
        F.sum(F.col("w") * F.col("w") * F.col("n"))
        .cast("long")
        .alias("sw2n"),
        F.sum(F.col("w") * F.col("n")).cast("long").alias("swn"),
    )
    return sums.select(
        "k",
        F.col("nt").alias("n"),
        F.col("rt").alias("n_success"),
        F.round(F.col("a").cast("double") / F.col("nt"), 6).alias(
            "trend_t"
        ),
        F.round(
            F.col("a").cast("double")
            * F.sqrt(F.col("nt").cast("double"))
            / F.sqrt(
                F.col("rt").cast("double")
                * (F.col("nt") - F.col("rt"))
                * (
                    F.col("nt").cast("double") * F.col("sw2n")
                    - F.col("swn").cast("double") * F.col("swn")
                )
            ),
            6,
        ).alias("z"),
    )


ITS_T0 = 16  # intervention day index (mid-window of the 30-day fixture)


@query(
    "q_events_interrupted_ts",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS grp, strftime(ts, '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    idxd AS (
      SELECT grp, y,
             CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY day)
                  AS BIGINT) AS ti
      FROM daily
    ),
    seg AS (
      SELECT grp,
             CAST(SUM(CASE WHEN ti < {ITS_T0} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN ti < {ITS_T0} THEN ti ELSE 0 END)
                  AS BIGINT) AS st1,
             CAST(SUM(CASE WHEN ti < {ITS_T0} THEN y ELSE 0 END)
                  AS BIGINT) AS sy1,
             CAST(SUM(CASE WHEN ti < {ITS_T0} THEN ti * ti ELSE 0 END)
                  AS BIGINT) AS stt1,
             CAST(SUM(CASE WHEN ti < {ITS_T0} THEN ti * y ELSE 0 END)
                  AS BIGINT) AS sty1,
             CAST(SUM(CASE WHEN ti >= {ITS_T0} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN ti >= {ITS_T0} THEN ti ELSE 0 END)
                  AS BIGINT) AS st2,
             CAST(SUM(CASE WHEN ti >= {ITS_T0} THEN y ELSE 0 END)
                  AS BIGINT) AS sy2,
             CAST(SUM(CASE WHEN ti >= {ITS_T0} THEN ti * ti ELSE 0 END)
                  AS BIGINT) AS stt2,
             CAST(SUM(CASE WHEN ti >= {ITS_T0} THEN ti * y ELSE 0 END)
                  AS BIGINT) AS sty2
      FROM idxd GROUP BY grp
    )
    SELECT grp,
           round((CAST(n1 AS DOUBLE) * sty1 - CAST(st1 AS DOUBLE) * sy1)
                 / (CAST(n1 AS DOUBLE) * stt1
                    - CAST(st1 AS DOUBLE) * st1), 6) AS pre_slope,
           round((CAST(n2 AS DOUBLE) * sty2 - CAST(st2 AS DOUBLE) * sy2)
                 / (CAST(n2 AS DOUBLE) * stt2
                    - CAST(st2 AS DOUBLE) * st2), 6) AS post_slope,
           round((CAST(n2 AS DOUBLE) * sty2 - CAST(st2 AS DOUBLE) * sy2)
                 / (CAST(n2 AS DOUBLE) * stt2
                    - CAST(st2 AS DOUBLE) * st2)
                 - (CAST(n1 AS DOUBLE) * sty1 - CAST(st1 AS DOUBLE) * sy1)
                 / (CAST(n1 AS DOUBLE) * stt1
                    - CAST(st1 AS DOUBLE) * st1), 6) AS slope_change,
           round(((CAST(sy2 AS DOUBLE)
                   - ((CAST(n2 AS DOUBLE) * sty2
                       - CAST(st2 AS DOUBLE) * sy2)
                      / (CAST(n2 AS DOUBLE) * stt2
                         - CAST(st2 AS DOUBLE) * st2)) * st2) / n2
                  + ((CAST(n2 AS DOUBLE) * sty2
                      - CAST(st2 AS DOUBLE) * sy2)
                     / (CAST(n2 AS DOUBLE) * stt2
                        - CAST(st2 AS DOUBLE) * st2)) * {ITS_T0})
                 - ((CAST(sy1 AS DOUBLE)
                     - ((CAST(n1 AS DOUBLE) * sty1
                         - CAST(st1 AS DOUBLE) * sy1)
                        / (CAST(n1 AS DOUBLE) * stt1
                           - CAST(st1 AS DOUBLE) * st1)) * st1) / n1
                    + ((CAST(n1 AS DOUBLE) * sty1
                        - CAST(st1 AS DOUBLE) * sy1)
                       / (CAST(n1 AS DOUBLE) * stt1
                          - CAST(st1 AS DOUBLE) * st1)) * {ITS_T0}), 6)
             AS level_change
    FROM seg ORDER BY grp
    """,
)
def q_events_interrupted_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time-series (segmented regression) on each type's
    daily counts around the mid-window intervention day t0={ITS_T0}:
    separate pre/post OLS fits, the SLOPE change, and the LEVEL change
    (both fits evaluated AT t0) — the causal-inference workhorse for
    'did the deploy/policy change the trend or just shift the level?',
    which q_events_changepoint detects but does not quantify.

    One conditional-aggregation pass computes both segments' five exact
    OLS power sums simultaneously (q_stats_regression's carrier shape,
    doubled by the pre/post CASE); the fits and their differences are
    fixed-order IEEE on the k-row relation — the corpus is scanned
    once, the 30-row daily relation never leaves the engine."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("grp"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w = Window.partitionBy("grp").orderBy("day")
    idxd = daily.select(
        "grp", "y", F.row_number().over(w).cast("long").alias("ti")
    )
    pre = F.col("ti") < ITS_T0
    post = F.col("ti") >= ITS_T0

    def seg_sums(cond, sfx):
        z = F.lit(0)
        return [
            F.sum(F.when(cond, 1).otherwise(z)).cast("long").alias(f"n{sfx}"),
            F.sum(F.when(cond, F.col("ti")).otherwise(z))
            .cast("long")
            .alias(f"st{sfx}"),
            F.sum(F.when(cond, F.col("y")).otherwise(z))
            .cast("long")
            .alias(f"sy{sfx}"),
            F.sum(F.when(cond, F.col("ti") * F.col("ti")).otherwise(z))
            .cast("long")
            .alias(f"stt{sfx}"),
            F.sum(F.when(cond, F.col("ti") * F.col("y")).otherwise(z))
            .cast("long")
            .alias(f"sty{sfx}"),
        ]

    seg = idxd.groupBy("grp").agg(*seg_sums(pre, 1), *seg_sums(post, 2))

    def slope(sfx):
        return (
            F.col(f"n{sfx}").cast("double") * F.col(f"sty{sfx}")
            - F.col(f"st{sfx}").cast("double") * F.col(f"sy{sfx}")
        ) / (
            F.col(f"n{sfx}").cast("double") * F.col(f"stt{sfx}")
            - F.col(f"st{sfx}").cast("double") * F.col(f"st{sfx}")
        )

    def at_t0(sfx):
        b1 = slope(sfx)
        b0 = (
            F.col(f"sy{sfx}").cast("double") - b1 * F.col(f"st{sfx}")
        ) / F.col(f"n{sfx}")
        return b0 + b1 * ITS_T0

    return seg.select(
        "grp",
        F.round(slope(1), 6).alias("pre_slope"),
        F.round(slope(2), 6).alias("post_slope"),
        F.round(slope(2) - slope(1), 6).alias("slope_change"),
        F.round(at_t0(2) - at_t0(1), 6).alias("level_change"),
    ).orderBy("grp")


@query(
    "q_stats_cohens_kappa",
    oracle="""
    WITH scored AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS truth,
             CASE WHEN len(list_filter(
                    string_split_regex(trim(lower(text)), '\\s+'),
                    x -> x IN ('the','a','of'))) > 0
                  THEN 1 ELSE 0 END AS pred
      FROM documents
    ),
    cells AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(truth * pred) AS BIGINT) AS tp,
             CAST(SUM(truth * (1 - pred)) AS BIGINT) AS fn,
             CAST(SUM((1 - truth) * pred) AS BIGINT) AS fp,
             CAST(SUM((1 - truth) * (1 - pred)) AS BIGINT) AS tn
      FROM scored
    )
    SELECT n, tp, fp, fn, tn,
           round(CAST(tp + tn AS DOUBLE) / n, 6) AS po,
           round((CAST(tp + fn AS DOUBLE) * (tp + fp)
                  + CAST(fp + tn AS DOUBLE) * (fn + tn))
                 / (CAST(n AS DOUBLE) * n), 6) AS pe,
           round((CAST(tp + tn AS DOUBLE) / n
                  - (CAST(tp + fn AS DOUBLE) * (tp + fp)
                     + CAST(fp + tn AS DOUBLE) * (fn + tn))
                    / (CAST(n AS DOUBLE) * n))
                 / (1.0 - (CAST(tp + fn AS DOUBLE) * (tp + fp)
                           + CAST(fp + tn AS DOUBLE) * (fn + tn))
                          / (CAST(n AS DOUBLE) * n)), 6) AS kappa
    FROM cells
    """,
)
def q_stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the language-ID heuristic vs the labeled lang
    column (en / not-en): chance-corrected agreement — the number that
    exposes a classifier coasting on class imbalance, where raw
    accuracy (q_text_lang_confusion's po) looks fine.  The
    classifier-audit statistic every labeling pipeline reports next to
    its confusion matrix.

    One conditional-aggregation pass to the exact 2×2 cells (the
    q_text_langid marker heuristic inlined as the predictor); po, pe,
    and κ = (po−pe)/(1−pe) are fixed-order IEEE on the 1-row cell
    relation — integer cross products everywhere before the three
    divisions."""
    from data_warehouse_hive_spark.functions.text import _LANG_MARKERS, tokens

    d = spread(t(spark, sf_dir, "documents").select("lang", "text"), spark)
    ws = tokens(F.lower(F.col("text")))
    pred = F.when(
        F.size(F.filter(ws, lambda x: x.isin(*_LANG_MARKERS["en"]))) > 0, 1
    ).otherwise(0)
    truth = F.when(F.col("lang") == "en", 1).otherwise(0)
    scored = d.select(truth.alias("truth"), pred.alias("pred"))
    cells = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("truth") * F.col("pred")).cast("long").alias("tp"),
        F.sum(F.col("truth") * (1 - F.col("pred"))).cast("long").alias("fn"),
        F.sum((1 - F.col("truth")) * F.col("pred")).cast("long").alias("fp"),
        F.sum((1 - F.col("truth")) * (1 - F.col("pred")))
        .cast("long")
        .alias("tn"),
    )
    po = (F.col("tp") + F.col("tn")).cast("double") / F.col("n")
    pe = (
        (F.col("tp") + F.col("fn")).cast("double")
        * (F.col("tp") + F.col("fp"))
        + (F.col("fp") + F.col("tn")).cast("double")
        * (F.col("fn") + F.col("tn"))
    ) / (F.col("n").cast("double") * F.col("n"))
    return cells.select(
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


@query(
    "q_stats_brown_forsythe",
    oracle="""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    ghist AS (
      SELECT grp, xq, CAST(COUNT(*) AS BIGINT) AS c
      FROM pool GROUP BY grp, xq
    ),
    gmed AS (
      SELECT grp, CAST(MIN(xq) AS BIGINT) AS med FROM (
        SELECT grp, xq,
               SUM(c) OVER (PARTITION BY grp ORDER BY xq) AS cum,
               SUM(c) OVER (PARTITION BY grp) AS ng
        FROM ghist
      ) WHERE 2 * cum >= ng GROUP BY grp
    ),
    zmom AS (
      SELECT h.grp, CAST(SUM(h.c) AS BIGINT) AS n,
             CAST(SUM(h.c * abs(h.xq - m.med)) AS BIGINT) AS s1,
             CAST(SUM(CAST(h.c AS HUGEINT) * abs(h.xq - m.med)
                      * abs(h.xq - m.med)) AS HUGEINT) AS s2
      FROM ghist h JOIN gmed m ON m.grp = h.grp
      GROUP BY h.grp
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nt,
             CAST(SUM(s1) AS BIGINT) AS st1,
             SUM(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) / n * s1)
               AS ssw,
             SUM(CAST(floor((CAST(s1 AS DOUBLE) / n)
                            * (CAST(s1 AS DOUBLE) / n) * n * 1e4 + 0.5)
                      AS BIGINT)) AS wm4
      FROM zmom
    )
    SELECT k, nt AS n,
           round(((CAST(wm4 AS DOUBLE) / 1e4
                   - CAST(st1 AS DOUBLE) * st1 / nt) / (k - 1))
                 / (ssw / (nt - k)), 6) AS bf_f,
           k - 1 AS df1, nt - k AS df2
    FROM tot
    """,
)
def q_stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test: Levene's one-way F on
    MEDIAN-centered absolute deviations — the recommended default of
    the scale family (q_stats_levene's mean centers break under skew,
    q_stats_bartlett under non-normality, q_stats_fligner trades power
    for full rank-robustness; BF is the practical middle).

    Per-group medians are exact cum·2 ≥ n crossings on the per-group
    histogram (the fligner machinery); |x − med| stays an exact integer
    so the per-group deviation moments are exact (HUGEINT squares).
    The between-group sum uses Σnᵢz̄ᵢ² − (Σz)²/N with the nᵢz̄ᵢ² terms
    pinned onto a 1e4 grid (the only non-integer per-group quantity),
    making every reduction order-free; the F ratio is one fixed-order
    expression on the 1-row total."""
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    ghist = pool.groupBy("grp", "xq").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wg = Window.partitionBy("grp").orderBy("xq")
    wgall = Window.partitionBy("grp")
    gmed = (
        ghist.select(
            "grp",
            "xq",
            F.sum("c").over(wg).alias("cum"),
            F.sum("c").over(wgall).alias("ng"),
        )
        .filter(2 * F.col("cum") >= F.col("ng"))
        .groupBy("grp")
        .agg(F.min("xq").cast("long").alias("med"))
    )
    u = F.abs(F.col("xq") - F.col("med"))
    zmom = (
        ghist.join(
            F.broadcast(gmed.withColumnRenamed("grp", "m_grp")),
            F.col("m_grp") == F.col("grp"),
        )
        .groupBy("grp")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(F.col("c") * u).cast("long").alias("s1"),
            F.sum(F.col("c").cast("decimal(38,0)") * u * u).alias("s2"),
        )
    )
    zbar = F.col("s1").cast("double") / F.col("n")
    tot = zmom.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nt"),
        F.sum("s1").cast("long").alias("st1"),
        F.sum(
            F.col("s2").cast("double")
            - F.col("s1").cast("double") / F.col("n") * F.col("s1")
        ).alias("ssw"),
        F.sum(
            F.floor(zbar * zbar * F.col("n") * 1e4 + 0.5).cast("long")
        ).alias("wm4"),
    )
    bf = (
        (
            F.col("wm4").cast("double") / 1e4
            - F.col("st1").cast("double") * F.col("st1") / F.col("nt")
        )
        / (F.col("k") - 1)
    ) / (F.col("ssw") / (F.col("nt") - F.col("k")))
    return tot.select(
        "k",
        F.col("nt").alias("n"),
        F.round(bf, 6).alias("bf_f"),
        (F.col("k") - 1).alias("df1"),
        (F.col("nt") - F.col("k")).alias("df2"),
    )


@query(
    "q_stats_welch_anova",
    oracle="""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    mom AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS s1,
             CAST(SUM(CAST(xq AS HUGEINT) * xq) AS HUGEINT) AS s2
      FROM pool GROUP BY grp
    ),
    der AS (
      SELECT grp, n,
             CAST(s1 AS DOUBLE) / n AS m,
             n / ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) / n * s1)
                  / (n - 1)) AS w
      FROM mom
    ),
    wsum AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(floor(w * 1e12 + 0.5) AS BIGINT)) AS BIGINT)
               AS w12,
             CAST(SUM(CAST(floor(w * m * 1e9 + 0.5) AS BIGINT))
                  AS BIGINT) AS wm9,
             CAST(SUM(CAST(floor(w * m * m * 1e6 + 0.5) AS HUGEINT))
                  AS HUGEINT) AS wm26
      FROM der
    ),
    lam AS (
      SELECT MAX(s.k) AS k, MAX(s.w12) AS w12, MAX(s.wm9) AS wm9,
             MAX(s.wm26) AS wm26,
             CAST(SUM(CAST(floor(
               (1.0 - d.w / (CAST(s.w12 AS DOUBLE) / 1e12))
               * (1.0 - d.w / (CAST(s.w12 AS DOUBLE) / 1e12))
               / (d.n - 1) * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS l12
      FROM der d CROSS JOIN wsum s
    )
    SELECT k,
           round(((CAST(wm26 AS DOUBLE) / 1e6
                   - (CAST(wm9 AS DOUBLE) / 1e9)
                     * (CAST(wm9 AS DOUBLE) / 1e9)
                     / (CAST(w12 AS DOUBLE) / 1e12)) / (k - 1))
                 / (1.0 + (2.0 * (k - 2) / (CAST(k AS DOUBLE) * k - 1.0))
                          * (3.0 * (CAST(l12 AS DOUBLE) / 1e12)
                             / (CAST(k AS DOUBLE) * k - 1.0))
                          * (CAST(k AS DOUBLE) * k - 1.0) / 3.0), 6)
             AS welch_f,
           k - 1 AS df1,
           round((CAST(k AS DOUBLE) * k - 1.0)
                 / (3.0 * (CAST(l12 AS DOUBLE) / 1e12)), 4) AS df2
    FROM lam
    """,
)
def q_stats_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA across event types —
    q_stats_anova without its equal-variances assumption (the k-sample
    generalization of q_stats_welch_t): precision weights wᵢ = nᵢ/sᵢ²,
    F* = Σw(mᵢ−m̄w)²/(k−1) over the Welch correction term, with the
    Welch-Satterthwaite denominator df.

    One exact moment pass; the three weighted sums (Σw, Σwm, Σwm²) are
    pinned onto 1e12/1e9/1e6 grids per group so the k-row reductions
    are order-free (Σw(m−m̄w)² expands to Σwm² − (Σwm)²/Σw — no second
    pass for the weighted mean); the Λ term re-joins the 1-row weight
    total and is pinned the same way.  All remaining arithmetic is
    fixed-order on the final row."""
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    mom = pool.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("s1"),
        F.sum(F.col("xq").cast("decimal(38,0)") * F.col("xq")).alias("s2"),
    )
    der = mom.select(
        "grp",
        "n",
        (F.col("s1").cast("double") / F.col("n")).alias("m"),
        (
            F.col("n")
            / (
                (
                    F.col("s2").cast("double")
                    - F.col("s1").cast("double") / F.col("n") * F.col("s1")
                )
                / (F.col("n") - 1)
            )
        ).alias("w"),
    )
    wsum = der.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.floor(F.col("w") * 1e12 + 0.5).cast("long"))
        .cast("long")
        .alias("w12"),
        F.sum(F.floor(F.col("w") * F.col("m") * 1e9 + 0.5).cast("long"))
        .cast("long")
        .alias("wm9"),
        F.sum(
            F.floor(
                F.col("w") * F.col("m") * F.col("m") * 1e6 + 0.5
            ).cast("decimal(38,0)")
        ).alias("wm26"),
    )
    lam = der.crossJoin(F.broadcast(wsum)).agg(
        F.max("k").alias("k"),
        F.max("w12").alias("w12"),
        F.max("wm9").alias("wm9"),
        F.max("wm26").alias("wm26"),
        F.sum(
            F.floor(
                (1.0 - F.col("w") / (F.col("w12").cast("double") / 1e12))
                * (1.0 - F.col("w") / (F.col("w12").cast("double") / 1e12))
                / (F.col("n") - 1)
                * 1e12
                + 0.5
            ).cast("long")
        )
        .cast("long")
        .alias("l12"),
    )
    kd = F.col("k").cast("double")
    lamv = 3.0 * (F.col("l12").cast("double") / 1e12) / (kd * F.col("k") - 1.0)
    num = (
        F.col("wm26").cast("double") / 1e6
        - (F.col("wm9").cast("double") / 1e9)
        * (F.col("wm9").cast("double") / 1e9)
        / (F.col("w12").cast("double") / 1e12)
    ) / (F.col("k") - 1)
    den = 1.0 + (2.0 * (F.col("k") - 2) / (kd * F.col("k") - 1.0)) * lamv * (
        kd * F.col("k") - 1.0
    ) / 3.0
    return lam.select(
        "k",
        F.round(num / den, 6).alias("welch_f"),
        (F.col("k") - 1).alias("df1"),
        F.round(
            (kd * F.col("k") - 1.0)
            / (3.0 * (F.col("l12").cast("double") / 1e12)),
            4,
        ).alias("df2"),
    )


@query(
    "q_stats_bimodality",
    oracle=f"""
    WITH pool AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
      FROM events
    ),
    sums AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS s1,
             CAST(SUM(CAST(xq AS HUGEINT) * xq) AS HUGEINT) AS s2,
             CAST(SUM(CAST(xq AS HUGEINT) * xq * xq) AS HUGEINT) AS s3,
             CAST(SUM(CAST(xq AS HUGEINT) * xq * xq * xq) AS HUGEINT) AS s4
      FROM pool GROUP BY grp
    )
    SELECT grp, n,
           round({_DA_SK}, 6) AS skewness,
           round({_DA_B2} - 3.0, 6) AS kurtosis_excess,
           round(({_DA_SK} * {_DA_SK} + 1.0)
                 / (({_DA_B2} - 3.0)
                    + 3.0 * (CAST(n AS DOUBLE) - 1.0) * (n - 1.0)
                      / ((n - 2.0) * (n - 3.0))), 6) AS bimodality,
           CAST(({_DA_SK} * {_DA_SK} + 1.0)
                / (({_DA_B2} - 3.0)
                   + 3.0 * (CAST(n AS DOUBLE) - 1.0) * (n - 1.0)
                     / ((n - 2.0) * (n - 3.0))) > 0.5555555555555556
                AS BOOLEAN) AS bimodal_flag
    FROM sums ORDER BY grp
    """,
)
def q_stats_bimodality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sarle's bimodality coefficient per event type:
    b = (g1²+1)/(g2 + 3(n−1)²/((n−2)(n−3))), flagged above the uniform
    threshold 5/9 — the one-number screen for 'is this segment really
    TWO populations?' that moments alone (q_stats_jarque_bera) and EDF
    normality tests both report around rather than answer; pairs with
    q_events_kde, which shows WHERE the modes sit.

    Pure derivation from the same exact Σx..x⁴ power-sum pass as
    jarque_bera/dagostino (operand-cast-first DECIMAL(38)/HUGEINT
    carriers); the coefficient and its flag are fixed-order IEEE on the
    k-row relation with the 5/9 threshold as an embedded literal."""
    xqd = F.col("xq").cast("decimal(38,0)")
    pool = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
    )
    sums = pool.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("s1"),
        F.sum(xqd * F.col("xq")).alias("s2"),
        F.sum(xqd * F.col("xq") * F.col("xq")).alias("s3"),
        F.sum(xqd * F.col("xq") * F.col("xq") * F.col("xq")).alias("s4"),
    )
    m1 = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n") - m1 * m1
    sk = (
        F.col("s3").cast("double") / F.col("n")
        - 3.0 * m1 * (F.col("s2").cast("double") / F.col("n"))
        + 2.0 * m1 * m1 * m1
    ) / (m2 * F.sqrt(m2))
    g2 = (
        F.col("s4").cast("double") / F.col("n")
        - 4.0 * m1 * (F.col("s3").cast("double") / F.col("n"))
        + 6.0 * m1 * m1 * (F.col("s2").cast("double") / F.col("n"))
        - 3.0 * m1 * m1 * m1 * m1
    ) / (m2 * m2) - 3.0
    nd = F.col("n").cast("double")
    b = (sk * sk + 1.0) / (
        g2 + 3.0 * (nd - 1.0) * (F.col("n") - 1.0)
        / ((F.col("n") - 2.0) * (F.col("n") - 3.0))
    )
    return sums.select(
        "grp",
        "n",
        F.round(sk, 6).alias("skewness"),
        F.round(g2, 6).alias("kurtosis_excess"),
        F.round(b, 6).alias("bimodality"),
        (b > 0.5555555555555556).alias("bimodal_flag"),
    ).orderBy("grp")
