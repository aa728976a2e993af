"""Diagnostics: multiple testing + rank/count tests (FDR-BH, Kruskal,
Friedman, Jarque-Bera, runs, Brier, Grubbs, Kendall tau, Hurst,
Ljung-Box, Durbin-Watson, McNemar, Cochran Q, Page trend, odds ratio,
boxplot).

Split out of extensions/diagnostics.py (round 9, r8 VERDICT task 5)
with ZERO id changes: every operator keeps its registry id, oracle and
plan byte-for-byte; only the file boundary moved.  See the package
__init__ for the family map.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from data_warehouse_hive_spark.registry import query
from data_warehouse_hive_spark.tables import spread, t


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




# ---------------------------------------------------------------------------
# Mann-Kendall trend test (round 9): the nonparametric monotone-trend
# screen on each type's daily series — where q_stats_kendall_tau asks
# whether two SERIES move together, this asks whether ONE series moves
# with TIME, with the tie-corrected variance the tau harness lacks.
# ---------------------------------------------------------------------------


@query(
    "q_stats_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS x
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
      GROUP BY 1
    ),
    ties AS (
      SELECT event_type,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
        FROM daily GROUP BY event_type, x
      ) GROUP BY 1
    ),
    nd AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM daily GROUP BY 1
    )
    SELECT s.event_type, nd.n AS n_days, s.s_stat,
           round((nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tie_term)
                 / 18.0, 6) AS var_s,
           round(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                      WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                      ELSE 0 END
                 / sqrt((nd.n * (nd.n - 1) * (2 * nd.n + 5)
                         - ties.tie_term) / 18.0), 6) AS z
    FROM s JOIN ties USING (event_type) JOIN nd USING (event_type)
    ORDER BY event_type
    """,
)
def q_stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test per event type on the daily
    revenue series: S = Σ_(t<u) sign(x_u − x_t), tie-corrected variance
    Var(S) = (n(n−1)(2n+5) − Σt(t−1)(2t+5))/18, z with the ±1
    continuity correction — the distribution-free "is this KPI
    drifting?" gate (pairs with Theil-Sen, q_stats_theil_sen, which
    estimates the slope this test declares significant).

    The corpus collapses once to the (type, day) relation with EXACT
    integer daily cents; the O(days²) pair sign sum — the textbook cost
    objection — runs on that domain-bounded relation only (S ≤ n² =
    900; tie and variance terms ≤ n³ — trivial BIGINT).  One
    fixed-order double expression per type at the end."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("x")
        )
        .localCheckpoint(eager=False)
    )
    a = daily.alias("a")
    b = daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.x") > F.col("a.x"), 1)
                .when(F.col("b.x") < F.col("a.x"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    var_s = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ) / 18.0
    zn = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
    )
    return (
        s.join(ties, "event_type")
        .join(nd, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            "s_stat",
            F.round(var_s, 6).alias("var_s"),
            F.round(zn / F.sqrt(var_s), 6).alias("z"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Classifier-evaluation family (round 9): AUC, ROC curve, calibration —
# scoring "value predicts purchase" as the deterministic fixture stand-in
# for a model score column, exactly as q_stats_brier frames it.
# ---------------------------------------------------------------------------

ROC_POS = "purchase"
ROC_THRESHOLDS = tuple(range(50, 451, 50))  # fixed value grid, 9 points
CAL_SCALE = 50000  # cents per unit predicted probability (value/500)
CAL_BINS = 10


@query(
    "q_stats_auc",
    oracle=f"""
    WITH e AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             CASE WHEN event_type = '{ROC_POS}' THEN 1 ELSE 0 END AS pos
      FROM events
    ),
    vc AS (
      SELECT cents, CAST(SUM(pos) AS BIGINT) AS np,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM e GROUP BY cents
    ),
    ranked AS (
      SELECT np, cnt,
             SUM(cnt) OVER (ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM vc
    ),
    agg AS (
      SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
             CAST(SUM(cnt) - SUM(np) AS BIGINT) AS n_neg,
             CAST(SUM(np * (2 * (cum - cnt) + cnt + 1)) AS BIGINT) AS r2
      FROM ranked
    )
    SELECT n_pos, n_neg,
           round((CAST(r2 AS DOUBLE) - CAST(n_pos AS DOUBLE) * (n_pos + 1))
                 / (2.0 * CAST(n_pos AS DOUBLE) * n_neg), 6) AS auc,
           round((CAST(r2 AS DOUBLE) - CAST(n_pos AS DOUBLE) * (n_pos + 1))
                 / (CAST(n_pos AS DOUBLE) * n_neg) - 1.0, 6) AS gini
    FROM agg
    """,
)
def q_stats_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of "value predicts {ROC_POS}" via the rank (Mann-
    Whitney) identity AUC = (R_pos − n_pos(n_pos+1)/2)/(n_pos·n_neg)
    with midrank tie handling — the threshold-free ranking-quality
    number (plus Gini = 2·AUC − 1, the credit-scoring form), computed
    WITHOUT a global row sort: the q_stats_mannwhitney histogram-
    midrank trick (per-distinct-cents counts, running count over the
    domain-bounded distinct relation).  Doubled midranks keep every
    rank-sum term an exact BIGINT (R2 = Σ np·(2·midrank) ≤ 2n² ≈ 2e14
    at sf10), so AUC is two exact integer operands in one division."""
    e = t(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        F.when(F.col("event_type") == ROC_POS, 1).otherwise(0).alias("pos"),
    )
    vc = e.groupBy("cents").agg(
        F.sum("pos").cast("long").alias("np"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ranked = vc.withColumn("cum", F.sum("cnt").over(w))
    agg = ranked.agg(
        F.sum("np").cast("long").alias("n_pos"),
        (F.sum("cnt") - F.sum("np")).cast("long").alias("n_neg"),
        F.sum(
            F.col("np")
            * (2 * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1)
        )
        .cast("long")
        .alias("r2"),
    )
    num = F.col("r2").cast("double") - F.col("n_pos").cast("double") * (
        F.col("n_pos") + 1
    )
    den = F.col("n_pos").cast("double") * F.col("n_neg")
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(num / (2.0 * den), 6).alias("auc"),
        F.round(num / den - 1.0, 6).alias("gini"),
    )


@query(
    "q_stats_roc_curve",
    oracle=f"""
    WITH e AS (
      SELECT LEAST({CAL_BINS - 1},
                   CAST(floor(value / 50.0) AS BIGINT)) AS bin,
             CASE WHEN event_type = '{ROC_POS}' THEN 1 ELSE 0 END AS pos
      FROM events
    ),
    cells AS (
      SELECT bin, CAST(SUM(pos) AS BIGINT) AS np,
             CAST(COUNT(*) - SUM(pos) AS BIGINT) AS nn
      FROM e GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(np) AS BIGINT) AS tp_all,
             CAST(SUM(nn) AS BIGINT) AS tn_all
      FROM cells
    ),
    thr AS (SELECT unnest({list(ROC_THRESHOLDS)}) AS threshold),
    pts AS (
      SELECT t.threshold,
             CAST(COALESCE(SUM(CASE WHEN c.bin * 50 >= t.threshold
                                    THEN c.np END), 0) AS BIGINT) AS tp,
             CAST(COALESCE(SUM(CASE WHEN c.bin * 50 >= t.threshold
                                    THEN c.nn END), 0) AS BIGINT) AS fp
      FROM thr t CROSS JOIN cells c
      GROUP BY t.threshold
    )
    SELECT CAST(threshold AS BIGINT) AS threshold, tp, fp,
           round(CAST(tp AS DOUBLE) / x.tp_all, 6) AS tpr,
           round(CAST(fp AS DOUBLE) / x.tn_all, 6) AS fpr,
           round(CAST(tp AS DOUBLE) / GREATEST(tp + fp, 1), 6)
             AS precision_at
    FROM pts CROSS JOIN tot x ORDER BY threshold
    """,
)
def q_stats_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC operating points of "value ≥ τ predicts {ROC_POS}" on the
    FIXED threshold grid {ROC_THRESHOLDS} — the per-threshold
    TP/FP/TPR/FPR/precision table an alerting or review-queue owner
    actually tunes against, complementing q_stats_auc's single
    threshold-free number.

    One corpus pass bins scores onto the domain-bounded 50-wide grid
    (≤{CAL_BINS}×2 cells); the threshold sweep is a {len(ROC_THRESHOLDS)}×{CAL_BINS}
    crossJoin of two TINY relations — the corpus is never re-scanned
    per threshold (the anti-pattern this operator exists to replace).
    All counts exact integers; the three rates are single divisions."""
    e = t(spark, sf_dir, "events").select(
        F.least(
            F.lit(CAL_BINS - 1), F.floor(F.col("value") / 50.0).cast("long")
        ).alias("bin"),
        F.when(F.col("event_type") == ROC_POS, 1).otherwise(0).alias("pos"),
    )
    cells = e.groupBy("bin").agg(
        F.sum("pos").cast("long").alias("np"),
        (F.count(F.lit(1)) - F.sum("pos")).cast("long").alias("nn"),
    )
    tot = cells.agg(
        F.sum("np").cast("long").alias("tp_all"),
        F.sum("nn").cast("long").alias("tn_all"),
    )
    thr = spark.createDataFrame(
        [(x,) for x in ROC_THRESHOLDS], "threshold long"
    )
    hit = F.col("bin") * 50 >= F.col("threshold")
    pts = (
        broadcast(thr)
        .crossJoin(cells)
        .groupBy("threshold")
        .agg(
            F.coalesce(F.sum(F.when(hit, F.col("np"))), F.lit(0))
            .cast("long")
            .alias("tp"),
            F.coalesce(F.sum(F.when(hit, F.col("nn"))), F.lit(0))
            .cast("long")
            .alias("fp"),
        )
    )
    return (
        pts.crossJoin(broadcast(tot))
        .select(
            "threshold",
            "tp",
            "fp",
            F.round(F.col("tp").cast("double") / F.col("tp_all"), 6).alias(
                "tpr"
            ),
            F.round(F.col("fp").cast("double") / F.col("tn_all"), 6).alias(
                "fpr"
            ),
            F.round(
                F.col("tp").cast("double")
                / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)),
                6,
            ).alias("precision_at"),
        )
        .orderBy("threshold")
    )


@query(
    "q_stats_reliability_bins",
    oracle=f"""
    WITH e AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             LEAST({CAL_BINS - 1},
                   CAST(floor(value / 50.0) AS BIGINT)) AS bin,
             CASE WHEN event_type = '{ROC_POS}' THEN 1 ELSE 0 END AS pos
      FROM events
    ),
    bins AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(cents) AS BIGINT) AS sc
      FROM e GROUP BY bin
    ),
    ece AS (
      SELECT CAST(SUM(abs({CAL_SCALE} * n_pos - sc)) AS BIGINT) AS enum,
             CAST(SUM(n) AS BIGINT) AS nt
      FROM bins
    )
    SELECT bin, n,
           round(CAST(sc AS DOUBLE) / n / {CAL_SCALE}, 6) AS avg_pred,
           round(CAST(n_pos AS DOUBLE) / n, 6) AS obs_rate,
           round(CAST(n_pos AS DOUBLE) / n
                 - CAST(sc AS DOUBLE) / n / {CAL_SCALE}, 6) AS gap,
           round(CAST(x.enum AS DOUBLE) / ({CAL_SCALE}.0 * x.nt), 6) AS ece
    FROM bins CROSS JOIN ece x ORDER BY bin
    """,
)
def q_stats_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration reliability table: predicted probability = value/500
    (the deterministic fixture stand-in for a model score, same framing
    as q_stats_brier), {CAL_BINS} fixed probability bins, per-bin mean
    prediction vs observed {ROC_POS} rate, plus ECE (expected
    calibration error) — the diagram behind every "is the model
    calibrated?" review.

    ECE is EXACT RATIONAL arithmetic end-to-end: per-bin
    n·|obs − pred| = |{CAL_SCALE}·n_pos − Σcents| is an absolute
    difference of exact integers, so ECE = Σ|…| / ({CAL_SCALE}·N) needs
    no carrier and no float sum — both engines divide the same two
    BIGINTs.  One corpus pass to {CAL_BINS} cells; the ECE total rides
    a 1-row broadcast crossJoin (house carrier pattern)."""
    e = t(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        F.least(
            F.lit(CAL_BINS - 1), F.floor(F.col("value") / 50.0).cast("long")
        ).alias("bin"),
        F.when(F.col("event_type") == ROC_POS, 1).otherwise(0).alias("pos"),
    )
    bins = e.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("cents").cast("long").alias("sc"),
    )
    ece = bins.agg(
        F.sum(F.abs(CAL_SCALE * F.col("n_pos") - F.col("sc")))
        .cast("long")
        .alias("enum"),
        F.sum("n").cast("long").alias("nt"),
    )
    pred = F.col("sc").cast("double") / F.col("n") / CAL_SCALE
    obs = F.col("n_pos").cast("double") / F.col("n")
    return (
        bins.crossJoin(broadcast(ece))
        .select(
            "bin",
            "n",
            F.round(pred, 6).alias("avg_pred"),
            F.round(obs, 6).alias("obs_rate"),
            F.round(obs - pred, 6).alias("gap"),
            F.round(
                F.col("enum").cast("double") / (float(CAL_SCALE) * F.col("nt")),
                6,
            ).alias("ece"),
        )
        .orderBy("bin")
    )


ESD_ROUNDS = 3  # outliers tested per group (NIST generalized ESD upper bound)


@query(
    "q_stats_esd",
    oracle="""
    WITH hist AS MATERIALIZED (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    s1 AS (
      SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(xq * cnt) AS BIGINT) AS sx,
             CAST(SUM(CAST(xq AS HUGEINT) * xq * cnt) AS HUGEINT) AS sxx
      FROM hist GROUP BY grp
    ),
    a1 AS (
      SELECT h.grp, s.n, s.sx, s.sxx,
             CAST(MAX(abs(h.xq * s.n - s.sx) * 100000 + h.xq) AS BIGINT)
               AS keyed,
             CAST(MIN(h.xq) AS BIGINT) AS mn,
             CAST(MAX(h.xq) AS BIGINT) AS mx
      FROM hist h JOIN s1 s USING (grp)
      GROUP BY h.grp, s.n, s.sx, s.sxx
    ),
    r1 AS (
      SELECT grp, n, sx, sxx,
             keyed % 100000 AS v, keyed // 100000 AS dev
      FROM a1
      WHERE CASE WHEN mn < 0 OR mx >= 100000
                 THEN error('q_stats_esd: cents value outside [0, 1e5) pack domain')
                 ELSE TRUE END
    ),
    s2 AS (
      SELECT grp, v AS v1, n - 1 AS n, sx - v AS sx,
             sxx - CAST(v AS HUGEINT) * v AS sxx
      FROM r1
    ),
    a2 AS (
      SELECT h.grp, s.v1, s.n, s.sx, s.sxx,
             CAST(MAX(abs(h.xq * s.n - s.sx) * 100000 + h.xq) AS BIGINT)
               AS keyed
      FROM hist h JOIN s2 s USING (grp)
      WHERE h.cnt - CASE WHEN h.xq = s.v1 THEN 1 ELSE 0 END > 0
      GROUP BY h.grp, s.v1, s.n, s.sx, s.sxx
    ),
    r2 AS (
      SELECT grp, v1, n, sx, sxx,
             keyed % 100000 AS v, keyed // 100000 AS dev
      FROM a2
    ),
    s3 AS (
      SELECT grp, v1, v AS v2, n - 1 AS n, sx - v AS sx,
             sxx - CAST(v AS HUGEINT) * v AS sxx
      FROM r2
    ),
    a3 AS (
      SELECT h.grp, s.n, s.sx, s.sxx,
             CAST(MAX(abs(h.xq * s.n - s.sx) * 100000 + h.xq) AS BIGINT)
               AS keyed
      FROM hist h JOIN s3 s USING (grp)
      WHERE h.cnt - CASE WHEN h.xq = s.v1 THEN 1 ELSE 0 END
                  - CASE WHEN h.xq = s.v2 THEN 1 ELSE 0 END > 0
      GROUP BY h.grp, s.n, s.sx, s.sxx
    ),
    r3 AS (
      SELECT grp, n, sx, sxx,
             keyed % 100000 AS v, keyed // 100000 AS dev
      FROM a3
    ),
    rounds AS (
      SELECT grp, 1 AS round, n, v, dev, sx, sxx FROM r1
      UNION ALL SELECT grp, 2, n, v, dev, sx, sxx FROM r2
      UNION ALL SELECT grp, 3, n, v, dev, sx, sxx FROM r3
    )
    SELECT grp, CAST(round AS BIGINT) AS round,
           CAST(n AS BIGINT) AS n_remaining,
           round(v / 100.0, 2) AS outlier_value,
           round((CAST(dev AS DOUBLE) / n)
                 / sqrt((CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * sx / n) / (n - 1.0)), 6)
             AS esd_r
    FROM rounds ORDER BY grp, round
    """,
)
def q_stats_esd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD (extreme studentized deviate, NIST) per event
    type: {ESD_ROUNDS} iterated Grubbs rounds — each round reports
    R_r = max|x − x̄|/s over the REMAINING data, then removes one
    occurrence of the achieving value and recomputes the moments — the
    multiple-outlier screen Grubbs alone cannot do (masking: a second
    outlier inflates s and hides the first).

    Fully relational unrolled iteration, NO driver loop: removal is a
    CLOSED-FORM moment update (n−1, sx−v, sxx−v²) carried through
    {ESD_ROUNDS} chained aggregates over the (grp, cents, cnt)
    HISTOGRAM — the corpus is scanned once; every later round joins
    histogram-sized relations (distinct cents ≤ 1e5 by the grubbs pack
    domain), with multiplicity-aware eligibility (a value removed once
    stays eligible while its count exceeds its removals).  Same packed
    integer argmax as q_stats_grubbs (dev·1e5 + cents — deterministic
    largest-value tiebreak); sxx adjustments ride HUGEINT/DECIMAL(38).
    R_r values are reported without the λ_r critical thresholds (those
    need t-quantiles; compare downstream)."""
    hist = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("grp"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("xq"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    # Pack-domain guard (same contract as q_stats_grubbs): the packed
    # argmax dev*100000 + xq decodes correctly only for xq in [0, 1e5) —
    # raise rather than silently corrupt if the data ever leaves it.
    # Removal rounds only ever re-use values from hist, so guarding the
    # initial moments guards every round.
    s = (
        hist.groupBy("grp")
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum(F.col("xq") * F.col("cnt")).cast("long").alias("sx"),
            F.sum(
                F.col("xq").cast("decimal(38,0)")
                * F.col("xq")
                * F.col("cnt")
            ).alias("sxx"),
            F.min("xq").cast("long").alias("mn"),
            F.max("xq").cast("long").alias("mx"),
        )
        .filter(
            F.when(
                (F.col("mn") < 0) | (F.col("mx") >= 100000),
                F.raise_error(
                    F.lit(
                        "q_stats_esd: cents value outside [0, 1e5)"
                        " pack domain"
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
        .select("grp", "n", "sx", "sxx")
    )
    removed: list = []  # column exprs of previously removed values
    rounds = []
    for r in range(1, ESD_ROUNDS + 1):
        joined = hist.join(broadcast(s), "grp")
        elig = F.col("cnt")
        for vcol in removed:
            elig = elig - F.when(F.col("xq") == F.col(vcol), 1).otherwise(0)
        keyed = (
            joined.filter(elig > 0)
            .groupBy(
                "grp",
                "n",
                "sx",
                "sxx",
                *removed,
            )
            .agg(
                F.max(
                    F.abs(F.col("xq") * F.col("n") - F.col("sx")) * 100000
                    + F.col("xq")
                )
                .cast("long")
                .alias("keyed")
            )
            .withColumn(f"v{r}", F.col("keyed") % 100000)
            .withColumn("dev", F.expr("keyed div 100000"))
        )
        rounds.append(
            keyed.select(
                "grp",
                F.lit(r).cast("long").alias("round"),
                F.col("n").cast("long").alias("n_remaining"),
                F.round(F.col(f"v{r}") / 100.0, 2).alias("outlier_value"),
                F.round(
                    (F.col("dev").cast("double") / F.col("n"))
                    / F.sqrt(
                        (
                            F.col("sxx").cast("double")
                            - F.col("sx").cast("double")
                            * F.col("sx")
                            / F.col("n")
                        )
                        / (F.col("n") - 1.0)
                    ),
                    6,
                ).alias("esd_r"),
            )
        )
        # closed-form removal for the next round
        s = keyed.select(
            "grp",
            *removed,
            F.col(f"v{r}"),
            (F.col("n") - 1).cast("long").alias("n"),
            (F.col("sx") - F.col(f"v{r}")).cast("long").alias("sx"),
            (
                F.col("sxx")
                - F.col(f"v{r}").cast("decimal(38,0)") * F.col(f"v{r}")
            ).alias("sxx"),
        )
        removed.append(f"v{r}")
    out = rounds[0]
    for rdf in rounds[1:]:
        out = out.unionByName(rdf)
    return out.orderBy("grp", "round")
