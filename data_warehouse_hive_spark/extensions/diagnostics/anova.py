"""Diagnostics: sequential drift, scale tests, KDE, EVT, ANOVA post-hoc
and causal readouts (Page-Hinkley, Ansari-Bradley, KDE, extreme value,
Tukey HSD, Dunn, Cochran-Armitage, interrupted TS, Cohen kappa,
Brown-Forsythe, Welch ANOVA, bimodality).

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

from data_warehouse_hive_spark.extensions.diagnostics.normality import (  # noqa: F401
    _DA_B2,
    _DA_SK,
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
             CAST(SUM((2000000 * CAST(c1 AS HUGEINT) * sc + c)
                      // (2 * c)) AS HUGEINT) AS ab6,
             CAST(SUM((2000000 * CAST(sc AS HUGEINT) * sc + c)
                      // (2 * c)) AS HUGEINT) AS sq6
      FROM sv
    ),
    fin AS (
      SELECT n1, n - n1 AS n2,
             CAST(ab6 AS DOUBLE) / 1e6 AS ab,
             CAST(n1 AS DOUBLE) * s_all / n AS e_ab,
             CAST(n1 AS DOUBLE) * (n - n1)
               * (n * (CAST(sq6 AS DOUBLE) / 1e6)
                  - CAST(s_all AS DOUBLE) * s_all)
               / (CAST(n AS DOUBLE) * n * (n - 1)) AS v
      FROM agg
    )
    SELECT n1, n2, ab, e_ab,
           CASE WHEN v > 0
                THEN floor((ab - e_ab) / sqrt(v) * 1e6 + 0.5) / 1e6
                ELSE NULL END AS z
    FROM fin
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
    Var = n1·n2·(N·Σs² − S²)/(N²(N−1)).

    sf10 finding (r11): the per-term 1e6 pins originally rode
    floor(double) — Spark's floor() lands on BIGINT and OVERFLOWS at
    the ~1.6e20 per-term magnitude sf10 reaches (sf1's 1.6e18 sat just
    under the 9.2e18 line), corrupting sq6 into a negative variance →
    z = NaN while DuckDB (double-typed floor) stayed finite.  Both
    terms are now EXACT integer round-half-up of the rational:
    (2·10⁶·x + c) // (2c) — DuckDB computes it directly on HUGEINT;
    Spark decomposes via quotient/remainder (q = x div c, r = x mod c,
    term = 10⁶·q-part + small-remainder part) because Spark's decimal
    `div` wraps to BIGINT.  Bounds: r < c ≈ n/|cents domain| (~4e3 at
    sf100), so every BIGINT intermediate is ≤ 2e6·c² ≈ 3e13; the
    decimal(38) assembly holds past sf1000.  ab/e_ab are emitted as
    their raw single divisions (house rule — re-rounding a
    carrier-exact division is the documented divergence class at
    ~1e12 display magnitudes), and z is floor-pinned with an explicit
    v > 0 guard (degenerate all-tied pools emit NULL in BOTH engines
    instead of NaN-vs-inf)."""
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
    # exact integer round-half-up of the 1e6-pinned rationals — see
    # docstring (sf10 finding): NEVER floor(double) here, Spark's floor
    # is BIGINT-typed and overflows at the sf10 per-term magnitude.
    # quotient/remainder split keeps every BIGINT intermediate small;
    # the 1e6·q part rides decimal(38,0).
    dec = "decimal(38,0)"

    def pin6_ratio(num):  # floor(num·1e6/c + 0.5) exactly, num BIGINT
        q = F.expr(f"({num}) div c")
        small = F.expr(f"(2000000 * (({num}) % c) + c) div (2 * c)")
        return q.cast(dec) * F.lit(1000000) + small

    ab_term = pin6_ratio("c1 * sc")
    # sc² overflows BIGINT past ~sf30: split sc = c·qs + rs first, then
    # sc²·1e6/c = 1e6·(c·qs² + 2·qs·rs) + rs²·1e6/c with rs < c
    qs = F.expr("sc div c")
    rs = F.expr("sc % c")
    sq_big = (
        F.col("c").cast(dec) * qs * qs + F.lit(2).cast(dec) * qs * rs
    ) * F.lit(1000000)
    sq_small = F.expr("(2000000 * (sc % c) * (sc % c) + c) div (2 * c)")
    agg = sv.agg(
        F.max("n").alias("n"),
        F.max("n1").alias("n1"),
        F.sum("sc").cast("long").alias("s_all"),
        F.sum(ab_term).alias("ab6"),
        F.sum(sq_big + sq_small).alias("sq6"),
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
        ab.alias("ab"),
        e_ab.alias("e_ab"),
        F.when(
            var > 0,
            F.floor((ab - e_ab) / F.sqrt(var) * 1e6 + 0.5) / 1e6,
        ).alias("z"),
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

