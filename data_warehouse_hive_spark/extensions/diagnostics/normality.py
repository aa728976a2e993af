"""Diagnostics: equivalence/variance/EDF-normality families and the
shared transcendental closures (TOST, Bartlett, Mood median,
Anderson-Darling, PHI/EDF helpers, CvM, Lilliefors, D'Agostino,
Acklam probit, Fligner, van der Waerden).

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


