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


@query(
    "q_join_spatial_grid",
    oracle="""
    WITH cgeo AS (
      SELECT c_custkey AS ck,
             CAST((c_custkey * 37) % 1000 AS DOUBLE) / 10.0 AS lat,
             CAST((c_custkey * 91) % 1000 AS DOUBLE) / 10.0 AS lon
      FROM customer
    ),
    sgeo AS (
      SELECT s_suppkey AS sk,
             CAST((s_suppkey * 53) % 1000 AS DOUBLE) / 10.0 AS lat,
             CAST((s_suppkey * 17) % 1000 AS DOUBLE) / 10.0 AS lon
      FROM supplier
    )
    SELECT c.ck, s.sk,
           round((c.lat - s.lat) * (c.lat - s.lat)
                 + (c.lon - s.lon) * (c.lon - s.lon), 6) AS dist2
    FROM cgeo c JOIN sgeo s
      ON (c.lat - s.lat) * (c.lat - s.lat)
         + (c.lon - s.lon) * (c.lon - s.lon) < 4.0
    ORDER BY ck, sk
    """,
)
def q_join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance join via grid bucketing: customers matched to suppliers
    within planar distance 2.0 (synthetic coordinates derived from keys).
    The oracle states the O(n·m) theta join; the Spark plan NEVER runs
    it — each point maps to a ⌊coord/r⌋ grid cell, each probe side
    expands to its 3×3 neighbor cells, and the join is an EQUI-join on
    the cell key followed by the exact distance check.  False candidates
    are bounded by cell geometry, so work is O(n · density) — the
    standard scalable form for spatial / embedding-radius joins where a
    cross join would be quadratic.  Cell size = radius keeps the
    neighbor expansion at 9 cells; all arithmetic is exact on
    integer-derived doubles."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        (((F.col("c_custkey") * 37) % 1000).cast("double") / F.lit(10.0)).alias(
            "clat"
        ),
        (((F.col("c_custkey") * 91) % 1000).cast("double") / F.lit(10.0)).alias(
            "clon"
        ),
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"),
        (((F.col("s_suppkey") * 53) % 1000).cast("double") / F.lit(10.0)).alias(
            "slat"
        ),
        (((F.col("s_suppkey") * 17) % 1000).cast("double") / F.lit(10.0)).alias(
            "slon"
        ),
    )
    r = 2.0
    # build side: exact cell per supplier
    s_cells = s.select(
        "sk",
        "slat",
        "slon",
        F.floor(F.col("slat") / F.lit(r)).cast("long").alias("cx"),
        F.floor(F.col("slon") / F.lit(r)).cast("long").alias("cy"),
    )
    # probe side: customer expands to its 3x3 neighborhood
    offsets = F.expr(
        "explode(array("
        + ", ".join(
            f"struct({dx} AS dx, {dy} AS dy)"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        + "))"
    )
    c_cells = c.select("ck", "clat", "clon", offsets.alias("o")).select(
        "ck",
        "clat",
        "clon",
        (F.floor(F.col("clat") / F.lit(r)).cast("long") + F.col("o.dx")).alias(
            "cx"
        ),
        (F.floor(F.col("clon") / F.lit(r)).cast("long") + F.col("o.dy")).alias(
            "cy"
        ),
    )
    d2 = (F.col("clat") - F.col("slat")) * (F.col("clat") - F.col("slat")) + (
        F.col("clon") - F.col("slon")
    ) * (F.col("clon") - F.col("slon"))
    return (
        c_cells.join(s_cells, ["cx", "cy"])
        .filter(d2 < F.lit(4.0))
        .select("ck", "sk", F.round(d2, 6).alias("dist2"))
        .orderBy("ck", "sk")
    )


_ER_LEV_MAX = 2  # accept pairs within this edit distance


@query(
    "q_er_blocked_linkage",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
             substr(c_name, 1, greatest(length(c_name) - 3, 1)) AS name_pfx
      FROM customer
    ),
    pairs AS (
      SELECT a.c_nationkey, a.c_mktsegment,
             levenshtein(a.c_name, b.c_name) AS lev
      FROM c a JOIN c b
        ON b.c_nationkey = a.c_nationkey
       AND b.c_mktsegment = a.c_mktsegment
       AND b.name_pfx = a.name_pfx
       AND a.c_custkey < b.c_custkey
    )
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS n_pairs_checked,
           CAST(SUM(CASE WHEN lev <= {_ER_LEV_MAX} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matches
    FROM pairs
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def q_er_blocked_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution with blocking: candidate customer pairs within
    a (nation, segment, name-prefix) block, scored by name edit
    distance — the record-linkage shape every MDM/dedup-people pipeline
    runs.  The blocking key is the whole design: an unblocked n² name
    comparison is infeasible at any scale, and a business key alone
    ((nation, segment) is a fixed ~125-value domain) lets block
    population grow linearly with the corpus — O(Σ block²) goes
    quadratic at 100×.  Composing in a NAME-DERIVED component — the
    name minus its last 3 characters, standard prefix blocking — caps
    every block at the suffix domain (≤10³ names can share a prefix)
    INDEPENDENT of corpus size, so total pair count stays linear in the
    corpus.  The recall tradeoff (pairs differing outside the suffix
    are never compared) is the documented, deliberate blocking
    contract; the oracle applies the identical blocking.

    One shuffle on the composite block key; levenshtein (identical DP
    algorithm both engines, exact integer) runs only inside blocks;
    `a < b` halves the pairs.  Output is the per-block audit (pairs
    checked, pairs matched at distance ≤ {_ER_LEV_MAX}) — the
    blocking-quality report read before accepting a linkage run.
    """
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "substring(c_name, 1, greatest(length(c_name) - 3, 1))"
        ).alias("name_pfx"),
    )
    a = c.select(
        F.col("c_custkey").alias("ka"),
        F.col("c_name").alias("na"),
        "c_nationkey",
        "c_mktsegment",
        "name_pfx",
    )
    b = c.select(
        F.col("c_custkey").alias("kb"),
        F.col("c_name").alias("nb"),
        F.col("c_nationkey").alias("nk2"),
        F.col("c_mktsegment").alias("ms2"),
        F.col("name_pfx").alias("pfx2"),
    )
    pairs = a.join(
        b,
        (F.col("nk2") == F.col("c_nationkey"))
        & (F.col("ms2") == F.col("c_mktsegment"))
        & (F.col("pfx2") == F.col("name_pfx"))
        & (F.col("ka") < F.col("kb")),
    ).select(
        "c_nationkey",
        "c_mktsegment",
        F.levenshtein("na", "nb").alias("lev"),
    )
    return (
        pairs.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_pairs_checked"),
            F.sum(F.when(F.col("lev") <= _ER_LEV_MAX, 1).otherwise(0))
            .cast("long")
            .alias("n_matches"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Band join: |a - b| <= delta via neighbor-bucket equi-join
# ---------------------------------------------------------------------------

BAND_CENTS = 25  # band half-width in price cents


@query(
    "q_join_band",
    oracle=f"""
    WITH p AS (
      SELECT p_partkey, p_brand,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
      FROM part
    )
    SELECT a.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(abs(a.cents - b.cents)) AS DOUBLE) / 100.0
                 / COUNT(*), 6) AS avg_gap
    FROM p a JOIN p b
      ON b.p_partkey != a.p_partkey
     AND abs(a.cents - b.cents) <= {BAND_CENTS}
    GROUP BY a.p_brand
    ORDER BY a.p_brand
    """,
)
def q_join_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join — pair every part with every other part whose retail
    price lies within ±{BAND_CENTS} cents — executed as a neighbor-
    bucket EQUI-join: prices bucket at the band width, the probe side
    fans out to its own bucket ±1 (3 rows), and the exact |Δ| ≤ δ
    predicate filters the equi-matched candidates.  This is the
    standard rewrite that turns an inequality ("theta") join Spark
    would otherwise plan as a broadcast nested loop into a hash join
    whose cost scales with MATCHES, not with |A|×|B| — the same family
    as q_join_range/q_join_pointrange but for symmetric distance bands
    (price matching, sensor-reading reconciliation, tolerance dedup).

    Every qualifying pair matches in exactly one probe bucket (the
    build row's own), so no dedup pass is needed.  Prices ride the
    cents carrier (exact longs: bucketing, |Δ|, and the gap sum are all
    integer ops); the only double math is the final avg division,
    rounded at 6.  The oracle states the raw theta join — DuckDB's
    IEJoin handles it at test scale — proving the bucket rewrite
    changes the plan, not the relation.
    """
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    build = p.select(
        F.col("p_partkey").alias("b_key"),
        F.col("cents").alias("b_cents"),
        F.expr(f"cents div {BAND_CENTS}").alias("bucket"),
    )
    probe = p.select(
        "p_partkey",
        "p_brand",
        "cents",
        F.explode(
            F.array(
                F.expr(f"cents div {BAND_CENTS} - 1"),
                F.expr(f"cents div {BAND_CENTS}"),
                F.expr(f"cents div {BAND_CENTS} + 1"),
            )
        ).alias("bucket"),
    )
    pairs = probe.join(build, "bucket").filter(
        (F.col("b_key") != F.col("p_partkey"))
        & (F.abs(F.col("cents") - F.col("b_cents")) <= BAND_CENTS)
    )
    gap = F.abs(F.col("cents") - F.col("b_cents"))
    return (
        pairs.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(
                F.sum(gap).cast("double") / 100.0 / F.count(F.lit(1)), 6
            ).alias("avg_gap"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# NATURAL JOIN: implicit equi-join on every shared column name
# ---------------------------------------------------------------------------


@query(
    "q_join_natural",
    oracle="""
    WITH n AS (
      SELECT n_nationkey AS nationkey, n_name AS nation_name,
             n_regionkey AS regionkey
      FROM nation
    ),
    r AS (
      SELECT r_regionkey AS regionkey, r_name AS region_name FROM region
    )
    SELECT nationkey, nation_name, regionkey, region_name
    FROM n NATURAL JOIN r
    ORDER BY nationkey
    """,
)
def q_join_natural(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL JOIN — the implicit equi-join on every same-named column
    (HiveQL/ANSI dialect surface; reference delegates the dialect to
    Hive, backend/hive_manager.py:118-170).  Run through spark.sql so
    the parser's own NATURAL resolution is what executes, against
    projections that share exactly one column name; the shared key
    appears ONCE in the output, per the spec.  Dialect sugar over
    q_join_inner — the plan is the identical broadcast hash join; the
    operational caveat (schema evolution silently widening the join
    key set) is why the docstring, not the engine, discourages it.

    Both engines parse NATURAL natively, so the oracle exercises the
    same resolution rule rather than restating an explicit ON.
    """
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_nat")
    t(spark, sf_dir, "region").createOrReplaceTempView("region_nat")
    return spark.sql(
        """
        WITH n AS (
          SELECT n_nationkey AS nationkey, n_name AS nation_name,
                 n_regionkey AS regionkey
          FROM nation_nat
        ),
        r AS (
          SELECT r_regionkey AS regionkey, r_name AS region_name
          FROM region_nat
        )
        SELECT nationkey, nation_name, regionkey, region_name
        FROM n NATURAL JOIN r
        ORDER BY nationkey
        """
    )
