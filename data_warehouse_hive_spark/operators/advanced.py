"""Advanced relational shapes — CTEs, subqueries, pivot/unpivot, as-of and
range joins, skew-aware (salted) joins, latest-record-per-key.

These extend SURVEY.md §2 beyond the reference's delegated HiveQL core
with the composite query shapes real warehouse users run daily, plus the
custom operators Spark has no single built-in for (as-of join, range
join) implemented as compositions of DataFrame ops — the (a)-tier
strategy from the build brief (never Python UDFs).

Scale notes per operator in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from data_warehouse_hive_spark.registry import DEC, dsum, o_dsum, query, to_carrier
from data_warehouse_hive_spark.tables import t


@query(
    "q_cte",
    oracle=f"""
    WITH seg_totals AS (
      SELECT c.c_mktsegment AS seg,
             {o_dsum('o.o_totalprice', 'seg_total')},
             COUNT(*) AS n_orders
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    ),
    grand AS (
      SELECT CAST(SUM(CAST(seg_total AS DECIMAL(18,6))) AS DOUBLE) AS total FROM seg_totals
    )
    SELECT s.seg, s.seg_total, s.n_orders,
           s.seg_total / g.total AS share
    FROM seg_totals s CROSS JOIN grand g
    """,
)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH-clause pipeline: per-segment totals + share of grand total.
    The grand total is a 1-row broadcast — no re-scan of the base data
    (Spark reuses the aggregated frame in both branches)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    seg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(dsum("o_totalprice", "seg_total"), F.count(F.lit(1)).alias("n_orders"))
    )
    grand = seg.agg(
        F.sum(F.col("seg_total").cast(DEC)).cast("double").alias("total")
    )
    return seg.crossJoin(broadcast(grand)).select(
        "seg", "seg_total", "n_orders", (F.col("seg_total") / F.col("total")).alias("share")
    )


@query(
    "q_subquery_scalar",
    oracle=f"""
    WITH cust_avg AS (
      SELECT o_custkey, {o_dsum('o_totalprice', 'cust_sum')},
             COUNT(*) AS cust_n
      FROM orders GROUP BY o_custkey
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o JOIN cust_avg a ON o.o_custkey = a.o_custkey
    WHERE o.o_totalprice > a.cust_sum / a.cust_n
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders above their customer's average),
    decorrelated into aggregate + self-join — exactly the rewrite Catalyst
    applies to correlated subqueries; written explicitly so the exact-
    decimal average survives the oracle check."""
    o = t(spark, sf_dir, "orders")
    avg_ = o.groupBy("o_custkey").agg(
        dsum("o_totalprice", "cust_sum"),
        F.count(F.lit(1)).alias("cust_n"),
    ).withColumnRenamed("o_custkey", "k")
    return (
        o.join(avg_, o.o_custkey == avg_.k)
        .filter(F.col("o_totalprice") > F.col("cust_sum") / F.col("cust_n"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    )
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join (the decorrelation Catalyst performs;
    the rich-customer set is small → broadcast semi join, no shuffle of
    orders)."""
    o = t(spark, sf_dir, "orders")
    rich = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        "c_custkey"
    )
    return o.join(broadcast(rich), o.o_custkey == rich.c_custkey, "left_semi").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIV_COLS = {p: "p" + p[0] for p in _PRIORITIES}  # 1-URGENT → p1 ...


@query(
    "q_pivot",
    oracle=f"""
    SELECT o_orderstatus,
           {", ".join(
             f"COUNT(*) FILTER (WHERE o_orderpriority = '{p}') AS {a}"
             for p, a in _PIV_COLS.items()
           )}
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by status × priority (explicit value list — the
    scalable form; an unlisted pivot needs a distinct-values pass first).
    Columns renamed to stable identifiers so both engines agree."""
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    out = piv
    for p, a in _PIV_COLS.items():
        out = out.withColumnRenamed(p, a)
    # pivot yields NULL for empty cells; count semantics want 0
    return out.select(
        "o_orderstatus",
        *[F.coalesce(F.col(a), F.lit(0)).alias(a) for a in _PIV_COLS.values()],
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, metric, val FROM (
      SELECT p_partkey,
             CAST(p_size AS DOUBLE) AS size_val,
             p_retailprice AS price_val
      FROM part
    ) UNPIVOT (val FOR metric IN (size_val, price_val))
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: wide metric columns → (key, metric, value) rows
    (Spark's unpivot generator — one pass, no shuffle)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size_val"),
        F.col("p_retailprice").alias("price_val"),
    ).unpivot("p_partkey", ["size_val", "price_val"], "metric", "val")


@query(
    "q_join_asof",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts AS p_ts, event_id AS p_event_id, value AS p_value
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts AS c_ts,
             CAST(MAX(event_id) AS BIGINT) AS c_event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.user_id, p.p_event_id, p.p_ts, p.p_value,
           c.c_event_id AS last_click_id, c.c_ts AS last_click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.c_ts <= p.p_ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent click
    at-or-before it — an operator Spark lacks natively (DuckDB has ASOF
    JOIN; the oracle uses it, so OUR composition is checked against a
    native implementation).

    Implementation: union the two sides tagged, one window pass per user
    ordered by (ts, side, event_id) carrying the last click forward
    (last_value ignoring nulls).  One shuffle on user_id total —
    unlike the naive join+filter+rank (which shuffles the full pair
    blow-up), this scales linearly and is the standard streaming-friendly
    as-of shape.  Tie rules: a click at exactly p_ts counts (<=), so
    clicks sort before purchases at equal ts; and clicks sharing an
    exact ts collapse to the max event_id before the bind, making the
    match deterministic under ts collisions.
    """
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.col("event_id").alias("eid"),
        F.col("value").alias("p_value"),
        F.lit(0).alias("side"),  # purchases after clicks at equal ts
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        # collapse exact-ts ties to the max event_id BEFORE the as-of
        # bind: equal-ts clicks (replays / at-least-once ingest — and
        # the sf1 clone fixture) otherwise make ANY as-of join
        # nondeterministic; native engines pick an arbitrary tie row
        # (found by the sf1 sweep against DuckDB's ASOF JOIN)
        .groupBy("user_id", F.col("ts").alias("ets"))
        .agg(F.max("event_id").cast("long").alias("eid"))
        .select(
            "user_id",
            "ets",
            "eid",
            F.lit(None).cast("double").alias("p_value"),
            F.lit(-1).alias("side"),
        )
    )
    unioned = purchases.unionByName(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ets", "side", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("side") == -1, F.col("eid"))
    click_ts = F.when(F.col("side") == -1, F.col("ets"))
    return (
        unioned.withColumn("last_click_id", F.last(click_id, ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("side") == 0)
        .select(
            "user_id",
            F.col("eid").alias("p_event_id"),
            F.col("ets").alias("p_ts"),
            "p_value",
            "last_click_id",
            "last_click_ts",
        )
    )


@query(
    "q_join_range",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, s.session_id
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') e
    JOIN (
      SELECT user_id,
             CAST(user_id * 100 AS BIGINT) AS session_id,
             min(ts) AS s_start,
             min(ts) + INTERVAL 12 HOUR AS s_end
      FROM events GROUP BY user_id
    ) s
      ON e.user_id = s.user_id AND e.ts >= s.s_start AND e.ts < s.s_end
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join: events against per-user time
    intervals.  With an equi-key (user_id) present, Spark executes this as
    a hash join with the range predicate as a post-join filter — the
    scalable form.  (A pure interval join with no equi-key needs interval
    binning: join on overlapping time buckets, then filter — same
    composition, bucket id as the manufactured equi-key.)"""
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    s = (
        t(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("s_user"))
        .agg(F.min("ts").alias("s_start"))
        .select(
            "s_user",
            (F.col("s_user") * 100).cast("long").alias("session_id"),
            "s_start",
            (F.col("s_start") + F.expr("INTERVAL 12 HOURS")).alias("s_end"),
        )
    )
    return (
        e.join(
            s,
            (e.user_id == s.s_user) & (e.ts >= s.s_start) & (e.ts < s.s_end),
        )
        .select("event_id", "user_id", "ts", "session_id")
    )


@query(
    "q_latest_per_key",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key — THE workhorse of CDC/dedup pipelines.
    Window rank + rn=1 filter; Spark's WindowGroupLimit keeps one row per
    key per partition pre-shuffle, so the shuffle carries |keys| rows."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


@query(
    "q_join_salted",
    oracle=f"""
    SELECT o.o_orderpriority,
           {o_dsum('l.l_extendedprice', 'revenue')},
           COUNT(*) AS n
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-aware salted join: the build side replicates each row S ways
    (salt 0..S-1), the probe side salts randomly-but-deterministically by
    a hash of a disambiguating column, so one hot join key spreads over S
    reducers instead of melting one.

    Result is identical to the plain join (the oracle checks that); at
    100 TB this is the manual fallback when AQE's skew splitting can't
    help (e.g. skewed *build* side of a shuffled hash join).  S=8 here.
    """
    SALT = 8
    li = t(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_linenumber", "l_partkey"), F.lit(SALT)).cast("int")
    )
    o = t(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt))
        .groupBy("o_orderpriority")
        .agg(dsum("l_extendedprice", "revenue"), F.count(F.lit(1)).alias("n"))
    )

@query(
    "q_cte_recursive",
    oracle="""
    WITH RECURSIVE walk(nationkey, root_key, depth, path) AS (
      SELECT n_nationkey, n_nationkey, 0, n_name
      FROM nation WHERE n_nationkey < 5
      UNION ALL
      SELECT n.n_nationkey, w.root_key, w.depth + 1,
             concat(w.path, '>', n.n_name)
      FROM nation n JOIN walk w ON n.n_nationkey - 5 = w.nationkey
    )
    SELECT nationkey, root_key, depth, path FROM walk
    """,
)
def q_cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE hierarchy flattening (Spark 4 recursive CTE): walk a
    5-chain forest over nation (parent(n) = n - 5, roots 0..4), emitting
    each node's root, depth, and materialized name path — the category-tree
    / org-chart flattening every warehouse eventually needs, without an
    iterative driver loop.

    Scale: each recursion step is one self-join of the frontier against
    the (dimension-sized, broadcastable) edge table; total steps = tree
    DEPTH, not node count, and Spark's recursion-level guard
    (spark.sql.cteRecursionLevelLimit) bounds runaway graphs.  For
    million-node flat hierarchies the frontier join shuffles on the
    parent key exactly like q_dedup_groups' label propagation.
    """
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_rec")
    return spark.sql(
        """
        WITH RECURSIVE walk(nationkey, root_key, depth, path) AS (
          SELECT n_nationkey, n_nationkey, 0, n_name
          FROM nation_rec WHERE n_nationkey < 5
          UNION ALL
          SELECT n.n_nationkey, w.root_key, w.depth + 1,
                 concat(w.path, '>', n.n_name)
          FROM nation_rec n JOIN walk w ON n.n_nationkey - 5 = w.nationkey
        )
        SELECT nationkey, root_key, depth, path FROM walk
        """
    )


@query(
    "q_lateral_topk",
    oracle="""
    SELECT grp.n_name, topc.c_custkey, topc.c_acctbal
    FROM nation grp,
      LATERAL (
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE c.c_nationkey = grp.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2
      ) topc
    """,
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join (Spark 3.2+ SQL surface): per
    nation, the top-2 customers by account balance, expressed as the ANSI
    LATERAL form rather than the window idiom.

    Catalyst decorrelates the lateral subquery into a join + per-key
    limit; ties broken by (c_acctbal DESC, c_custkey) so both engines
    return the identical pair.  At 100 TB the window top-k
    (q_topk_per_group) is the plan to prefer — this id covers the SQL
    surface and the decorrelation path itself.
    """
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT grp.n_name, topc.c_custkey, topc.c_acctbal
        FROM nation_lat grp,
          LATERAL (
            SELECT c_custkey, c_acctbal FROM customer_lat c
            WHERE c.c_nationkey = grp.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2
          ) topc
        """
    )


@query(
    "q_join_nullsafe",
    oracle="""
    WITH cust AS (
      SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS nk,
             COUNT(*) AS n_cust
      FROM customer GROUP BY 1
    ),
    supp AS (
      SELECT CASE WHEN s_acctbal < 0 THEN NULL ELSE s_nationkey END AS nk,
             COUNT(*) AS n_supp
      FROM supplier GROUP BY 1
    )
    SELECT cust.nk AS nationkey, cust.n_cust, supp.n_supp
    FROM cust JOIN supp ON cust.nk IS NOT DISTINCT FROM supp.nk
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): negative-balance
    rows get a NULL key on both sides, and the null-safe comparator makes
    the NULL groups join each other instead of vanishing (ANSI `=` drops
    them).

    Spark plans eqNullSafe as a regular hash join with NULL as an
    ordinary key value — which means every null-keyed row lands in ONE
    reducer.  Fine here (one aggregated row per side); on raw fact tables
    a large NULL population is a skew bomb — pre-aggregate or salt the
    NULL class first, exactly like any hot key.
    """
    c = (
        t(spark, sf_dir, "customer")
        .groupBy(
            F.when(F.col("c_acctbal") < 0, F.lit(None))
            .otherwise(F.col("c_nationkey"))
            .alias("nk")
        )
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(
            F.when(F.col("s_acctbal") < 0, F.lit(None))
            .otherwise(F.col("s_nationkey"))
            .alias("nk")
        )
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c["nk"].eqNullSafe(s["nk"])).select(
        c["nk"].alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "q_pipe_syntax",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {o_dsum('o_totalprice', 'total')}
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators): the filter→aggregate
    flow written as a left-to-right pipeline instead of inside-out
    SELECT nesting — same Catalyst plan, different grammar.  Covered as
    surface parity (the GoogleSQL-style syntax users increasingly write);
    the oracle is the equivalent classic SQL.
    """
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe")
    return spark.sql(
        """
        FROM orders_pipe
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))
                          AS DOUBLE) / 1e6 AS total
           GROUP BY o_orderpriority
        """
    )


# Irregular value brackets (tax-bracket / IP-geo lookup shape); the last
# bound is an open-ended catch-all clamped to the domain cap for bucketing.
_BRACKETS = [
    (0.0, 25_000.0, "micro"),
    (25_000.0, 80_000.0, "small"),
    (80_000.0, 180_000.0, "mid"),
    (180_000.0, 320_000.0, "large"),
    (320_000.0, 1_000_000.0, "jumbo"),
]
_PR_BUCKET_W = 20_000.0  # coarse-bucket width for the equi-join


def _o_brackets_values() -> str:
    return ", ".join(f"({lo!r}, {hi!r}, '{lab}')" for lo, hi, lab in _BRACKETS)


@query(
    "q_join_pointrange",
    oracle=f"""
    WITH brackets(lo, hi, label) AS (VALUES {_o_brackets_values()})
    SELECT b.label,
           COUNT(*) AS n_orders,
           {o_dsum('o.o_totalprice', 'revenue')}
    FROM orders o JOIN brackets b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.label
    """,
)
def q_join_pointrange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-range lookup join — the tax-bracket / IP-to-geo shape:
    each fact value finds the ONE irregular interval containing it.  The
    naive form is a theta join (nested-loop against every bracket); the
    scalable idiom used here coarse-buckets both sides — each bracket
    EXPLODES into the fixed-width buckets it spans, the fact computes its
    single bucket, and the lookup becomes an equi-join on the bucket id
    plus a residual bounds check.

    At 100 TB: the fact side never replicates (one bucket per row); the
    dim side's explosion is bounded by domain/width per bracket and
    broadcasts.  The oracle is the direct theta join — identical result,
    the plan is what changed.  Same composition as q_join_range, but for
    point-probe (≤1 match) rather than interval-overlap semantics.
    """
    brackets = spark.createDataFrame(
        _BRACKETS, "lo double, hi double, label string"
    )
    W = _PR_BUCKET_W
    dim = brackets.select(
        "lo",
        "hi",
        "label",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / W).cast("long"),
                F.floor((F.col("hi") - 0.01) / W).cast("long"),
            )
        ).alias("bucket"),
    )
    o = t(spark, sf_dir, "orders").withColumn(
        "bucket", F.floor(F.col("o_totalprice") / W).cast("long")
    )
    return (
        o.join(broadcast(dim), "bucket")
        .filter(
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi"))
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "revenue"),
        )
    )


@query(
    "q_scd2",
    oracle="""
    WITH changes AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
      FROM orders
    )
    SELECT o_custkey AS custkey,
           o_orderstatus AS status,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey),
             '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00') AS valid_to,
           (LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) IS NULL)
             AS is_current
    FROM changes
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build: turn a change log (each
    order = a status observation for its customer) into validity
    intervals — [valid_from, valid_to) per state with an open-ended
    current row — the dimension-history table every warehouse keeps for
    as-of reporting (and the build side of q_join_asof).

    One window per key: LEAD over (event_time, unique_id) closes each
    interval with the next change's start; the sentinel high date keeps
    the current row range-queryable without NULL handling.  One shuffle
    on the dimension key, linear per key — history depth per key is
    what bounds the window buffer, not table size.  Timestamps project
    as strings (cross-engine DATE bridges differ).
    """
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    fmt = "yyyy-MM-dd HH:mm:ss"
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.date_format("o_orderdate", fmt).alias("valid_from"),
        F.coalesce(F.date_format(nxt, fmt), F.lit("9999-12-31 00:00:00")).alias(
            "valid_to"
        ),
        nxt.isNull().alias("is_current"),
    )


@query(
    "q_snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT l_orderkey, l_linenumber,
             md5(concat_ws('|', l_quantity, l_extendedprice, l_returnflag))
               AS row_hash
      FROM lineitem
    ),
    b AS (
      SELECT l_orderkey, l_linenumber,
             md5(concat_ws('|',
                 CASE WHEN (l_orderkey + l_linenumber) % 13 = 0
                      THEN l_quantity + 1.0 ELSE l_quantity END,
                 l_extendedprice, l_returnflag)) AS row_hash
      FROM lineitem
      WHERE (l_orderkey + l_linenumber) % 97 <> 0
    ),
    joined AS (
      SELECT a.row_hash AS ha, b.row_hash AS hb
      FROM a FULL OUTER JOIN b
        ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
    )
    SELECT CAST(SUM(CASE WHEN hb IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS removed,
           CAST(SUM(CASE WHEN ha IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS added,
           CAST(SUM(CASE WHEN ha IS NOT NULL AND hb IS NOT NULL
                          AND ha <> hb THEN 1 ELSE 0 END) AS BIGINT)
             AS changed,
           CAST(SUM(CASE WHEN ha = hb THEN 1 ELSE 0 END) AS BIGINT)
             AS unchanged
    FROM joined
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: classify every row across two table
    versions as added / removed / changed / unchanged — the audit that
    validates a migration, a backfill, or a replica.  Snapshot B is
    derived deterministically here (drop every 97th key, perturb every
    13th) so the expected counts are oracle-checkable.

    The idiom, not the fixture, is the point: reduce each row to a
    canonical md5 over its value columns, FULL OUTER join on the primary
    key, and compare hashes — one shuffle per side on the key, row-width
    costs collapse to one hash column, and the verdict is a single
    conditional aggregation.  At 100 TB both sides also partition-prune
    to the slice under audit.
    """
    li = t(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") + F.col("l_linenumber"))

    def hashed(df, qty):
        return df.select(
            "l_orderkey",
            "l_linenumber",
            F.md5(
                F.concat_ws("|", qty, F.col("l_extendedprice"), F.col("l_returnflag"))
            ).alias("row_hash"),
        )

    a = hashed(li, F.col("l_quantity"))
    b = hashed(
        li.filter(key % 97 != 0),
        F.when(key % 13 == 0, F.col("l_quantity") + 1.0).otherwise(
            F.col("l_quantity")
        ),
    )
    joined = a.alias("a").join(
        b.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") == F.col("b.l_linenumber")),
        "full_outer",
    ).select(F.col("a.row_hash").alias("ha"), F.col("b.row_hash").alias("hb"))
    return joined.agg(
        F.sum(F.when(F.col("hb").isNull(), 1).otherwise(0)).alias("removed"),
        F.sum(F.when(F.col("ha").isNull(), 1).otherwise(0)).alias("added"),
        F.sum(
            F.when(
                F.col("ha").isNotNull()
                & F.col("hb").isNotNull()
                & (F.col("ha") != F.col("hb")),
                1,
            ).otherwise(0)
        ).alias("changed"),
        F.sum(F.when(F.col("ha") == F.col("hb"), 1).otherwise(0)).alias("unchanged"),
    )


_BASKET_TOP = 20
_MAX_BASKET = 64  # skew guard: drop degenerate mega-baskets pre-expansion


@query(
    "q_basket_pairs",
    oracle=f"""
    WITH items_raw AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    items AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz
        FROM items_raw
      ) WHERE bsz <= {_MAX_BASKET}
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY part_a, part_b
    )
    SELECT part_a, part_b, support,
           CAST(ROW_NUMBER() OVER (ORDER BY support DESC, part_a, part_b)
                AS BIGINT) AS rk
    FROM pairs
    ORDER BY support DESC, part_a, part_b
    LIMIT {_BASKET_TOP}
    """,
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: co-purchased part pairs with support
    counts (the candidate-generation step of association-rule mining).

    The pair expansion (r15, guide §2.4 remove shuffles outright) is a
    NARROW i<j generator over each basket's sorted distinct item array:
    ONE exchange on the order key (collect_set fuses the old DISTINCT
    and partial-aggregates map-side; the old shape spent three
    exchanges — distinct, count-window, self-join — plus an SMJ sort to
    reach the same pairs), the _MAX_BASKET cap is a size() filter on
    the array (a degenerate mega-basket can never quadratically amplify
    the expansion), pairs collapse into support counts via one hash
    agg, then TakeOrderedAndProject for the top-k with full-key
    determinism.  Safe at any corpus size because baskets are small
    (≤13 lines in the fixture; bounded in any real order system) — the
    same bounded-in-group-expansion argument as the LSH bucket joins,
    with part_a < part_b (by slicing the sorted array) halving the
    pairs and making each unordered pair unique.
    """
    items = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") <= _MAX_BASKET)
        .select("ps")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size("ps")),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    pairs = (
        items.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.pa").alias("part_a"), F.col("p.pb").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("support").desc(), F.col("part_a"), F.col("part_b"))
    return (
        pairs.orderBy(F.col("support").desc(), F.col("part_a"), F.col("part_b"))
        .limit(_BASKET_TOP)
        .withColumn("rk", F.row_number().over(w).cast("long"))
    )


@query(
    "q_time_calendar",
    oracle="""
    SELECT strftime(d, '%Y-%m-%d') AS date_key,
           CAST(year(d) AS INT) AS yr,
           CAST(quarter(d) AS INT) AS qtr,
           CAST(month(d) AS INT) AS mo,
           CAST(day(d) AS INT) AS dom,
           CAST(isodow(d) AS INT) AS iso_dow,
           CAST(weekofyear(d) AS INT) AS iso_week,
           CAST(dayofyear(d) AS INT) AS doy,
           (d = last_day(d)) AS is_month_end,
           CAST(day(last_day(d)) AS INT) AS days_in_month
    FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31',
                                        INTERVAL 1 DAY))::DATE AS d)
    ORDER BY date_key
    """,
)
def q_time_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension generation: one year of dates with the standard
    warehouse attributes (ISO weekday/week, quarter, month-end flags) —
    the date dimension every star schema joins against, built from a
    sequence expression with no source table at all.

    Date semantics are the cross-engine trap here: day-of-week numbering
    differs (Spark dayofweek is Sunday=1, DuckDB dow is Sunday=0), so the
    ISO forms are used on both sides (Spark weekday()+1 = DuckDB isodow).
    The date itself is projected as yyyy-MM-dd per the house rule.
    """
    d = F.col("d")
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1995-01-01").cast("date"),
                    F.lit("1995-12-31").cast("date"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("d")
        )
        .select(
            F.date_format(d, "yyyy-MM-dd").alias("date_key"),
            F.year(d).alias("yr"),
            F.quarter(d).alias("qtr"),
            F.month(d).alias("mo"),
            F.dayofmonth(d).alias("dom"),
            (F.weekday(d) + 1).alias("iso_dow"),
            F.weekofyear(d).alias("iso_week"),
            F.dayofyear(d).alias("doy"),
            (d == F.last_day(d)).alias("is_month_end"),
            F.dayofmonth(F.last_day(d)).alias("days_in_month"),
        )
        .orderBy("date_key")
    )


@query(
    "q_sql_star_except",
    oracle="""
    SELECT * EXCLUDE (n_regionkey) FROM nation ORDER BY n_nationkey
    """,
)
def q_sql_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * EXCEPT(cols) — the wide-table projection idiom (drop two
    bookkeeping columns from a 500-column table without naming 498).
    Spark 4 spells it EXCEPT, DuckDB spells it EXCLUDE; same semantics.
    Column pruning still reaches the scan: the planner resolves the
    except-list at analysis time, so ReadSchema shrinks identically to
    an explicit projection."""
    n = t(spark, sf_dir, "nation")
    n.createOrReplaceTempView("nation_star_except")
    return spark.sql(
        "SELECT * EXCEPT (n_regionkey) FROM nation_star_except ORDER BY n_nationkey"
    )


@query(
    "q_abc_analysis",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1e6 + 0.5)
                  AS BIGINT)) AS BIGINT) AS rev_c
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, rev_c,
             CAST(SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c,
             CAST(SUM(rev_c) OVER () AS BIGINT) AS tot_c
      FROM rev
    ),
    classed AS (
      SELECT l_partkey,
             CASE WHEN CAST(cum_c AS DOUBLE) / CAST(tot_c AS DOUBLE) <= 0.8 THEN 'A'
                  WHEN CAST(cum_c AS DOUBLE) / CAST(tot_c AS DOUBLE) <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev_c
      FROM ranked
    )
    SELECT abc_class,
           COUNT(*) AS n_parts,
           CAST(SUM(rev_c) AS DOUBLE) / 1e6 AS class_revenue
    FROM classed
    GROUP BY abc_class
    ORDER BY abc_class
    """,
)
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification: parts contributing the first 80%% of
    cumulative revenue are class A, the next 15%% B, the tail C — the
    inventory-prioritization report every warehouse ships.

    The fact table reduces to one carrier-long per part FIRST; the
    cumulative share then runs over the part-level relation (window over
    aggregated rows, not raw fact), and the class boundaries compare
    identical integer-derived doubles in both engines.  The ordered
    cumulative window sorts the part domain in one partition — at 100 TB
    pre-split by revenue range the way q_stats_ks's scale note describes.
    """
    from data_warehouse_hive_spark.registry import to_carrier

    l = t(spark, sf_dir, "lineitem")
    rev = l.groupBy("l_partkey").agg(
        F.sum(to_carrier(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "rev_c"
        )
    )
    wcum = Window.orderBy(F.col("rev_c").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    share = F.col("cum_c").cast("double") / F.col("tot_c").cast("double")
    classed = rev.select(
        "l_partkey",
        "rev_c",
        F.sum("rev_c").over(wcum).alias("cum_c"),
        F.sum("rev_c").over(wall).alias("tot_c"),
    ).select(
        "l_partkey",
        "rev_c",
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (F.sum("rev_c").cast("double") / 1e6).alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


@query(
    "q_values_inline",
    oracle="""
    WITH targets(r_name, quota) AS (
      VALUES ('AFRICA', 2.0e8), ('AMERICA', 3.5e8), ('ASIA', 3.0e8),
             ('EUROPE', 4.0e8), ('MIDDLE EAST', 1.5e8)
    ),
    rev AS (
      SELECT r.r_name,
             CAST(SUM(CAST(floor(o.o_totalprice * 1e6 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name
    )
    SELECT t.r_name, t.quota,
           CAST(rev_c AS DOUBLE) / 1e6 AS revenue,
           round((CAST(rev_c AS DOUBLE) / 1e6) / t.quota, 6) AS quota_attainment
    FROM targets t JOIN rev USING (r_name)
    ORDER BY t.r_name
    """,
)
def q_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES relation joined against computed aggregates — the
    quota/target-table idiom (business constants live in the query, not
    a file).  The literal relation is planned as LocalRelation: zero
    scan, broadcast into the join; revenue rides the carrier.
    """
    from data_warehouse_hive_spark.registry import to_carrier
    from pyspark.sql.functions import broadcast

    targets = spark.sql(
        "SELECT * FROM VALUES"
        " ('AFRICA', 2.0e8), ('AMERICA', 3.5e8), ('ASIA', 3.0e8),"
        " ('EUROPE', 4.0e8), ('MIDDLE EAST', 1.5e8) AS t(r_name, quota)"
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    rev = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_name")
        .agg(F.sum(to_carrier(F.col("o_totalprice"))).alias("rev_c"))
    )
    revenue = F.col("rev_c").cast("double") / 1e6
    return (
        targets.join(rev, "r_name")
        .select(
            "r_name",
            "quota",
            revenue.alias("revenue"),
            F.round(revenue / F.col("quota"), 6).alias("quota_attainment"),
        )
        .orderBy("r_name")
    )


_PIV2 = {p: "p" + p[0] for p in _PRIORITIES}


@query(
    "q_pivot_multiagg",
    oracle=f"""
    SELECT o_orderstatus,
           {", ".join(
             f"COUNT(*) FILTER (WHERE o_orderpriority = '{p}') AS {a}_cnt, "
             f"coalesce(CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))"
             f" FILTER (WHERE o_orderpriority = '{p}') AS DOUBLE) / 1e6, 0.0)"
             f" AS {a}_rev"
             for p, a in _PIV2.items()
           )}
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_pivot_multiagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with multiple aggregates per cell (count + revenue sum):
    Spark emits `{value}_{alias}` columns from one hash aggregate over
    the Expand plan — one pass, one shuffle, however many measures.  The
    carrier sum keeps every cell cross-engine exact; empty cells coalesce
    to 0 on both sides."""
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(to_carrier(F.col("o_totalprice"))).alias("revc"),
        )
    )
    cols = [F.col("o_orderstatus")]
    for p, a in _PIV2.items():
        cols.append(F.coalesce(F.col(f"{p}_cnt"), F.lit(0)).alias(f"{a}_cnt"))
        cols.append(
            F.coalesce(
                F.col(f"{p}_revc").cast("double") / F.lit(1e6), F.lit(0.0)
            ).alias(f"{a}_rev")
        )
    return piv.select(*cols)


@query(
    "q_unpivot_multi",
    oracle="""
    SELECT p_partkey, 'catalog' AS grp,
           CAST(p_size AS DOUBLE) AS m1, p_retailprice AS m2
    FROM part
    UNION ALL
    SELECT p_partkey, 'text' AS grp,
           CAST(length(p_name) AS DOUBLE), CAST(length(p_type) AS DOUBLE)
    FROM part
    """,
)
def q_unpivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-measure UNPIVOT: column GROUPS melt together — each output
    row carries (m1, m2) for one named group, the ANSI
    `UNPIVOT ((m1, m2) FOR grp IN ((a, b) AS x, ...))` form.  Still a
    generator (row expansion in-place, no shuffle); the oracle states the
    same relation as the UNION ALL it desugars to."""
    p = t(spark, sf_dir, "part")
    p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size_v"),
        F.col("p_retailprice").alias("price_v"),
        F.length("p_name").cast("double").alias("namelen_v"),
        F.length("p_type").cast("double").alias("typelen_v"),
    ).createOrReplaceTempView("part_wide")
    return spark.sql(
        """
        SELECT p_partkey, grp, m1, m2 FROM part_wide
        UNPIVOT ((m1, m2) FOR grp IN ((size_v, price_v) AS catalog,
                                      (namelen_v, typelen_v) AS text))
        """
    )


@query(
    "q_subquery_exists",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderpriority = '1-URGENT'
        AND o.o_totalprice > 200000
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders o2
      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
    )
    ORDER BY c.c_custkey
    """,
)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS: customers with at least one large
    urgent order and no finished orders.  Catalyst decorrelates both
    predicates into a left-semi and a left-anti join on the correlation
    key — no per-row subquery execution ever happens, which is the whole
    reason this shape survives 100 TB (a nested-loop rewrite would be
    O(customers × orders)).  Written in SQL to exercise the decorrelator
    itself rather than hand-building the joins."""
    from data_warehouse_hive_spark.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, c.c_acctbal
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderpriority = '1-URGENT'
            AND o.o_totalprice > 200000
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o2
          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
        )
        ORDER BY c.c_custkey
        """
    )


@query(
    "q_sql_params",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 300000.0 AND o_orderpriority = '1-URGENT'
    ORDER BY o_orderkey
    """,
)
def q_sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (named-marker binding, Spark 3.4+): predicates
    arrive as typed args, not string-spliced literals — the
    injection-safe surface a service should expose instead of f-string
    HiveQL (the reference interpolates user input into SQL at
    backend/hive_manager.py:393-401; this is the fix).  IDENTIFIER()
    binds the TABLE name through a parameter too, closing the
    dynamic-table-name hole.  The oracle states the same query with the
    literals inlined — binding must be semantically invisible."""
    from data_warehouse_hive_spark.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :minprice AND o_orderpriority = :prio
        ORDER BY o_orderkey
        """,
        args={"tbl": "orders", "minprice": 300000.0, "prio": "1-URGENT"},
    )


@query(
    "q_sql_variables",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_rich,
           CAST(SUM(CAST(floor(c_acctbal * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1e6 AS rich_balance
    FROM customer
    WHERE c_acctbal > 7500.0
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4 DECLARE / SET VARIABLE): a typed,
    session-scoped threshold consumed by name inside the query — the
    scripting surface (multi-statement workflows parameterized without
    re-planning the client) HiveQL users emulate with hivevar
    substitution.  Variables resolve at analysis time, so the constant
    folds into the pushed filter exactly like a literal."""
    from data_warehouse_hive_spark.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE rich_threshold DOUBLE DEFAULT 0.0")
    spark.sql("SET VARIABLE rich_threshold = 7500.0")
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_rich,
               CAST(SUM(CAST(floor(c_acctbal * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1e6 AS rich_balance
        FROM customer
        WHERE c_acctbal > rich_threshold
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@query(
    "q_join_asof_tolerance",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts AS p_ts, event_id AS p_event_id
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts AS c_ts,
             CAST(MAX(event_id) AS BIGINT) AS c_event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    matched AS (
      SELECT p.user_id, p.p_event_id, p.p_ts,
             c.c_event_id, c.c_ts
      FROM purchases p
      ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND c.c_ts <= p.p_ts
    )
    SELECT user_id, p_event_id,
           strftime(p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
           CASE WHEN c_ts IS NOT NULL
                 AND epoch_us(p_ts) - epoch_us(c_ts) <= 1800000000
                THEN c_event_id END AS attrib_click_id,
           CASE WHEN c_ts IS NOT NULL
                 AND epoch_us(p_ts) - epoch_us(c_ts) <= 1800000000
                THEN CAST(epoch_us(p_ts) - epoch_us(c_ts) AS BIGINT)
           END AS gap_us
    FROM matched
    ORDER BY user_id, p_event_id
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH a match tolerance (pandas merge_asof's
    `tolerance=` / attribution's lookback window): each purchase takes
    the user's most recent click, but only if it happened within 30
    minutes — older clicks attribute nothing.  The tolerance is a
    post-predicate on the as-of match (NULL-out, keep the row), NOT a
    join-condition change: the nearest-match semantics must bind first,
    or a just-outside-window click would wrongly let an older
    in-window one match.

    Same single user_id-shuffle union-window plan as q_join_asof (the
    tagged-union forward-fill); the window check is one integer µs
    comparison per match."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.col("event_id").alias("eid"),
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        # same equal-ts collapse as q_join_asof (deterministic ties)
        .groupBy("user_id", F.col("ts").alias("ets"))
        .agg(F.max("event_id").cast("long").alias("eid"))
        .select("user_id", "ets", "eid")
    )
    tagged = purchases.withColumn("side", F.lit(1)).unionByName(
        clicks.withColumn("side", F.lit(0))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ets", "side", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "user_id",
        "ets",
        "eid",
        "side",
        F.last(
            F.when(F.col("side") == 0, F.col("eid")), ignorenulls=True
        ).over(w).alias("last_click_id"),
        F.last(
            F.when(F.col("side") == 0, F.col("ets")), ignorenulls=True
        ).over(w).alias("last_click_ts"),
    )
    gap = F.unix_micros("ets") - F.unix_micros("last_click_ts")
    in_win = F.col("last_click_ts").isNotNull() & (gap <= 1_800_000_000)
    return (
        carried.filter(F.col("side") == 1)
        .select(
            "user_id",
            F.col("eid").alias("p_event_id"),
            F.date_format("ets", "yyyy-MM-dd HH:mm:ss").alias("p_ts"),
            F.when(in_win, F.col("last_click_id")).alias("attrib_click_id"),
            F.when(in_win, gap).alias("gap_us"),
        )
        .orderBy("user_id", "p_event_id")
    )


@query(
    "q_sql_exec_immediate",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1e6 AS revenue
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_sql_exec_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE (Spark 4 dynamic SQL): the statement text lives
    in a session variable and parameters bind with USING — the scripted
    workflows (statement built from config, executed with bound args)
    that Hive shops run through beeline variable substitution, now with
    real typed binding instead of string splicing.  Same result as the
    static statement by construction — the oracle states the inlined
    form."""
    from data_warehouse_hive_spark.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    spark.sql(
        "DECLARE OR REPLACE VARIABLE dyn_stmt STRING DEFAULT "
        "'SELECT o_orderpriority, COUNT(*) AS n_orders, "
        "CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)"
        " / 1e6 AS revenue "
        "FROM orders WHERE o_orderstatus = :status "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority'"
    )
    return spark.sql("EXECUTE IMMEDIATE dyn_stmt USING 'F' AS status")


@query(
    "q_pivot_dynamic",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                    THEN 1 ELSE 0 END) AS BIGINT) AS p1,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                    THEN 1 ELSE 0 END) AS BIGINT) AS p2,
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
                    THEN 1 ELSE 0 END) AS BIGINT) AS p3,
           CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                    THEN 1 ELSE 0 END) AS BIGINT) AS p4,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                    THEN 1 ELSE 0 END) AS BIGINT) AS p5
    FROM orders GROUP BY yr ORDER BY yr
    """,
)
def q_pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic pivot — the value list is DISCOVERED at runtime (distinct
    scan, sorted, collected) instead of hardcoded, the pattern every BI
    layer uses when the pivot dimension's domain isn't known at query-
    authoring time.  q_pivot's companion with the discovery phase made
    explicit: phase 1 is a tiny distinct aggregation (collected —
    bounded by the dimension's domain, the only safe collect shape);
    phase 2 is the regular explicit-values pivot, which Spark plans as
    ONE aggregation pass (no per-value scan).

    The discovered values drive deterministic column names (p1..pN by
    sorted rank) so the output schema is stable for any domain; the
    oracle states the same relation with the domain inlined — exactly
    what the runtime discovery produces on this corpus, verified by the
    hash match.
    """
    o = t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"), "o_orderpriority"
    )
    # phase 1: runtime domain discovery (bounded: the priority domain)
    values = [
        r[0]
        for r in o.select("o_orderpriority").distinct().orderBy(
            "o_orderpriority"
        ).collect()
    ]
    piv = (
        o.groupBy("yr")
        .pivot("o_orderpriority", values)
        .agg(F.count(F.lit(1)))
    )
    out = piv.select(
        "yr",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long").alias(
                f"p{i + 1}"
            )
            for i, v in enumerate(values)
        ],
    )
    return out.orderBy("yr")


@query(
    "q_sql_grouping_id",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           COUNT(*) AS n_orders,
           {o_dsum('o_totalprice', 'revenue')}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY g_status, g_priority, status, priority
    """,
)
def q_sql_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicator columns over GROUPING SETS — the metadata
    that makes multi-level rollup rows machine-distinguishable: a NULL
    status could be a real null OR the all-statuses superaggregate, and
    grouping() is the only reliable discriminator (the HiveQL
    GROUPING__ID surface, per-column form).  Indicators are projected to
    explicit ints and the dimension values COALESCEd to 'ALL' so the
    output is self-describing.

    Single aggregation pass — Spark expands grouping sets into one
    Expand + hash aggregate, not one scan per set; revenue rides the
    exact carrier.
    """
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gid_v")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))
                    AS DOUBLE) / 1e6 AS revenue
        FROM orders_gid_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_priority, status, priority
        """
    )


@query(
    "q_scd2_lookup",
    oracle="""
    WITH scd AS (
      SELECT o_custkey AS custkey, o_orderstatus AS status,
             o_orderdate AS valid_from,
             COALESCE(LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                      TIMESTAMP '9999-12-31 00:00:00') AS valid_to
      FROM orders
    ),
    li AS (
      SELECT o.o_custkey AS custkey, l.l_shipdate AS ship
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT COALESCE(s.status, 'none') AS status_asof,
           COUNT(*) AS n_lineitems
    FROM li LEFT JOIN scd s
      ON s.custkey = li.custkey
     AND li.ship >= s.valid_from AND li.ship < s.valid_to
    GROUP BY status_asof
    ORDER BY status_asof
    """,
)
def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup against an SCD2 history — the
    consumption side of q_scd2 (which only BUILDS the intervals): every
    lineitem is joined to the status its customer held AT SHIP TIME via
    the half-open [valid_from, valid_to) interval, with shipments
    predating any history falling into the 'none' bucket (the LEFT join
    semantics an as-of report needs).

    Intervals are disjoint per key by construction (LEAD closes each),
    so the interval predicate on top of the custkey equi-join matches
    at most one history row per lineitem — the join stays an equi-join
    on the dimension key with a residual range filter, never an
    interval cross product.  Two shuffles: lineitem→orders on the order
    key, then the custkey join.
    """
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    scd = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(
            F.lead("o_orderdate").over(w),
            F.lit("9999-12-31 00:00:00").cast("timestamp"),
        ).alias("valid_to"),
    )
    lic = li.join(
        o.select("o_orderkey", "o_custkey"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    ).select(F.col("o_custkey").alias("lk"), F.col("l_shipdate").alias("ship"))
    joined = lic.join(
        scd,
        (F.col("custkey") == F.col("lk"))
        & (F.col("ship") >= F.col("valid_from"))
        & (F.col("ship") < F.col("valid_to")),
        "left",
    )
    return (
        joined.groupBy(
            F.coalesce(F.col("status"), F.lit("none")).alias("status_asof")
        )
        .agg(F.count(F.lit(1)).alias("n_lineitems"))
        .orderBy("status_asof")
    )


@query(
    "q_sql_window_clause",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
           CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))
                OVER wr AS DOUBLE) / 1e6 AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, seq
    """,
)
def q_sql_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause — the SQL surface that defines a window spec
    ONCE and reuses it across expressions (`OVER w`, `OVER (w ROWS
    …)`), the HiveQL/ANSI feature analysts rely on for any report with
    several aggregates over the same partitioning.  Both engines parse
    the same text; the plan is identical to inline specs (one shuffle,
    one sort), so this is parity of the authoring surface, proven by
    the hash match.

    Both specs live in ONE WINDOW clause (Spark's grammar does not
    allow frame-extending a named spec at the use site the way
    DuckDB/Postgres do, so the frame variant is its own named window —
    a parity nuance worth pinning); the running total rides the
    carrier.
    """
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_wc_v")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
               CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))
                    OVER wr AS DOUBLE) / 1e6 AS running_total
        FROM orders_wc_v
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, seq
        """
    )


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts AS p_ts, event_id AS p_event_id
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      -- one click per (user, instant): ties at the same timestamp keep
      -- max(event_id), so BOTH engines' asof tiebreak is moot (DuckDB
      -- ASOF picks an arbitrary same-ts row otherwise — r6 advice)
      SELECT user_id, ts AS c_ts, max(event_id) AS c_event_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    back AS (
      SELECT p.user_id, p.p_event_id, p.p_ts,
             c.c_event_id AS b_id, c.c_ts AS b_ts
      FROM purchases p
      ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND c.c_ts <= p.p_ts
    ),
    fwd AS (
      SELECT p.p_event_id, c.c_event_id AS f_id, c.c_ts AS f_ts
      FROM purchases p
      ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND c.c_ts >= p.p_ts
    )
    SELECT b.user_id, b.p_event_id, b.p_ts,
           CASE
             WHEN b.b_id IS NULL AND f.f_id IS NULL THEN NULL
             WHEN f.f_id IS NULL THEN b.b_id
             WHEN b.b_id IS NULL THEN f.f_id
             WHEN epoch_us(b.p_ts) - epoch_us(b.b_ts)
                  <= epoch_us(f.f_ts) - epoch_us(b.p_ts) THEN b.b_id
             ELSE f.f_id
           END AS nearest_click_id,
           CASE
             WHEN b.b_id IS NULL AND f.f_id IS NULL THEN NULL
             WHEN f.f_id IS NULL THEN 'back'
             WHEN b.b_id IS NULL THEN 'fwd'
             WHEN epoch_us(b.p_ts) - epoch_us(b.b_ts)
                  <= epoch_us(f.f_ts) - epoch_us(b.p_ts) THEN 'back'
             ELSE 'fwd'
           END AS direction
    FROM back b JOIN fwd f ON f.p_event_id = b.p_event_id
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-match as-of join (pandas merge_asof direction='nearest'):
    each purchase matched to the user's closest click in EITHER time
    direction, ties resolved backward — the attribution variant used
    when the touchpoint may be logged slightly after the conversion
    (clock skew between systems).

    Same linear shape as q_join_asof: ONE union + ONE window pass per
    user carries the last preceding click forward AND the first
    following click backward; the nearest pick is a scalar comparison
    of microsecond gaps.  The oracle cross-checks against DuckDB's
    native ASOF in both directions — our composition must agree with a
    real asof implementation, not just with itself.  A click at the
    exact purchase timestamp belongs to the backward side (diff 0
    always wins backward), which is why the forward window excluding
    equal-ts clicks is still exact."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.col("event_id").alias("eid"),
        F.lit(0).alias("side"),
    )
    # Dedupe clicks to one row per (user, instant) keeping max(event_id):
    # without this, same-timestamp clicks make the nearest pick engine-
    # dependent (Spark's forward carry takes MIN eid, backward takes MAX,
    # DuckDB ASOF takes an arbitrary one — r6 advice item).
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("ets"))
        .agg(F.max("event_id").alias("eid"))
        .select("user_id", "ets", "eid", F.lit(-1).alias("side"))
    )
    unioned = purchases.unionByName(clicks)
    order = [F.col("ets"), F.col("side"), F.col("eid")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_id = F.when(F.col("side") == -1, F.col("eid"))
    click_ts = F.when(F.col("side") == -1, F.col("ets"))
    lastb = unioned.select(
        "user_id",
        "ets",
        "eid",
        "side",
        F.last(click_id, ignorenulls=True).over(wb).alias("b_id"),
        F.last(click_ts, ignorenulls=True).over(wb).alias("b_ts"),
        F.first(click_id, ignorenulls=True).over(wf).alias("f_id"),
        F.first(click_ts, ignorenulls=True).over(wf).alias("f_ts"),
    ).filter(F.col("side") == 0)
    bdiff = F.unix_micros("ets") - F.unix_micros("b_ts")
    fdiff = F.unix_micros("f_ts") - F.unix_micros("ets")
    nearest_id = (
        F.when(F.col("b_id").isNull() & F.col("f_id").isNull(), F.lit(None))
        .when(F.col("f_id").isNull(), F.col("b_id"))
        .when(F.col("b_id").isNull(), F.col("f_id"))
        .when(bdiff <= fdiff, F.col("b_id"))
        .otherwise(F.col("f_id"))
    )
    direction = (
        F.when(
            F.col("b_id").isNull() & F.col("f_id").isNull(),
            F.lit(None).cast("string"),
        )
        .when(F.col("f_id").isNull(), F.lit("back"))
        .when(F.col("b_id").isNull(), F.lit("fwd"))
        .when(bdiff <= fdiff, F.lit("back"))
        .otherwise(F.lit("fwd"))
    )
    return lastb.select(
        "user_id",
        F.col("eid").alias("p_event_id"),
        F.col("ets").alias("p_ts"),
        nearest_id.alias("nearest_click_id"),
        direction.alias("direction"),
    )


# ---------------------------------------------------------------------------
# QUALIFY: filter on a window function without a subquery
# ---------------------------------------------------------------------------


@query(
    "q_sql_qualify",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT) AS rk
    FROM orders
    QUALIFY rk <= 3
    ORDER BY o_custkey, rk
    """,
)
def q_sql_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY semantics — filtering on a window function's result in
    the same query block (Hive 4 / DuckDB / BigQuery dialect sugar;
    reference delegates the dialect to Hive, backend/hive_manager.py) —
    expressed the way Spark's optimizer wants it: window then filter,
    which Spark 3.5+ rewrites into WindowGroupLimit so each partition
    stops after the top 3 rows instead of ranking everything.  The
    oracle exercises DuckDB's native QUALIFY clause against it.

    One shuffle on o_custkey; the group-limit pushdown keeps per-key
    state at 3 rows regardless of customer size, so the plan is
    skew-tolerant.  No arithmetic beyond the cents projection.
    """
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("price_cents"),
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .orderBy("o_custkey", "rk")
    )


# ---------------------------------------------------------------------------
# DISTINCT ON: first row per key in a declared order
# ---------------------------------------------------------------------------


@query(
    "q_sql_distinct_on",
    oracle="""
    SELECT DISTINCT ON (o_custkey)
           o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS latest_date,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
    FROM orders
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey
    """,
)
def q_sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON — Postgres/DuckDB's 'first row per key in this
    order' shorthand (the latest order per customer here), expressed in
    Spark as the row_number()=1 idiom the optimizer turns into a
    WindowGroupLimit (per-key state = 1 row).  Same result relation as
    a max_by over every projected column, but the declared-order form
    survives adding columns without re-stating aggregates.

    One o_custkey shuffle, group-limit pruned; tie on the same day
    breaks by o_orderkey in both engines.  Dates project as strings per
    the cross-engine bridge rule.
    """
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), "o_orderkey"
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_date"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("price_cents"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


# ---------------------------------------------------------------------------
# Hive TRANSFORM: stream rows through an external script
# ---------------------------------------------------------------------------


@query(
    "q_sql_script_transform",
    oracle="""
    SELECT upper(n_name) AS name_uc,
           CAST(n_nationkey AS VARCHAR) AS key_str
    FROM nation
    ORDER BY name_uc
    """,
)
def q_sql_script_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive's TRANSFORM ... USING 'script' — rows stream tab-separated
    through an external process's stdin/stdout (here `tr a-z A-Z`) and
    the output parses back into columns.  This is THE legacy HiveQL
    escape hatch the reference's delegated engine supports natively
    (Hive streaming scripts); Spark runs it in no-serde mode without a
    Hive metastore.  Kept for dialect parity and migration: a pipeline
    moving off Hive can run its existing scripts unchanged while it
    ports them — but this is a row-at-a-time fork/exec per task, so the
    engine's own guidance (SCALING.md, UDF section) is to rewrite hot
    paths as built-in expressions or Arrow-batched pandas_udf; the
    oracle states the pure-SQL equivalent this one reduces to.

    Scale shape: embarrassingly parallel (one process per task, rows
    stream through pipes — no shuffle introduced), but ~100× slower
    per row than codegen'd upper(); fine for the cold migration path
    it exists to serve.
    """
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_xform")
    return spark.sql(
        """
        SELECT name_uc, key_str FROM (
          SELECT TRANSFORM (n_name, n_nationkey)
            USING 'tr a-z A-Z'
            AS (name_uc STRING, key_str STRING)
          FROM nation_xform
        )
        ORDER BY name_uc
        """
    )


# ---------------------------------------------------------------------------
# GROUP BY / ORDER BY ordinals
# ---------------------------------------------------------------------------


@query(
    "q_sql_groupby_ordinal",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS rev_cents
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_sql_groupby_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY / ORDER BY ordinals — positional references into the
    select list (GROUP BY 1, 2), the HiveQL/ANSI convenience every
    hand-written rollup uses; resolution happens in the parser, so the
    executed plan is byte-identical to the named-column form (this id
    pins the dialect feature, not a new physical operator).  Both
    engines resolve the ordinals natively in spark.sql/DuckDB.

    One hash aggregate on the tiny (priority, status) domain; revenue
    sums as exact cents.
    """
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_ord")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders_ord
        GROUP BY 1, 2
        ORDER BY 1, 2
        """
    )


# ---------------------------------------------------------------------------
# Bitmap-index retention (round 9): the production bitmap trick for
# audience intersection at scale.
# ---------------------------------------------------------------------------

BMP_BITS = 63  # bits per bucket word: DuckDB overflow-checks 1<<63, so
               # 63 keeps every shift valid in BOTH engines


@query(
    "q_events_bitmap_retention",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id
      FROM events
    ),
    maps AS (
      SELECT day, user_id // {BMP_BITS} AS bkt,
             CAST(bit_or(1::BIGINT << CAST(user_id % {BMP_BITS} AS INTEGER))
                  AS BIGINT) AS bmp
      FROM du GROUP BY 1, 2
    ),
    active AS (
      SELECT day, CAST(SUM(bit_count(bmp)) AS BIGINT) AS n_active
      FROM maps GROUP BY day
    ),
    paired AS (
      SELECT a.day,
             CAST(SUM(bit_count(a.bmp & b.bmp)) AS BIGINT) AS n_retained
      FROM maps a
      JOIN maps b ON b.bkt = a.bkt
               AND b.day = strftime(CAST(a.day AS DATE)
                                    + INTERVAL 1 DAY, '%Y-%m-%d')
      GROUP BY a.day
    )
    SELECT x.day, x.n_active,
           CAST(COALESCE(p.n_retained, 0) AS BIGINT) AS n_retained_d1,
           round(CAST(COALESCE(p.n_retained, 0) AS DOUBLE) / x.n_active, 6)
             AS retention_d1
    FROM active x LEFT JOIN paired p USING (day)
    ORDER BY x.day
    """,
)
def q_events_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-1 retention via BITMAP indexes: each (day, 63-user bucket)
    collapses to ONE 63-bit word (bit_or of 1<<user%63); day-over-day
    retained users are then popcount(a & b) over word pairs — the
    roaring-bitmap/audience-index technique that replaces a
    user-level self-join with bitwise ops on a relation 63x smaller
    than the distinct-user-day table (q_events_wau computes reach by
    exploding pairs and q_events_retention builds the cohort-day curve
    by user-level joins; THIS is how those same intersections scale
    when the audience table itself is the bottleneck — and unlike
    q_agg_bitmap_distinct's per-group distinct COUNTS, the persisted
    words here support arbitrary pairwise set algebra).

    One pass to distinct (day, user) — the only fact-scale stage —
    then per-(day, bucket) bit_or partials (map-side combined, shuffle
    keyed on the uniform bucket), a date-shifted equi-join on (bucket,
    day+1), and popcount sums.  Everything is exact integer bit
    algebra; two's-complement words and bit_count agree bitwise across
    engines (63-bit words keep DuckDB's overflow-checked shift in
    range).  At 100 TB the word relation is |users|/63 × days rows —
    the audience index you'd persist and reuse for every pairwise
    cohort intersection."""
    du = (
        t(spark, sf_dir, "events")
        .select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id")
        .distinct()
    )
    maps = (
        du.groupBy(
            "day",
            F.expr(f"user_id div {BMP_BITS}").alias("bkt"),
        )
        .agg(
            F.expr(
                f"bit_or(shiftleft(1L, CAST(user_id % {BMP_BITS} AS INT)))"
            ).alias("bmp")
        )
        .localCheckpoint(eager=False)  # consumed by active + both join sides
    )
    active = maps.groupBy("day").agg(
        F.sum(F.bit_count("bmp")).cast("long").alias("n_active")
    )
    nxt = maps.select(
        F.col("bkt").alias("nbkt"),
        F.col("day").alias("nday"),
        F.col("bmp").alias("nbmp"),
    )
    paired = (
        maps.join(
            nxt,
            (F.col("nbkt") == F.col("bkt"))
            & (
                F.col("nday")
                == F.date_format(
                    F.date_add(F.to_date("day"), 1), "yyyy-MM-dd"
                )
            ),
        )
        .groupBy("day")
        .agg(
            F.sum(F.bit_count(F.col("bmp").bitwiseAND(F.col("nbmp"))))
            .cast("long")
            .alias("n_retained")
        )
    )
    return (
        active.join(paired, "day", "left")
        .select(
            "day",
            "n_active",
            F.coalesce(F.col("n_retained"), F.lit(0))
            .cast("long")
            .alias("n_retained_d1"),
            F.round(
                F.coalesce(F.col("n_retained"), F.lit(0)).cast("double")
                / F.col("n_active"),
                6,
            ).alias("retention_d1"),
        )
        .orderBy("day")
    )


@query(
    "q_sql_scripting",
    oracle="""
    WITH r AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      FROM orders
    ),
    s1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sx,
             SUM(CAST(c AS HUGEINT) * c) AS sxx
      FROM r
    ),
    d1 AS (
      SELECT n, CAST(sx AS DOUBLE) / n AS m,
             sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (n - 1))) AS s
      FROM s1
    ),
    s2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sx,
             SUM(CAST(c AS HUGEINT) * c) AS sxx
      FROM r, d1
      WHERE CAST(c AS DOUBLE) >= d1.m - 2 * d1.s
        AND CAST(c AS DOUBLE) <= d1.m + 2 * d1.s
    ),
    d2 AS (
      SELECT n, CAST(sx AS DOUBLE) / n AS m,
             sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (n - 1))) AS s
      FROM s2
    ),
    s3 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sx,
             SUM(CAST(c AS HUGEINT) * c) AS sxx
      FROM r, d2
      WHERE CAST(c AS DOUBLE) >= d2.m - 2 * d2.s
        AND CAST(c AS DOUBLE) <= d2.m + 2 * d2.s
    ),
    d3 AS (
      SELECT n, CAST(sx AS DOUBLE) / n AS m,
             sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (n - 1))) AS s
      FROM s3
    )
    SELECT d3.n AS n_kept,
           floor(d3.m / 100.0 * 1e6 + 0.5) / 1e6 AS mean_dollars,
           floor(d3.s / 100.0 * 1e6 + 0.5) / 1e6 AS sd_dollars,
           floor(d1.m / 100.0 * 1e6 + 0.5) / 1e6 AS first_mean,
           floor(d1.s / 100.0 * 1e6 + 0.5) / 1e6 AS first_sd,
           CAST(3 AS INT) AS n_iter
    FROM d3, d1
    """,
)
def q_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN…END compound statements, r10 VERDICT
    task 5): the multi-statement procedural surface the reference's
    delegated HiveQL scripts exercise through `beeline -f`
    (docker/docker-compose.yml:104) — DECLARE'd scalar state, a WHILE
    loop whose body assigns from scalar subqueries over the corpus, and
    an IF branch, all parsed and executed by Spark itself (no driver
    Python in the loop — contrast q_dedup_groups, whose iteration is a
    Python driver loop).  The demonstration is 2-sigma clipping of
    order totals: three iterations of (aggregate → mean/sd → clip
    bounds), the classical robust-mean procedure that is genuinely
    ITERATIVE (each pass's bounds depend on the previous pass's
    moments), so it can't be one static SELECT — but unrolls exactly,
    which is what the DuckDB oracle states (3 CTE levels).

    Determinism: each pass aggregates exact integer carriers (cents
    BIGINT; Σc² on DECIMAL(38)/HUGEINT — BIGINT saturates past ~sf0.3
    at 5.5e7-cent maxima); mean and sd are the same fixed-order double
    assembly in both engines, so the clip predicate compares identical
    doubles and selects identical row sets.  Displays are floor-pinned.
    Scale: 3 corpus scans (inherent to the iteration count), each a
    map-side-combinable aggregate with the filter pushed to the scan;
    the script's scalar state lives on the driver — O(1).  Each loop
    iteration reuses ONE tuple-assignment SET (one job), not one job
    per variable."""
    from data_warehouse_hive_spark.tables import t as _t

    _t(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("long")
        .alias("c")
    ).createOrReplaceTempView("sqlscript_cents")
    return spark.sql(
        """
        BEGIN
          DECLARE i INT DEFAULT 1;
          DECLARE n BIGINT DEFAULT 0;
          DECLARE sx BIGINT DEFAULT 0;
          DECLARE sxx DECIMAL(38,0) DEFAULT 0;
          DECLARE m DOUBLE DEFAULT 0.0;
          DECLARE s DOUBLE DEFAULT 0.0;
          DECLARE first_m DOUBLE DEFAULT 0.0;
          DECLARE first_s DOUBLE DEFAULT 0.0;
          DECLARE lo DOUBLE DEFAULT 0.0;
          DECLARE hi DOUBLE DEFAULT 0.0;
          WHILE i <= 3 DO
            IF i = 1 THEN
              SET (n, sx, sxx) = (
                SELECT COUNT(*), SUM(c), SUM(CAST(c AS DECIMAL(38,0)) * c)
                FROM sqlscript_cents);
            ELSE
              SET (n, sx, sxx) = (
                SELECT COUNT(*), SUM(c), SUM(CAST(c AS DECIMAL(38,0)) * c)
                FROM sqlscript_cents
                WHERE CAST(c AS DOUBLE) >= lo AND CAST(c AS DOUBLE) <= hi);
            END IF;
            -- ONE tuple-SET for the whole post-aggregate update (r14,
            -- the q_sql_scripting_for fold): every RHS reads only the
            -- PRE-update variables (n, sx, sxx, i, first_m, first_s),
            -- so the mean/sd expressions are repeated verbatim where
            -- the scalar form chained them through m and s — the same
            -- deterministic double expressions evaluate to the same
            -- bits, and 5-7 interpreted statements per iteration
            -- become 1 (measured 1.24 s → 0.65-0.87 s at sf0.1,
            -- identical output at every SF).
            SET (m, s, first_m, first_s, lo, hi, i) = (SELECT
              CAST(sx AS DOUBLE) / n,
              sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   / (CAST(n AS DOUBLE) * (n - 1))),
              CASE WHEN i = 1 THEN CAST(sx AS DOUBLE) / n
                   ELSE first_m END,
              CASE WHEN i = 1 THEN
                sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     / (CAST(n AS DOUBLE) * (n - 1)))
                   ELSE first_s END,
              CAST(sx AS DOUBLE) / n
                - 2 * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           / (CAST(n AS DOUBLE) * (n - 1))),
              CAST(sx AS DOUBLE) / n
                + 2 * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           / (CAST(n AS DOUBLE) * (n - 1))),
              i + 1);
          END WHILE;
          SELECT n AS n_kept,
                 floor(m / 100.0 * 1e6 + 0.5) / 1e6 AS mean_dollars,
                 floor(s / 100.0 * 1e6 + 0.5) / 1e6 AS sd_dollars,
                 floor(first_m / 100.0 * 1e6 + 0.5) / 1e6 AS first_mean,
                 floor(first_s / 100.0 * 1e6 + 0.5) / 1e6 AS first_sd,
                 CAST(3 AS INT) AS n_iter;
        END
        """
    )


@query(
    "q_sql_scripting_for",
    oracle="""
    WITH RECURSIVE m AS (
      SELECT CAST(year(o_orderdate) * 4
                  + (month(o_orderdate) - 1) // 3 AS BIGINT) AS t,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM m
    ),
    net AS (
      SELECT t, x - (SELECT s // n FROM tot) AS net,
             ROW_NUMBER() OVER (ORDER BY t) AS rn
      FROM m
    ),
    walk(rn, bal, resets, mx) AS (
      SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT)
      UNION ALL
      SELECT n.rn,
             CASE WHEN w.bal + n.net < 0 THEN 0
                  ELSE w.bal + n.net END,
             w.resets + CASE WHEN w.bal + n.net < 0 THEN 1 ELSE 0 END,
             GREATEST(w.mx, CASE WHEN w.bal + n.net < 0 THEN 0
                                 ELSE w.bal + n.net END)
      FROM walk w JOIN net n ON n.rn = w.rn + 1
    )
    SELECT (SELECT n FROM tot) AS n_periods,
           CAST(resets AS BIGINT) AS n_resets,
           bal / 100.0 AS final_balance,
           mx / 100.0 AS max_balance
    FROM walk ORDER BY rn DESC LIMIT 1
    """,
)
def q_sql_scripting_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-scripting FOR-over-cursor (Spark 4 `FOR row AS SELECT … DO`)
    — the second HPL/SQL staple next to q_sql_scripting's WHILE/IF
    (Hive 4 ships the hplsql procedural front-end on the deployed
    HiveServer2, docker/docker-compose.yml:73-105; cursor FOR loops
    are its core construct).  The demonstration is genuinely
    SEQUENTIAL state no single relation expresses: a cash-balance walk
    over the QUARTERLY net series with reset-on-breach (balance += net;
    if negative → count a reset and reset to 0; track the running
    max).  Each month's state depends on every prior reset decision —
    the branching recurrence that defeats window cumsum algebra — so
    the DuckDB oracle states the IDENTICAL integer recurrence as a
    recursive CTE.

    Determinism: all state is exact BIGINT cents (budget = total DIV
    n_periods, integer floor division both engines); the cursor orders
    by the total quarter key; displays are raw single divisions.
    Scale: the cursor ranges over the QUARTER DOMAIN (~27 rows
    regardless of corpus size) — the 100 TB contract for FOR-loops is
    that they walk a domain-bounded relation, never the corpus; the
    corpus-scale work (the quarter rollup) happens in ONE aggregation
    before the loop.  Domain choice is also the COST lever: Spark's
    scripting interpreter pays ~60 ms per executed statement (measured
    r11), so a FOR body's wall time is statements x rows — quarters
    keep the honest demo bounded where months cost ~3x for identical
    semantics, and the body is ONE tuple-SET per row (r14; see the
    in-script comment)."""
    from data_warehouse_hive_spark.tables import t as _t

    m = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            (
                F.year("o_orderdate") * 4
                + F.floor((F.month("o_orderdate") - 1) / 3)
            )
            .cast("long")
            .alias("t")
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("x")
        )
    )
    tot = m.agg(
        F.sum("x").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    m.crossJoin(F.broadcast(tot)).select(
        "t", (F.col("x") - F.expr("s div n")).alias("net")
    ).createOrReplaceTempView("sqlscript_months")
    return spark.sql(
        """
        BEGIN
          DECLARE bal BIGINT DEFAULT 0;
          DECLARE mx BIGINT DEFAULT 0;
          DECLARE resets BIGINT DEFAULT 0;
          DECLARE nm BIGINT DEFAULT 0;
          SET nm = (SELECT COUNT(*) FROM sqlscript_months);
          -- ONE statement per row (r14 optimization, guide §1.2 "fix
          -- the per-task work"): each scripted statement pays its own
          -- parse/analyze/execute, so the loop's cost is statements ×
          -- rows.  r11 halved 6 statements to 3 via branch-free
          -- CASE/GREATEST; this folds the remaining 3 into one
          -- tuple-assignment SET over a FROM-less SELECT (evaluated
          -- against the local one-row relation — no distributed job).
          -- All three expressions read the PRE-update variables, so
          -- the new bal term GREATEST(bal + r.net, 0) is repeated
          -- inside the mx update — same recurrence, measured 3.75 s →
          -- 2.8 s at sf0.1.
          FOR r AS SELECT t, net FROM sqlscript_months ORDER BY t DO
            SET (resets, bal, mx) = (SELECT
              resets + CASE WHEN bal + r.net < 0 THEN 1 ELSE 0 END,
              GREATEST(bal + r.net, 0),
              GREATEST(mx, GREATEST(bal + r.net, 0)));
          END FOR;
          SELECT nm AS n_periods, resets AS n_resets,
                 CAST(bal AS DOUBLE) / 100.0 AS final_balance,
                 CAST(mx AS DOUBLE) / 100.0 AS max_balance;
        END
        """
    )
