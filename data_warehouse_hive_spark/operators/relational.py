"""Projections, filters, predicates, conditionals — SURVEY.md §2.2.

The reference delegates this whole family to HiveQL (engine deployed at
reference docker/docker-compose.yml:73-105; the backend itself only ever
emits `SELECT 1` / `COUNT(*)` — reference backend/hive_manager.py:152,400).
Here each predicate family is a declarative DataFrame plan so Catalyst
pushes filters into the parquet scan (verify: `.explain` shows
PushedFilters) and prunes columns (ReadSchema lists only selected cols).

Scale notes: every query below is a narrow map-side plan — no shuffle at
all except `q_distinct` (hash-partial + exchange on the distinct keys),
which is the minimal shuffle for that semantic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_hive_spark.registry import query
from data_warehouse_hive_spark.tables import t


@query(
    "q_scan_parquet",
    oracle="SELECT p_partkey, p_name, p_retailprice FROM part",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar parquet scan with column pruning — the flagship data
    access for every q_… query (the deployed Hive's STORED AS surface;
    our standard format per BASELINE.json).  ReadSchema in .explain shows
    only the 3 projected columns reach the scan."""
    return t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_retailprice")


@query(
    "q_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity + 1.0 AS qty_plus_one
    FROM lineitem
    """,
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection + computed expressions + aliases.

    Per-row IEEE double arithmetic on identical operands is deterministic
    across engines, so computed columns are emitted raw (no rounding).
    """
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("charge"),
        (F.col("l_quantity") + 1.0).alias("qty_plus_one"),
    )


@query(
    "q_filter_compare",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_quantity < 24
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    """,
)
def q_filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE with comparison operators on numeric and timestamp columns.

    All three predicates reach the parquet scan as PushedFilters.
    """
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 24)
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@query(
    "q_filter_bool",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice > 150000)
      AND NOT (o_orderpriority = '5-LOW')
    """,
)
def q_filter_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND / OR / NOT predicates."""
    o = t(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 150000))
        & ~(F.col("o_orderpriority") == "5-LOW")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "q_filter_in",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
    """,
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate."""
    c = t(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "q_filter_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_discount, l_quantity
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity BETWEEN 10 AND 20
    """,
)
def q_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN range predicate."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_discount").between(0.05, 0.07) & F.col("l_quantity").between(10, 20)
    ).select("l_orderkey", "l_linenumber", "l_discount", "l_quantity")


@query(
    "q_filter_like",
    oracle=r"""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%BRASS%' OR p_name LIKE 'a%'
    """,
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern predicates (contains + prefix)."""
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%BRASS%") | F.col("p_name").like("a%")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "q_filter_null",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderpriority, '1-URGENT') AS pri_or_null,
           (NULLIF(o_orderpriority, '1-URGENT') IS NOT NULL) AS has_pri
    FROM orders
    WHERE NULLIF(o_orderstatus, 'O') IS NOT NULL
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL semantics (nulls synthesized via NULLIF —
    the driver fixtures contain no physical NULLs)."""
    o = t(spark, sf_dir, "orders")
    pri_or_null = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    return (
        o.withColumn("pri_or_null", pri_or_null)
        .withColumn("has_pri", pri_or_null.isNotNull())
        .filter(F.nullif(F.col("o_orderstatus"), F.lit("O")).isNotNull())
        .select("o_orderkey", "pri_or_null", "has_pri")
    )


@query(
    "q_case_when",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 15 THEN 'mid'
                ELSE 'small' END AS qty_band,
           CASE WHEN l_discount > 0.05 THEN l_extendedprice * (1 - l_discount)
                ELSE l_extendedprice END AS eff_price,
           COALESCE(NULLIF(l_returnflag, 'N'), 'NONE') AS flag_or_none
    FROM lineitem
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / COALESCE / NVL-style conditionals."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 15, "mid")
        .otherwise("small")
        .alias("qty_band"),
        F.when(
            F.col("l_discount") > 0.05,
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
        )
        .otherwise(F.col("l_extendedprice"))
        .alias("eff_price"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("NONE")).alias(
            "flag_or_none"
        ),
    )


@query(
    "q_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — partial hash-aggregate map-side, then one exchange
    on the distinct keys (the minimal shuffle for the semantic)."""
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "q_sample_bucket",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::UBIGINT::BIGINT % 16 = 0
    """,
)
def q_sample_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive TABLESAMPLE(BUCKET 1 OUT OF 16 ON key) semantics: a
    deterministic 1/16 sample by hashing the bucketing column — the
    repeatable-sampling idiom (same rows every run, every engine),
    unlike rand()-based TABLESAMPLE PERCENT.  At scale this composes
    with bucketed storage: sampling a bucketed table by its bucket
    column prunes whole files instead of scanning.  md5 stands in for
    Hive's bucket hash so the oracle checks the exact row set."""
    o = t(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 16
    )
    return o.filter(bucket == 0).select("o_orderkey", "o_custkey", "o_totalprice")
