"""Similarity search over `embeddings` — SURVEY.md §2.12 north-star.

Two tiers, mirroring production vector-search architecture:

  q_sim_search      — exact brute-force top-k cosine for a bounded query
                      set: broadcast the Q query vectors against the
                      corpus (corpus never shuffles; per-partition local
                      top-k via window rank).  Cost O(N·Q·d) map-side —
                      the correctness baseline any ANN recall is measured
                      against.
  q_sim_search_ivf  — IVF-style two-stage search: coarse cells = the
                      label blocks with decimal-anchored exact centroids;
                      probe the nearest cell(s) only.  At 100 TB the cell
                      id is the partition key, so a query touches 1/K of
                      the data.  Centroids are exact-decimal means, so
                      even this ANN variant is value-checked by the
                      DuckDB oracle.

Dot products use `F.zip_with` + left-fold `F.aggregate` (JVM-side, no
Python); cosines are rounded to 6 dp before ranking/thresholding so both
engines rank identical values (fold order inside an engine is sequential
but FMA/vectorization could differ in the last ulp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from data_warehouse_hive_spark.registry import query
from data_warehouse_hive_spark.tables import t

N_QUERY_VECS = 5  # vec_id < 5 are the query set in the fixtures
TOP_K = 10


def as_double_vec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(x: Column, y: Column) -> Column:
    """JVM-side dot product: zip_with multiply + sequential left fold."""
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(x: Column, y: Column, dp: int = 6) -> Column:
    return F.round(dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y))), dp)


@query(
    "q_sim_search",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {N_QUERY_VECS}),
    scored AS (
      SELECT q.query_id, v.vec_id, v.label,
             round(list_dot_product(q.qe, v.e)
                   / (sqrt(list_dot_product(q.qe, q.qe))
                      * sqrt(list_dot_product(v.e, v.e))), 6) AS cosine
      FROM q JOIN v ON v.vec_id != q.query_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rk
      FROM scored
    )
    SELECT query_id, vec_id, label, cosine, rk
    FROM ranked WHERE rk <= {TOP_K}
    """,
)
def q_sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force top-k cosine search: Q=5 query vectors broadcast
    against the corpus, per-query top-10 via window rank (rounded-cosine
    order with vec_id tiebreak → fully deterministic result set).

    Spark plans the rank-filter as WindowGroupLimit: each partition keeps
    only k rows per query before the shuffle — the scalable exact-knn
    shape."""
    v = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double_vec("embedding").alias("e")
    )
    q = v.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = (
        v.join(broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "label",
            cosine(F.col("qe"), F.col("e")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
    )


@query(
    "q_sim_search_ivf",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    elems AS (
      SELECT v.label, u.pos, u.val
      FROM v, LATERAL (SELECT unnest(v.e) AS val,
                              unnest(range(len(v.e))) AS pos) u
    ),
    centroids AS (
      SELECT label, pos,
             CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS cval
      FROM elems GROUP BY label, pos
    ),
    cent_vecs AS (
      SELECT label, list(cval ORDER BY pos) AS ce FROM centroids GROUP BY label
    ),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {N_QUERY_VECS}),
    cell AS (
      SELECT query_id, label AS probe_label
      FROM (
        SELECT q.query_id, c.label,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_dot_product(q.qe, c.ce)
                       / (sqrt(list_dot_product(q.qe, q.qe))
                          * sqrt(list_dot_product(c.ce, c.ce))), 6) DESC,
                 c.label) AS crk
        FROM q CROSS JOIN cent_vecs c
      ) WHERE crk = 1
    ),
    scored AS (
      SELECT q.query_id, v.vec_id, v.label,
             round(list_dot_product(q.qe, v.e)
                   / (sqrt(list_dot_product(q.qe, q.qe))
                      * sqrt(list_dot_product(v.e, v.e))), 6) AS cosine
      FROM q
      JOIN cell ON cell.query_id = q.query_id
      JOIN v ON v.label = cell.probe_label AND v.vec_id != q.query_id
    )
    SELECT query_id, vec_id, label, cosine, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rk
      FROM scored
    ) WHERE rk <= {TOP_K}
    """,
)
def q_sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: (1) exact decimal-anchored centroid per label cell,
    (2) route each query to its nearest centroid, (3) exact top-k within
    that single cell only.  The corpus is partitioned by cell id, so each
    query scans 1/|cells| of the data — the scale path; recall vs
    q_sim_search measures the ANN tradeoff (tested in tests/)."""
    v = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double_vec("embedding").alias("e")
    )
    # (1) exact centroids: explode to (label, pos, val), decimal-mean, re-pack
    elems = v.select(
        "label", F.posexplode(F.col("e")).alias("pos", "val")
    )
    centroids = (
        elems.groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("cval")
        )
    )
    cent_vecs = (
        centroids.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("pv"))
        .select("label", F.transform("pv", lambda s: s.cval).alias("ce"))
    )
    q = v.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    # (2) route each query to its nearest cell centroid
    wq = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("label")
    )
    cell = (
        q.crossJoin(broadcast(cent_vecs))
        .select(
            "query_id",
            "label",
            cosine(F.col("qe"), F.col("ce")).alias("ccos"),
        )
        .withColumn("crk", F.row_number().over(wq))
        .filter(F.col("crk") == 1)
        .select("query_id", F.col("label").alias("probe_label"))
    )
    # (3) exact search within the probed cell
    scored = (
        q.join(broadcast(cell), "query_id")
        .join(v, (v.label == F.col("probe_label")) & (v.vec_id != F.col("query_id")))
        .select(
            "query_id",
            "vec_id",
            "label",
            cosine(F.col("qe"), F.col("e")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
    )
