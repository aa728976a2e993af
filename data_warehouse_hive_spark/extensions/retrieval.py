"""Retrieval-quality operators — rank fusion and ANN recall evaluation
(SURVEY.md §2.12).

The reference has no retrieval surface at all (its queries stop at
HiveQL), but a training-data pipeline that builds similarity indexes
(extensions/similarity.py) also needs the evaluation half: fuse multiple
rankers into one ordering, and measure how much recall the approximate
index loses versus exact search.  Both are pure DataFrame compositions
over the existing search operators — no new physical machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_hive_spark.registry import query
from data_warehouse_hive_spark.extensions.similarity import (
    N_QUERY_VECS,
    TOP_K,
    _fixture_corpus,
    _o_lsh_bucket,
    brute_force_topk,
    lsh_topk,
)
from data_warehouse_hive_spark.tables import t

RRF_K = 60  # the standard reciprocal-rank-fusion constant
FUSE_TOP = 20


@query(
    "q_rank_fusion",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, n_chars,
             len(string_split_regex(trim(text), '\\s+')) AS n_words
      FROM documents
    ),
    ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rank_chars,
             ROW_NUMBER() OVER (ORDER BY n_words DESC, doc_id) AS rank_words
      FROM d
    ),
    fused AS (
      SELECT doc_id, rank_chars, rank_words,
             1.0 / ({RRF_K} + rank_chars) + 1.0 / ({RRF_K} + rank_words) AS rrf
      FROM ranked
    )
    SELECT doc_id, rank_chars, rank_words, rrf,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS fused_rank
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT {FUSE_TOP}
    """,
)
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (RRF, k=60): combine two independent
    rankers into one ordering — the standard way to merge lexical and
    embedding retrieval lists without score calibration.

    Here the two rankers are corpus-wide orderings (char mass and word
    count), which demonstrates the algebra; in production each ranker
    contributes a BOUNDED per-query candidate list (top-k from
    q_sim_search / a lexical index), so the window never sees the full
    corpus and partitions by query_id.  The RRF score is a sum of two
    reciprocals of small integers evaluated in a fixed order — identical
    IEEE ops in both engines, so fused ranks hash-match exactly.
    """
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_words"),
    )
    ranked = d.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("n_chars").desc(), F.col("doc_id")))
        .alias("rank_chars"),
        F.row_number()
        .over(Window.orderBy(F.col("n_words").desc(), F.col("doc_id")))
        .alias("rank_words"),
    )
    rrf = (
        F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_chars"))
        + F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_words"))
    ).alias("rrf")
    fused = ranked.select("doc_id", "rank_chars", "rank_words", rrf)
    return (
        fused.withColumn(
            "fused_rank",
            F.row_number()
            .over(Window.orderBy(F.col("rrf").desc(), F.col("doc_id")))
            .cast("long"),
        )
        .orderBy(F.col("rrf").desc(), F.col("doc_id"))
        .limit(FUSE_TOP)
    )


@query(
    "q_sim_recall",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {N_QUERY_VECS}),
    exact_scored AS (
      SELECT q.query_id, v.vec_id,
             round(list_dot_product(q.qe, v.e)
                   / (sqrt(list_dot_product(q.qe, q.qe))
                      * sqrt(list_dot_product(v.e, v.e))), 6) AS cosine
      FROM q JOIN v ON v.vec_id != q.query_id
    ),
    exact_topk AS (
      SELECT query_id, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id) AS rk
        FROM exact_scored
      ) WHERE rk <= {TOP_K}
    ),
    vb AS (SELECT *, {_o_lsh_bucket('e')} AS bucket FROM v),
    qb AS (SELECT vec_id AS query_id, e AS qe, bucket
           FROM vb WHERE vec_id < {N_QUERY_VECS}),
    lsh_scored AS (
      SELECT qb.query_id, vb.vec_id,
             round(list_dot_product(qb.qe, vb.e)
                   / (sqrt(list_dot_product(qb.qe, qb.qe))
                      * sqrt(list_dot_product(vb.e, vb.e))), 6) AS cosine
      FROM qb JOIN vb ON vb.bucket = qb.bucket AND vb.vec_id != qb.query_id
    ),
    lsh_topk AS (
      SELECT query_id, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id) AS rk
        FROM lsh_scored
      ) WHERE rk <= {TOP_K}
    )
    SELECT e.query_id,
           COUNT(*) AS n_exact,
           CAST(COUNT(l.vec_id) AS BIGINT) AS n_hit,
           CAST(COUNT(l.vec_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS recall_at_k
    FROM exact_topk e
    LEFT JOIN lsh_topk l
      ON l.query_id = e.query_id AND l.vec_id = e.vec_id
    GROUP BY e.query_id
    """,
)
def q_sim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index evaluation: recall@k of the LSH-bucketed search against
    exact brute force, per query — the measurement that decides whether
    an approximate index is shippable.

    Composition of two existing operators: exact top-k (ground truth) LEFT
    JOINs the LSH top-k on (query, neighbor); the hit ratio is recall.
    Both sides end in Q×k-row lists, so the join and the per-query
    aggregate are negligible next to the searches themselves; at 100 TB
    ground truth is computed once per index build on a sampled query set
    (Q is bounded by contract), which is exactly this plan's shape.  The
    recall division is one double op on identical small-integer operands.
    """
    v, q = _fixture_corpus(spark, sf_dir)
    exact = brute_force_topk(v, q, TOP_K).select("query_id", "vec_id")
    approx = lsh_topk(v, q, TOP_K).select(
        F.col("query_id").alias("l_query_id"), F.col("vec_id").alias("l_vec_id")
    )
    return (
        exact.join(
            approx,
            (F.col("query_id") == F.col("l_query_id"))
            & (F.col("vec_id") == F.col("l_vec_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("l_vec_id").alias("n_hit"),
            (
                F.count("l_vec_id").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("recall_at_k"),
        )
    )
