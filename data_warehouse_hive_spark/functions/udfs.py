"""UDF / UDAF / UDTF surface — SURVEY.md §2.9.

The reference exposes Hive's CREATE FUNCTION surface but defines no
functions of its own (absence verified across reference backend/).  Here
the three extension points are demonstrated the Spark-native way:

  * scalar UDF    → `@pandas_udf` (Arrow-vectorized, 10-100× faster than
                    row-at-a-time Python UDFs; the ONLY acceptable form in
                    a hot path when a builtin truly can't express it)
  * grouped UDAF  → `applyInPandas` over groupBy (arbitrary per-group
                    pandas logic, partitioned by the group key)
  * UDTF          → one row in → N rows out, via builtin explode of a
                    UDF-computed array (the composable, codegen-friendly
                    shape for table functions)

Each demo computes something a builtin could also compute, precisely so
the DuckDB oracle can verify the UDF machinery end-to-end.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from data_warehouse_hive_spark.registry import o_dsum, query
from data_warehouse_hive_spark.tables import spread, t


@pandas_udf(DoubleType())
def _effective_price(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: same IEEE ops as the SQL expression, executed
    on Arrow batches."""
    return price * (1.0 - discount) * (1.0 + tax)


@query(
    "q_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS eff_price
    FROM lineitem
    WHERE l_quantity <= 5
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF (pandas elementwise arithmetic is
    the same IEEE double op sequence as the SQL expression, so results are
    bit-identical to the oracle)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= 5)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _effective_price("l_extendedprice", "l_discount", "l_tax").alias("eff_price"),
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT l_suppkey,
           (CAST(SUM(CAST(floor(l_extendedprice * l_quantity * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)
             / (CAST(SUM(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)
             AS weighted_avg_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped UDAF via applyInPandas: quantity-weighted average price per
    supplier.  The group key is HIGH-cardinality on purpose — grouping a
    fact table by a 3-value key would funnel the whole table through 3
    tasks at scale; per-suppkey groups shuffle once and fan out across
    every core.  The numpy code inside the UDF mirrors the exact
    scaled-long carrier (floor(x·1e6+0.5) summed as int64 — identical
    IEEE ops to the JVM/DuckDB formula), so the Python path hash-matches
    the oracle exactly with vectorized arithmetic, no per-row Decimal."""
    import numpy as np

    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_quantity"
    )

    def weighted(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf["l_extendedprice"].to_numpy()
        q = pdf["l_quantity"].to_numpy()
        # products ≤ ~5e6 → ·1e6 ≤ 5e12 < 2^53: the floor result is exact
        # in float64 and converts to int64 losslessly
        num = int(np.floor(p * q * 1e6 + 0.5).astype(np.int64).sum())
        den = int(np.floor(q * 1e6 + 0.5).astype(np.int64).sum())
        return pd.DataFrame(
            {
                "l_suppkey": [int(pdf["l_suppkey"].iloc[0])],
                "weighted_avg_price": [(float(num) / 1e6) / (float(den) / 1e6)],
                "n": [len(pdf)],
            }
        )

    return li.groupBy("l_suppkey").applyInPandas(
        weighted, schema="l_suppkey long, weighted_avg_price double, n long"
    )


@query(
    "q_udtf",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_type, ' ')) AS type_word
    FROM part
    WHERE p_size >= 40
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function shape (one row → N rows): explode over a computed
    array — Hive UDTF / LATERAL VIEW ≙ Spark generator expression."""
    p = t(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    return p.select(
        "p_partkey", F.explode(F.split("p_type", " ")).alias("type_word")
    )


@query(
    "q_udtf_python",
    oracle="""
    SELECT p_partkey,
           unnest(string_split(p_type, ' ')) AS type_word,
           CAST(len(string_split(p_type, ' ')) AS INT) AS n_words
    FROM part
    WHERE p_size >= 45
    """,
)
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (Spark 3.5+/4 `@udtf` class: eval yields N rows
    per input row), registered and invoked through SQL LATERAL — the
    full custom-table-function surface, vs q_udtf's codegen-friendly
    generator-expression form.  Row-at-a-time Python: demo of the
    mechanism, not a hot-path shape (that's q_udtf / mapInPandas).
    The oracle verifies the UDTF machinery end-to-end."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="type_word string, n_words int")
    class SplitTypeWords:
        def eval(self, p_type: str):
            words = p_type.split(" ")
            for w in words:
                yield (w, len(words))

    spark.udtf.register("split_type_words", SplitTypeWords)
    t(spark, sf_dir, "part").createOrReplaceTempView("part_udtf_src")
    return spark.sql(
        """
        SELECT p.p_partkey, s.type_word, s.n_words
        FROM part_udtf_src p, LATERAL split_type_words(p.p_type) s
        WHERE p.p_size >= 45
        """
    )


@query(
    "q_udtf_analyze",
    oracle="""
    SELECT p_partkey,
           p_brand AS brand,
           p_type AS type
    FROM part
    WHERE p_size >= 45
    """,
)
def q_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 `analyze`): the output schema is
    computed at plan time from a constant argument — here a column-name
    spec string — instead of being declared statically.  This is the
    dynamic-unpivot / schema-from-config capability (one UDTF serves any
    field layout), which no static returnType UDTF can express.

    `analyze` runs once on the driver with the foldable args; eval then
    unpacks each delimited row into the derived columns.  Same
    row-at-a-time caveat as q_udtf_python — mechanism demo, hot paths
    use mapInPandas.
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class UnpackDelimited:
        @staticmethod
        def analyze(names: AnalyzeArgument, row: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for col in names.value.split(","):
                schema = schema.add(col.strip(), StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, names: str, row: str):
            yield tuple(row.split("|"))

    spark.udtf.register("unpack_delimited", UnpackDelimited)
    t(spark, sf_dir, "part").createOrReplaceTempView("part_udtf_poly")
    return spark.sql(
        """
        SELECT p.p_partkey, u.brand, u.type
        FROM part_udtf_poly p,
             LATERAL unpack_delimited('brand,type',
                                      concat(p.p_brand, '|', p.p_type)) u
        WHERE p.p_size >= 45
        """
    )


@query(
    "q_fn_sql_udf",
    oracle=f"""
    SELECT l_returnflag,
           {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (Spark 4 `CREATE FUNCTION ... RETURN
    expr`) — the Hive `CREATE FUNCTION` parity surface WITHOUT leaving the
    optimizer: the body is inlined into the plan at analysis, so the
    charge expression below stays in whole-stage codegen, unlike a Python
    UDF (this is the recommended replacement for trivial UDFs at scale).
    The oracle proves inlining by computing the expression directly.
    """
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charge(price DOUBLE, disc DOUBLE,
                                                    tax DOUBLE)
        RETURNS DOUBLE
        RETURN price * (1 - disc) * (1 + tax)
        """
    )
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_sqludf")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(CAST(floor(charge(l_extendedprice, l_discount, l_tax)
                                   * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6
                 AS sum_charge,
               COUNT(*) AS n_rows
        FROM lineitem_sqludf
        GROUP BY l_returnflag
        """
    )


@query(
    "q_fn_sql_udtf",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS tc
      FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT o_orderkey, CAST(u.i + 1 AS INT) AS k,
           tc // 3 + (CASE WHEN u.i + 1 <= tc % 3 THEN 1 ELSE 0 END)
             AS amount_cents
    FROM o, LATERAL (SELECT unnest(range(3)) AS i) u
    """,
)
def q_fn_sql_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined TABLE function (Spark 4 `CREATE FUNCTION ... RETURNS
    TABLE ... RETURN SELECT`) joined LATERAL per outer row — the set-
    returning half of the Hive CREATE FUNCTION parity surface
    (backend/hive_manager.py ships function DDL to HiveServer2;
    q_fn_sql_udf covers the scalar half).  Like the scalar form, the
    body is INLINED at analysis time: the lateral expansion plans as a
    correlated generate over the relational body, fully inside
    Catalyst — no Python worker, no serialization boundary.

    The function splits an exact-cents order total into n equal
    installments with the remainder cents spread over the first rows —
    integer-exact (Σ amount_cents == total_cents by construction), so
    the oracle (the same algebra inlined over unnest(range)) matches
    bit-for-bit.

    Probe finding (r11 VERDICT task 5, kept for the record): a TVF body
    of `FROM range(n)` fails analysis with NON_FOLDABLE_ARGUMENT — the
    range() table function requires foldable bounds even inside a
    function body.  `explode(sequence(1, n))` accepts correlated
    arguments and is the working idiom for parameter-sized row
    generation."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION installments(
            total_cents BIGINT, n INT)
        RETURNS TABLE (k INT, amount_cents BIGINT)
        RETURN SELECT s.k,
               total_cents DIV n
                 + CASE WHEN s.k <= CAST(total_cents % n AS INT)
                        THEN 1 ELSE 0 END AS amount_cents
        FROM (SELECT explode(sequence(1, n)) AS k) s
        """
    )
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_sqltvf")
    return spark.sql(
        """
        SELECT o.o_orderkey, i.k, i.amount_cents
        FROM orders_sqltvf o,
             LATERAL installments(
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT), 3) i
        WHERE o.o_orderstatus = 'O'
        """
    )


@query(
    "q_agg_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT u.t AS token
      FROM documents,
           LATERAL (SELECT unnest(string_split(
             lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS t) u
    ),
    tot AS (SELECT COUNT(*) AS n FROM toks),
    cnt AS (SELECT token, COUNT(*) AS freq FROM toks GROUP BY token)
    SELECT c.token, c.freq
    FROM cnt c CROSS JOIN tot
    WHERE c.freq * 25 > tot.n
    ORDER BY c.freq DESC, c.token
    """,
)
def q_agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (tokens with frequency > n/25) via the
    two-pass Misra-Gries pattern — THE way to find hot keys when the key
    cardinality is too large to shuffle a full groupBy (the oracle's
    form): pass 1 runs the Misra-Gries streaming summary per partition
    (bounded 25-counter state in an Arrow-batched mapInPandas — MG
    guarantees every item above the threshold survives SOME partition's
    summary), pass 2 exactly counts ONLY the ≤ partitions×25 candidate
    keys via a broadcast semi-join — so the one shuffle carries
    candidate tokens instead of the full vocabulary.  False candidates
    are killed by the exact threshold filter, so the result equals the
    oracle's full groupBy exactly.

    This is the (b)-tier custom-operator strategy: per-partition
    imperative state that DataFrame ops can't express, Arrow-batched,
    with output bounded by construction.
    """
    import pandas as _pd

    d = spread(t(spark, sf_dir, "documents").select("text"), spark)
    toks = d.select(
        F.explode(
            F.split(
                F.lower(F.regexp_replace(F.trim("text"), r"\s+", " ")), " "
            )
        ).alias("token")
    )

    k = 25

    def mg_partition(batches):
        # yields the MG candidate summary PLUS this partition's token
        # count — the global total then comes from the same (tiny)
        # summary relation instead of a third full tokenization scan
        counters: dict[str, int] = {}
        seen = 0
        for pdf in batches:
            seen += len(pdf)
            for tok in pdf["token"]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < k:
                    counters[tok] = 1
                else:
                    dead = [c for c in counters if counters[c] == 1]
                    for c in counters:
                        counters[c] -= 1
                    for c in dead:
                        del counters[c]
        yield _pd.DataFrame(
            {
                "token": list(counters.keys()) + [None],
                "pcnt": [0] * len(counters) + [seen],
            }
        )

    # The MG summary is bounded at partitions x (k+1) rows by
    # construction, so ONE job collects it whole (candidates + total
    # together) — no checkpoint materialization and no second summary
    # job; the exact pass is then the only other scan of `toks`.
    mg_rows = toks.mapInPandas(
        mg_partition, "token string, pcnt long"
    ).collect()
    total = sum(r.pcnt for r in mg_rows if r.token is None)
    cand = sorted({r.token for r in mg_rows if r.token is not None})
    candidates = spark.createDataFrame(
        [(c,) for c in cand] or [(None,)], "token string"
    )
    exact = (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * k > F.lit(total))
    )
    return exact.orderBy(F.col("freq").desc(), "token")


@query(
    "q_udf_arrow_native",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
    """,
)
def q_udf_arrow_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy tier below mapInPandas: batches arrive
    as raw Arrow RecordBatches and the 64-dim embedding column is viewed
    as a flat numpy array (one reshape, no per-row Python objects, no
    pandas conversion), so the vectorized norm runs at numpy speed on
    memory Spark already laid out columnar.  This is the right tier for
    numeric kernels over array columns (quantization, normalization,
    distance batches); mapInPandas pays a pandas Series materialization
    per column on top of this.

    Values match the JVM-fold twin (q_embed_norms' expression) to the
    1e-6 pin — numpy's pairwise summation and the sequential fold differ
    at ~1e-15 relative, absorbed by the rounding."""
    import numpy as np
    import pyarrow as pa

    em = t(spark, sf_dir, "embeddings")

    def arrow_norms(batches):
        for batch in batches:
            vec_id = batch.column("vec_id")
            label = batch.column("label")
            emb = batch.column("embedding")
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype("float64")
            mat = flat.reshape(len(batch), -1)
            norms = np.round(np.sqrt(np.sum(np.square(mat), axis=1)), 6)
            yield pa.RecordBatch.from_arrays(
                [vec_id, label, pa.array(norms, type=pa.float64())],
                names=["vec_id", "label", "l2_norm"],
            )

    return em.select("vec_id", "label", "embedding").mapInArrow(
        arrow_norms, "vec_id long, label int, l2_norm double"
    )
