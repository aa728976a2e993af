"""Fixture-table access.

The driver materializes a TPC-H-ish star schema plus ``events`` /
``documents`` / ``embeddings`` as one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/`` (see TESTDATA.md / FIXTURES.md).
Every query callable receives ``(spark, sf_dir)`` and reads lazily from
here — scans stay declarative so Catalyst applies column pruning and
predicate pushdown into the parquet reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a lazy DataFrame.

    `events.ts` is nanosecond-precision in the parquet file, which Spark's
    reader rejects (PARQUET_TYPE_ILLEGAL) unless nanos are read as long
    (conf set in session.ensure_engine_conf); the raw nanos are truncated
    to microseconds here — the same truncation DuckDB applies when casting
    TIMESTAMP_NS → TIMESTAMP — so both engines see identical values.
    """
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # integer division — a double division would lose precision
            # (ns epoch values exceed 2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # Spark 4.1 reads the ns column natively as TIMESTAMP_NTZ
            # (nanosAsLong is ignored).  Normalize to the session-zoned
            # TIMESTAMP every query was written against — the session tz
            # is pinned to UTC (ensure_engine_conf), so the NTZ wall time
            # maps to the identical microsecond instant and NTZ-illegal
            # ops (cast to double, unix_timestamp) keep working.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)


def spread(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Repartition a narrow scan across the cluster IF its source
    parallelism is below the core count — else pass through untouched.

    Parquet splits cannot cut inside a row group, so a table written as
    one row group scans on ONE core no matter how many are free; any
    per-row compute layered on that scan (md5, regex, shingling)
    serializes with it.  When that's detected (source file count well
    below the core count — file count, not partition count, because
    `df.rdd.getNumPartitions()` costs ~0.1-0.8 s of driver-side plan
    conversion while `inputFiles()` is a cached listing), a round-robin
    repartition of the *pruned* columns costs one small shuffle and
    unlocks full-width execution.  On a real many-file layout (any
    at-scale writer produces ≥ one file per task) the condition is false
    and no shuffle is ever added.  Call AFTER selecting the needed
    columns so only those bytes shuffle.
    """
    want = spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) * 4 <= want:
        return df.repartition(want)
    return df
