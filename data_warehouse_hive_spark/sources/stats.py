"""Column-statistics profiling — the reference computes these client-side
in Polars on a 1000-row sample (backend/csv_processor.py:147-170, served
by backend/app.py:149-180); here it is ONE distributed aggregation pass
over the full table (or a bounded sample, mirroring the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def column_stats(df: DataFrame, sample_rows: int | None = None) -> dict[str, dict]:
    """Per-column profile: null_count, non_null_count, distinct_count, and
    for numeric columns min/max/mean/std — all in a single agg pass
    (one job, one shuffle-free partial/final aggregation).

    `sample_rows` bounds the scan like the reference's MAX_SAMPLE_SIZE
    (backend/config.py:26); None profiles the full table.
    """
    if sample_rows is not None:
        df = df.limit(sample_rows)
    aggs: list = []
    fields = df.schema.fields
    for f in fields:
        c = F.col(f.name)
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"{f.name}__nulls"))
        aggs.append(F.count(c).alias(f"{f.name}__non_null"))
        aggs.append(F.countDistinct(c).alias(f"{f.name}__distinct"))
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.min(c).alias(f"{f.name}__min"))
            aggs.append(F.max(c).alias(f"{f.name}__max"))
            aggs.append(F.avg(c).alias(f"{f.name}__mean"))
            aggs.append(F.stddev_samp(c).alias(f"{f.name}__std"))
    row = df.agg(*aggs).collect()[0].asDict()
    out: dict[str, dict] = {}
    for f in fields:
        stats = {
            "null_count": row[f"{f.name}__nulls"],
            "non_null_count": row[f"{f.name}__non_null"],
            "distinct_count": row[f"{f.name}__distinct"],
            "dtype": f.dataType.simpleString(),
        }
        if isinstance(f.dataType, _NUMERIC):
            stats.update(
                min=row[f"{f.name}__min"],
                max=row[f"{f.name}__max"],
                mean=row[f"{f.name}__mean"],
                std=row[f"{f.name}__std"],
            )
        out[f.name] = stats
    return out

