"""Bucketed (co-located) tables — the pre-shuffle that removes join/agg
shuffles at read time.

At 100 TB the single biggest cost of a repeated fact-fact join is the
shuffle of the big table on the join key, every query.  Bucketing pays
that shuffle ONCE at write time: `bucketBy(n, key)` hash-partitions rows
into n stable buckets per table; a join of two tables bucketed on the
same key with the same n is planned as a zero-Exchange sort-merge join
(verified in tests/test_bucketing.py by asserting no shuffle Exchange in
the plan).

Hive parity: this is Hive's CLUSTERED BY (key) INTO n BUCKETS — the same
layout concept the reference's deployed engine exposes; Spark reads and
plans it natively through the session catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and optionally sorted) catalog table.
    Sorting within buckets additionally removes the sort from future
    sort-merge joins — scan-merge-join directly."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-key same-bucket-count tables: Catalyst recognizes the
    matching output partitioning and plans a shuffle-free join."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
