"""Structured Streaming: drive the real streaming engine (micro-batch
planner, state store, watermark) over bounded parquet input with
Trigger.AvailableNow, and check the streamed result equals the batch twin."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from data_warehouse_hive_spark.streaming.stream import (
    read_events_stream,
    run_available_now,
    sessionized,
    windowed_counts,
)
from data_warehouse_hive_spark.tables import t, table_path


def test_windowed_counts_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, table_path(sf_dir, "events"))
    assert stream.isStreaming
    sink = f"win_{uuid.uuid4().hex[:8]}"
    q = run_available_now(windowed_counts(stream), sink)
    try:
        streamed = spark.table(sink).toPandas()
        batch = (
            t(spark, sf_dir, "events")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
            .toPandas()
        )
        key = ["window_start", "event_type"]
        s = streamed.sort_values(key).reset_index(drop=True)
        b = batch.sort_values(key).reset_index(drop=True)
        assert len(s) == len(b) > 0
        assert (s["n_events"].values == b["n_events"].values).all()
        assert (s["sum_value"].values == b["sum_value"].values).all()
    finally:
        q.stop()


def test_session_windows_stream(spark, sf_dir):
    stream = read_events_stream(spark, table_path(sf_dir, "events"))
    sink = f"sess_{uuid.uuid4().hex[:8]}"
    q = run_available_now(sessionized(stream), sink)
    try:
        out = spark.table(sink)
        n = out.count()
        assert n > 0
        # session invariant: end >= start, and per-user event totals match
        bad = out.filter(F.col("session_end") < F.col("session_start")).count()
        assert bad == 0
        total_events = out.agg(F.sum("n_events")).collect()[0][0]
        assert total_events == t(spark, sf_dir, "events").count()
    finally:
        q.stop()
