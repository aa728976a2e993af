"""Custom Python Data Source (Spark 4 DataSource API) — a deterministic
synthetic-events generator, registered like any format:

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("partitions", 8).option("rows_per_partition", 1000).load())

Why it exists: the reference's only source is CSV-over-S3; this shows the
engine's source surface is extensible in pure Python — the same API that
would wrap a REST feed, a message queue, or a proprietary store.  Each
partition generates independently on its executor (embarrassingly
parallel, no driver funnel), and generation is a pure function of
(partition_id, row_index) so any task retry or re-read produces identical
data — the property Spark requires of a source for correct recomputation.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
_EVENT_TYPES = ("click", "view", "purchase", "scroll")


class SyntheticEventsDataSource(DataSource):
    """format name: synthetic_events; options: partitions, rows_per_partition."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id long, user_id long, ts timestamp, "
            "event_type string, value double"
        )

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(
            n_partitions=int(self.options.get("partitions", 4)),
            rows_per_partition=int(self.options.get("rows_per_partition", 1000)),
        )

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(
            rows_per_batch=int(self.options.get("rows_per_batch", 500))
        )


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, n_partitions: int, rows_per_partition: int) -> None:
        self.n_partitions = n_partitions
        self.rows_per_partition = rows_per_partition

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition):
        pid = partition.value
        base = pid * self.rows_per_partition
        for i in range(self.rows_per_partition):
            event_id = base + i
            # splitmix64-style deterministic scramble of the event id —
            # pure function of the id, so retries regenerate identically
            z = (event_id + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            z ^= z >> 31
            yield (
                event_id,
                z % 1000,
                _EPOCH + timedelta(seconds=event_id * 7 + z % 7),
                _EVENT_TYPES[z % len(_EVENT_TYPES)],
                round(math.sin(event_id) * 50 + 50, 6),
            )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader: the offset is just the next
    event_id, each micro-batch emits `rows_per_batch` consecutive ids,
    and `readBetweenOffsets` regenerates any range on replay — the
    exactly-once contract (offsets + deterministic regeneration) that a
    Kafka-like source provides, in ~20 lines of Python."""

    def __init__(self, rows_per_batch: int) -> None:
        self.rows_per_batch = rows_per_batch

    def initialOffset(self) -> dict:
        return {"next_id": 0}

    def _gen(self, start_id: int, end_id: int):
        for event_id in range(start_id, end_id):
            z = (event_id + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            z ^= z >> 31
            yield (
                event_id,
                z % 1000,
                _EPOCH + timedelta(seconds=event_id * 7 + z % 7),
                _EVENT_TYPES[z % len(_EVENT_TYPES)],
                round(math.sin(event_id) * 50 + 50, 6),
            )

    def read(self, start: dict):
        # concrete list, not a generator: the returned rows are pickled
        # into the micro-batch plan (a generator cannot be serialized)
        end = {"next_id": start["next_id"] + self.rows_per_batch}
        return list(self._gen(start["next_id"], end["next_id"])), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._gen(start["next_id"], end["next_id"]))
