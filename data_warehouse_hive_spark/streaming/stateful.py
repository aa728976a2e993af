"""Custom stateful streaming operator — SURVEY.md §2.10 extension.

`F.session_window` (stream.py) covers gap-sessionization when the
built-in mergeable-window state machine is enough.  This module is the
escape hatch for semantics the built-ins can't express: an arbitrary
per-key state machine via ``applyInPandasWithState`` (Arrow-batched
pandas in/out, explicit state object, event-time timeouts).

The operator here is a per-user activity tracker that maintains a
running (count, value-sum, last-seen) state and EMITS a row only when
the user goes quiet for `gap` — i.e. output is driven by timeout, not by
input, which no built-in aggregation can do.  The same skeleton carries
any custom sketch: CUSUM drift detectors, HyperLogLog unions,
decaying counters.

At scale: state lives in the executor state store partitioned by the
grouping key, so memory is O(active keys / executor); the event-time
timeout (driven by the watermark) is what guarantees quiet keys are
flushed and their state dropped — without it, state grows unboundedly.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events BIGINT, sum_value DOUBLE, last_seen_ms BIGINT"

FLUSH_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_seen_ms", T.LongType()),
    ]
)

GAP_MS = 30 * 60 * 1000  # flush a user after 30 min of silence


def _track_user(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into running state;
    emit (and clear) only when the event-time timeout fires."""
    (user_id,) = key
    if state.hasTimedOut:
        n, s, last = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [s],
                "last_seen_ms": [last],
            }
        )
        return

    n, s, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].sum())
        last = max(last, int(pdf["ts"].astype("int64").max() // 1_000_000))
    state.update((n, s, last))
    # flush when the watermark passes last_seen + gap
    state.setTimeoutTimestamp(last + GAP_MS)
    return
    yield  # pragma: no cover — makes this a generator even on the no-emit path


def user_activity_sessions(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """events stream → one row per (user, quiet period): total events,
    value sum, last-seen — emitted when the user has been inactive past
    GAP_MS as observed through the event-time watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_user,
            outputStructType=FLUSH_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 arbitrary-state API
# ---------------------------------------------------------------------------

TWS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


def tws_runtime_available() -> bool:
    """transformWithStateInPandas ships its state protocol over protobuf;
    the PySpark API is always importable but the streaming worker dies at
    init without the `protobuf` package.  Gate runtime use (and the
    end-to-end test) on this instead of crashing mid-query."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class _RunningTotals(StatefulProcessor):
    """Per-key running (count, sum) via the transformWithStateInPandas
    StatefulProcessor contract: typed ValueState survives micro-batches
    in the RocksDB state store; every batch emits the key's refreshed
    totals (update-mode change feed)."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", "n BIGINT, s DOUBLE")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
        self._totals.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    def close(self) -> None:
        pass


def user_running_totals(events: DataFrame) -> DataFrame:
    """events stream → per-user cumulative (n_events, sum_value) emitted
    each micro-batch the user appears in — the transformWithStateInPandas
    twin of user_activity_sessions, on the newer API: explicit typed
    state handles (Value/List/Map), timers, and RocksDB-backed state
    instead of one opaque state tuple.

    At scale the state store shards by the grouping key exactly as with
    applyInPandasWithState; RocksDB keeps per-executor state on local
    disk with changelog checkpointing to the checkpoint location, so
    state size is bounded by disk, not heap.
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
