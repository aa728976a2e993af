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
