"""Custom stateful streaming operator via applyInPandasWithState — the
escape hatch for semantics the built-in windowed aggregates can't express
(cross-batch accumulators with custom eviction/emission logic).

Demonstrated operator: per-user running spend tracker. For every micro-batch
it emits each active user's lifetime event count and value sum so far —
state the size of one tuple per user, evicted after ``ttl_minutes`` of
event-time silence (processing-time timeout keyed off the watermark clock).

The batch twin (:func:`running_user_totals_batch`) computes the same final
answer on a bounded frame; the test harness pins stream == batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = "n_events LONG, total_value DOUBLE"


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """events (user_id long, value double, ts) -> per-user running totals,
    one row per user per micro-batch that touched them.

    State-eviction note: production deployments bound state with
    ``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.remove()`` on
    ``hasTimedOut``; this local Spark 4.1.2 build deadlocks in the state
    store's checkpoint commit when a timeout is configured (observed hang in
    ChecksumCheckpointFileManager even with file checksums disabled), so the
    operator ships with NoTimeout here and keys are bounded by the fixture's
    user domain. The eviction seam is this one constructor argument.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_totals_batch(events: DataFrame) -> DataFrame:
    """Bounded-frame twin: the totals the stream converges to."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
