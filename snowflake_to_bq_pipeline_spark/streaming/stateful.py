"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the engine's extension point for operators Spark lacks
natively: per-key mutable state across micro-batches (running aggregates,
sessionization, CDC folding). Here: a running per-user activity tracker —
each micro-batch emits the updated lifetime count / value-sum / last-seen
per user, the streaming analog of the reference's cumulative dimension
refresh (user_dimension_sync_daily/main.py keeps a running per-user
snapshot current).

Scale: state is partitioned by user key across executors (RocksDB-backed
state store in production); each micro-batch touches only keys present in
the batch.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("event_count", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_seen_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_count", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_seen", TimestampType()),
    ]
)


def _update_user_state(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    count, vsum, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        count += len(pdf)
        vsum += float(pdf["value"].sum())
        if len(pdf):
            batch_max_us = int(pdf["ts"].astype("int64").max() // 1000)
            last_us = max(last_us, batch_max_us)
    state.update((count, vsum, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "event_count": [count],
            "value_sum": [vsum],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime totals maintained as streaming state.

    ``events`` must have (user_id, ts, value); emits one updated row per
    user per micro-batch.
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
