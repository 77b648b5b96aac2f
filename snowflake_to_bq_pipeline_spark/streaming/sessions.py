"""Streaming sessionization with native session windows.

The batch ``event_sessions`` view (plans/dashboard.py:149) sessionizes
with a lag-gap island scan; on a stream that needs unbounded history.
Spark's ``session_window`` is the streaming-native answer: per-user
windows that extend while events keep arriving within the gap and close
when the watermark passes session end + gap — state is bounded by open
sessions, not history, exactly the property a 24/7 event pipeline needs
(the reference's monitoring agents re-scan BigQuery history on a cron;
see anomaly_detection_agent.py).

The same expression runs in batch (``session_stats_batch``) and the
pytest drains the stream with availableNow and checks the closed sessions
against the batch result — the merge/gap semantics are engine-defined
once, not duplicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Session gap (minutes) — matches the batch view's SESSION_GAP_MIN.
GAP_MIN = 30
WATERMARK = "2 hours"


def _session_agg(events: DataFrame) -> DataFrame:
    # Exact decimal sum → round → double: add-order-independent, so the
    # stream, the batch twin, and the DuckDB oracle all agree bit-for-bit.
    val = F.col("value").cast("decimal(18,6)")
    return (
        events.groupBy(
            F.session_window("ts", f"{GAP_MIN} minutes"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(val), 4).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def session_stats_stream(events: DataFrame) -> DataFrame:
    """Watermarked streaming session aggregation (append mode emits each
    session exactly once, when the watermark closes it)."""
    return _session_agg(events.withWatermark("ts", WATERMARK))


def session_stats_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the same session_window aggregation over the full
    table — what the stream converges to once every session closes."""
    return _session_agg(events)
