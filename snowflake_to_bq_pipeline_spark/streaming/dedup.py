"""Streaming deduplication with bounded state.

The reference dedups in scheduled batch passes
(snowflake_bq_deduplication_sync.py keeps one row per duplicate key per
run); the streaming twin must make the same guarantee continuously
WITHOUT unbounded "keys seen forever" state. Two tiers:

- ``dedup_stream``: ``dropDuplicatesWithinWatermark`` on the business key
  — exactly-once per key for any duplicate arriving within the watermark
  horizon of the first occurrence, state evicted beyond it. This is the
  at-scale shape: state is O(keys per horizon), not O(all keys ever).
- Duplicates straddling a horizon (rare replays, backfills) are caught by
  the batch reconciliation passes the registry already provides
  (``dedup_exact`` / ``dup_key_audit``) — the same layered posture the
  reference uses (continuous sync + scheduled dedup sweep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEDUP_WATERMARK = "10 minutes"


def dedup_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = DEDUP_WATERMARK,
) -> DataFrame:
    """Drop duplicate keys arriving within the watermark horizon.

    ``events`` must be a streaming DataFrame with an event-time column.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
