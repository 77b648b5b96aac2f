"""Watermarked stream-stream join: click→purchase attribution.

The reference correlates streams warehouse-side after landing (the
dashboard joins synced tables on keys + date windows); a streaming
pipeline wants the correlation as events arrive. Spark's stream-stream
inner join with watermarks on BOTH sides and an event-time range
predicate is the native form: each side buffers only the rows inside
the watermark horizon, so state is bounded by (rate × window), not
history.

The SAME join expression runs in batch (``attribution_batch``) and is
oracle-gated in the registry (`click_attribution`); the streaming test
drains with availableNow and checks emitted pairs against the batch
twin — join semantics are defined once.

Scale posture (batch form): an equi-join on ``user_id`` with the range
predicate applied inside the joined partition — one hash shuffle per
side, standard sort-merge join, no bin decomposition needed because the
key carries the locality (contrast operators/ranges.py, which handles
the KEYLESS interval case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Attribution lookback: a purchase is credited to clicks in the
#: preceding window.
LOOKBACK_MIN = 30
WATERMARK = "2 hours"


def _attribution_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    joined = p.join(
        c,
        (p["user_id"] == c["c_user"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (
            c["click_ts"]
            >= p["purchase_ts"] - F.expr(f"INTERVAL {LOOKBACK_MIN} MINUTES")
        ),
    )
    return joined.select(
        "user_id",
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias(
            "lag_micros"
        ),
        F.round(F.col("purchase_value").cast("decimal(18,6)"), 4)
        .cast("double")
        .alias("purchase_value"),
    )


def attribution_stream(events: DataFrame) -> DataFrame:
    """Streaming click→purchase attribution over one event stream split
    into two watermarked sides. Inner join ⇒ append mode; each side's
    buffered state is bounded by the watermark + lookback horizon."""
    clicks = events.filter(F.col("event_type") == "click").withWatermark(
        "ts", WATERMARK
    )
    purchases = events.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", WATERMARK
    )
    return _attribution_join(clicks, purchases)


def attribution_batch(events: DataFrame) -> DataFrame:
    """Batch twin — what the stream converges to once the watermark
    passes every event."""
    return _attribution_join(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
    )
