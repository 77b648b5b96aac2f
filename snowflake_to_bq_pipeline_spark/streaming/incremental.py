"""Structured-Streaming incremental sync — the streaming twin of the
reference's scheduled daily syncs (*_sync_daily/main.py): instead of a
Cloud Scheduler cron re-extracting a trailing window, a file-source stream
ingests new files continuously with watermarked, windowed aggregation.

The windowed-count aggregation here is the streaming version of the
registry's ``events_windowed_counts`` batch query — same grouping, same
output schema, verified equal in tests via the availableNow trigger.

Scale: file-source streaming scales by partitioning arriving files across
executors; state for the windowed agg is bounded by the watermark (late
data beyond it is dropped), so checkpoint size is O(open windows), not
O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

WINDOW = "5 minutes"
WATERMARK = "10 minutes"


def read_events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream over events parquet files, ``ts`` → µs TIMESTAMP.

    Streaming file sources need an explicit schema, but how ``ts`` is
    physically stored varies by generation (raw TIMESTAMP(NANOS) read as
    long under the legacy conf, or timestamp[us] read as TIMESTAMP_NTZ),
    so we probe the on-disk schema with a batch read (metadata only — no
    data scan) and normalize to TIMESTAMP_LTZ exactly like
    ``catalog.load_table``.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(source_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_counts_stream(events: DataFrame) -> DataFrame:
    """Watermarked tumbling-window counts per event type."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW), "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "event_count",
        )
    )


def windowed_counts_batch(events: DataFrame) -> DataFrame:
    """Batch twin of ``windowed_counts_stream`` (oracle-checkable)."""
    return (
        events.groupBy(F.window("ts", WINDOW), "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "event_count",
        )
    )


def run_incremental_sync(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain all currently-available files into a parquet target, exactly
    once per file (checkpointed), then stop — the streaming equivalent of
    one daily-sync invocation."""
    out = windowed_counts_stream(read_events_stream(spark, source_dir))
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def event_lateness_profile(events: DataFrame) -> DataFrame:
    """Observed out-of-orderness per event type — the watermark advisor.

    A watermark is a bet on how late data arrives; this measures it on
    the actual stream history: per user (arrival order = event_id), a
    row's lateness is the running-max event time minus its own event
    time. The per-type profile (p50/p95/p99/max seconds, plus ceil(p99)
    as the suggested watermark) turns "pick a watermark" into a query.

    Scale: one window partitioned by user (the same shuffle the
    sessionization ops use), then a per-type aggregate. Lateness is
    exact integer microseconds; only the interpolated percentiles are
    float.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late_s = (
        F.unix_micros(F.max("ts").over(w)) - F.unix_micros(F.col("ts"))
    ).cast("double") / F.lit(1000000.0)
    return (
        events.select("event_type", late_s.alias("__late"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.percentile(F.col("__late"), F.lit(0.5)), 6).alias(
                "late_p50_s"
            ),
            F.round(F.percentile(F.col("__late"), F.lit(0.95)), 6).alias(
                "late_p95_s"
            ),
            F.round(F.percentile(F.col("__late"), F.lit(0.99)), 6).alias(
                "late_p99_s"
            ),
            F.round(F.max("__late"), 6).alias("late_max_s"),
            F.ceil(F.percentile(F.col("__late"), F.lit(0.99)))
            .cast("bigint")
            .alias("suggested_watermark_s"),
        )
    )
