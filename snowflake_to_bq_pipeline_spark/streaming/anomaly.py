"""Streaming volume-anomaly monitor — the continuous twin of the batch
anomaly agent (ref: anomaly_detection_agent.py's scheduled row-count
z-score checks; registry query ``volume_anomaly``).

The batch agent recomputes daily counts against history on a schedule; an
ingestion pipeline wants the same alarm AS WINDOWS CLOSE: watermarked
per-(window, event_type) counts score against a broadcast HISTORICAL
baseline (mean/std of window counts per type, trained batch-side from the
existing corpus), and windows whose |z| clears the threshold emit as
alert rows.

Scale: the stream side is the bounded-state windowed aggregation already
used by streaming/incremental.py; the baseline is O(event types) rows —
a broadcast stream-static join AFTER aggregation, so per-window scoring
adds no stream state at all. The baseline deliberately comes from a
BATCH profile (not the stream): self-referential baselines drift with
the anomaly they're supposed to catch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .incremental import WINDOW, windowed_counts_batch, windowed_counts_stream

Z_THRESHOLD = 2.0


def window_count_baseline(events: DataFrame) -> DataFrame:
    """Per-event-type mean/std of per-window counts from history.

    Exact integer sufficient statistics (n, Σc, Σc²) so the profile is
    engine-reproducible; std is the population form the batch anomaly
    query uses.
    """
    counts = windowed_counts_batch(events)
    stats = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("event_count").alias("__s"),
        F.sum(F.col("event_count") * F.col("event_count")).alias("__s2"),
    )
    n = F.col("__n").cast("double")
    mean = F.col("__s").cast("double") / n
    var = F.col("__s2").cast("double") / n - mean * mean
    return stats.select(
        "event_type",
        mean.alias("baseline_mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("baseline_std"),
    )


def score_windowed_counts(
    counts: DataFrame, baseline: DataFrame, z_threshold: float = Z_THRESHOLD
) -> DataFrame:
    """Attach z-scores + anomaly flags to windowed counts (works on the
    streaming aggregate and its batch twin identically — the pytest
    asserts drain-equality through this exact function).

    The baseline join is a LEFT join: an event type with NO history is the
    clearest volume anomaly there is (a brand-new high-volume stream), so
    its windows flag with a NULL z_score instead of silently dropping. A
    degenerate zero-std baseline likewise flags whenever the observed
    count deviates from the constant history at all (z is undefined —
    NULL — but the deviation is certain)."""
    z = F.when(
        F.col("baseline_std") > 0,
        (F.col("event_count").cast("double") - F.col("baseline_mean"))
        / F.col("baseline_std"),
    )
    unknown_type = F.col("baseline_mean").isNull()
    flat_baseline_break = (
        (F.col("baseline_std") == 0)
        & (F.col("event_count").cast("double") != F.col("baseline_mean"))
    )
    return (
        counts.join(F.broadcast(baseline), "event_type", "left")
        .withColumn("z_score", F.round(z, 6))
        .withColumn(
            "is_anomaly",
            F.when(unknown_type | flat_baseline_break, F.lit(True)).otherwise(
                F.coalesce(
                    F.abs(F.col("z_score")) > z_threshold, F.lit(False)
                )
            ),
        )
    )


def volume_anomaly_stream(
    events_stream: DataFrame,
    baseline: DataFrame,
    z_threshold: float = Z_THRESHOLD,
) -> DataFrame:
    """Watermarked windowed counts scored against the broadcast baseline."""
    return score_windowed_counts(
        windowed_counts_stream(events_stream), baseline, z_threshold
    )


def volume_anomaly_batch(
    events: DataFrame,
    baseline: DataFrame,
    z_threshold: float = Z_THRESHOLD,
) -> DataFrame:
    """Batch twin over the same window grain (drain-equality oracle)."""
    return score_windowed_counts(
        windowed_counts_batch(events), baseline, z_threshold
    )


# Re-exported so callers see one module for the monitor surface.
__all__ = [
    "WINDOW",
    "Z_THRESHOLD",
    "window_count_baseline",
    "score_windowed_counts",
    "volume_anomaly_stream",
    "volume_anomaly_batch",
]
