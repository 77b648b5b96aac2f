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


#: Watermark for the day-grain multivariate windows (out-of-orderness in
#: the corpus is minutes-scale; a day window closes shortly after the
#: watermark passes its end).
MV_WATERMARK = "1 hour"

#: A new window flags when its distance reaches this multiple of the
#: training cutoff (1.0 = exactly the batch contamination boundary).
MV_CUTOFF_MARGIN = 1.0


def multivariate_model(
    events: DataFrame, contamination: float = 0.1
) -> DataFrame:
    """Batch-train the per-stream multivariate model the streaming scorer
    broadcasts: the exact-decimal sufficient statistics (mean + covariance
    in one O(streams)-row table) plus a flagging ``cutoff`` — the smallest
    training-day distance the batch operator flags at the given
    contamination, so the stream's decision boundary IS the batch
    operator's. Same train-batch-score-stream shape as
    ``window_count_baseline`` (self-referential streaming baselines drift
    with the anomaly they should catch)."""
    from ..operators.anomaly import (
        multivariate_anomaly,
        mv_daily_features,
        mv_suffstats,
    )

    feats = mv_daily_features(events)
    stats = mv_suffstats(feats)
    cuts = (
        multivariate_anomaly(events, contamination=contamination)
        .filter(F.col("is_anomaly"))
        .groupBy("event_type")
        .agg(F.min("mahalanobis").alias("cutoff"))
    )
    return stats.join(cuts, "event_type", "left")


def score_daily_features(feats: DataFrame, model: DataFrame) -> DataFrame:
    """Mahalanobis-score daily feature rows against the broadcast model and
    flag rows at/above the training cutoff. Works identically on the
    streaming day-window aggregate and its batch twin (drain-equality is
    pytest-asserted through this function). Feature rows for streams
    ABSENT from the model flag with a NULL distance — a brand-new stream
    is the clearest anomaly (same contract as the univariate monitor)."""
    from ..operators.anomaly import mv_score

    scored = mv_score(feats, model.drop("cutoff"), how="left").join(
        F.broadcast(model.select("event_type", "cutoff")), "event_type", "left"
    )
    unknown = F.col("__nd").isNull()
    flagged = (
        F.col("mahalanobis").isNotNull()
        & F.col("cutoff").isNotNull()
        & (F.col("mahalanobis") >= F.lit(MV_CUTOFF_MARGIN) * F.col("cutoff"))
    )
    return scored.withColumn(
        "is_anomaly", F.when(unknown, F.lit(True)).otherwise(flagged)
    ).drop("__nd", "cutoff")


def mv_window_features_stream(events_stream: DataFrame) -> DataFrame:
    """Watermarked day-window feature vectors — the streaming twin of
    ``operators.anomaly.mv_daily_features`` (identical output columns and
    rounding, so the scorer and its drain-equality test see one shape).
    State is bounded by open day windows per stream."""
    mic = F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast(
        "long"
    )
    agg = (
        events_stream.withWatermark("ts", MV_WATERMARK)
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(mic).alias("__vm"),
            F.sum(F.hour(F.col("ts")).cast("long")).alias("__hs"),
        )
    )
    ndub = F.col("event_count").cast("double")
    return agg.select(
        "event_type",
        F.to_date(F.col("window.start")).alias("day"),
        "event_count",
        F.round(F.col("__vm").cast("double") / ndub / F.lit(1000000.0), 6)
        .alias("avg_value"),
        F.round(F.col("__hs").cast("double") / ndub, 6).alias("avg_hour"),
    )


def multivariate_anomaly_stream(
    events_stream: DataFrame, model: DataFrame
) -> DataFrame:
    """Day windows scored against the broadcast batch-trained multivariate
    model as they close — the continuous twin of the registry's
    ``multivariate_anomaly`` (same features, same distance, same decision
    boundary via the trained cutoff)."""
    return score_daily_features(mv_window_features_stream(events_stream), model)


def multivariate_anomaly_batch(
    events: DataFrame, model: DataFrame
) -> DataFrame:
    """Batch twin over the same day grain (drain-equality oracle)."""
    from ..operators.anomaly import mv_daily_features

    return score_daily_features(mv_daily_features(events), model)


# Re-exported so callers see one module for the monitor surface.
__all__ = [
    "WINDOW",
    "Z_THRESHOLD",
    "MV_WATERMARK",
    "window_count_baseline",
    "score_windowed_counts",
    "volume_anomaly_stream",
    "volume_anomaly_batch",
    "multivariate_model",
    "score_daily_features",
    "mv_window_features_stream",
    "multivariate_anomaly_stream",
    "multivariate_anomaly_batch",
]
