"""Volume-anomaly detection (ref: anomaly_detection_agent.py — flags days
whose sync volume deviates from recent history).

The z-score is derived from exact integer sums (n, Σx, Σx²) so the float
arithmetic is a fixed expression over identical inputs on any engine —
no Welford-vs-naive stddev drift between Spark and the DuckDB oracle.

Scale: the anomaly scan aggregates the raw table once (partial
aggregation); the stats join is a 1-row broadcast. The daily-count series
is tiny at any data scale, so the final pass is negligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def volume_anomaly(
    df: DataFrame,
    ts_col: str,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-day event counts flagged when |z| exceeds the threshold."""
    daily = df.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.count(F.lit(1)).alias("event_count")
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("event_count").alias("__s"),
        F.sum(F.col("event_count") * F.col("event_count")).alias("__ss"),
    )
    n = F.col("__n").cast("double")
    mean = F.col("__s").cast("double") / n
    msq = F.col("__ss").cast("double") / n
    # Sample variance from exact sums; max(0) guards tiny negative residue.
    var = F.greatest((msq - mean * mean) * (n / (n - F.lit(1.0))), F.lit(0.0))
    sd = F.sqrt(var)
    z = F.when(
        (F.col("__n") > 1) & (sd > 0),
        F.round((F.col("event_count").cast("double") - mean) / sd, 4),
    )
    return (
        daily.crossJoin(F.broadcast(stats))
        .select(
            "day",
            "event_count",
            F.round(mean, 4).alias("mean_count"),
            F.round(sd, 4).alias("stddev_count"),
            z.alias("z_score"),
            F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
        )
    )


def volume_anomaly_dow(
    df: DataFrame,
    ts_col: str,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Seasonality-aware volume anomaly: each day scores against the SAME
    WEEKDAY's history, not the global mean.

    The reference features sync_hour/sync_day_of_week per table before
    flagging (anomaly_detection_agent.py:109-110,223) — a Monday spike is
    only anomalous relative to other Mondays. Same exact-sums discipline as
    the global mode: per-dow (n, Σx, Σx²) from integer counts, fixed float
    expression on top.

    Scale: one partial aggregation over the raw table to the daily series,
    one 7-row stats aggregate broadcast back — identical shuffle profile to
    the global mode.

    ``dow`` is 0=Sunday..6=Saturday (Spark ``dayofweek``-1 == DuckDB
    ``dayofweek``).
    """
    daily = df.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.count(F.lit(1)).alias("event_count")
    )
    daily = daily.withColumn("dow", (F.dayofweek("day") - 1).cast("int"))
    stats = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("event_count").alias("__s"),
        F.sum(F.col("event_count") * F.col("event_count")).alias("__ss"),
    )
    n = F.col("__n").cast("double")
    mean = F.col("__s").cast("double") / n
    msq = F.col("__ss").cast("double") / n
    var = F.greatest((msq - mean * mean) * (n / (n - F.lit(1.0))), F.lit(0.0))
    sd = F.sqrt(var)
    z = F.when(
        (F.col("__n") > 1) & (sd > 0),
        F.round((F.col("event_count").cast("double") - mean) / sd, 4),
    )
    return daily.join(F.broadcast(stats), "dow").select(
        "day",
        "dow",
        "event_count",
        F.round(mean, 4).alias("mean_count"),
        F.round(sd, 4).alias("stddev_count"),
        z.alias("z_score"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    )
