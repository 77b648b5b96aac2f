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


#: Exact-sum accumulator for the multivariate sufficient statistics:
#: features are integers or 6dp-rounded doubles, so pairwise products have
#: at most 12 fractional decimal digits and the cast is lossless — the sums
#: are add-order-independent on any partitioning.
MV_DEC = "decimal(38,12)"


def multivariate_anomaly(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    contamination: float = 0.1,
) -> DataFrame:
    """Joint multivariate outlier score per (stream, day) — the engine form
    of the reference's per-table multivariate anomaly models
    (anomaly_detection_agent.py:124-156 train_models/detect_anomalies:
    IsolationForest over scaled daily feature vectors, contamination=0.1).

    A forest is neither deterministic nor SQL-expressible; the engine uses
    the classical closed-form equivalent: per stream, each day's feature
    vector x = (event volume, mean value, mean hour-of-day) scores its
    Mahalanobis distance against the stream's own history — the full 3x3
    covariance (not just per-feature z-scores), so a day that is
    individually unremarkable on every axis but breaks the CORRELATION
    structure (e.g. high volume with low mean value where the two always
    move together) still scores high. The top ``contamination`` fraction
    of days per stream is flagged, mirroring the reference's contamination
    parameter.

    Determinism: daily features derive from exact integer sums (counts,
    value micros, hour sums) rounded once; the covariance's sufficient
    statistics accumulate in exact decimal (MV_DEC); the distance is one
    fixed double expression over those — engine-reproducible, and the
    DuckDB oracle mirrors it textually. Covariance inversion is the 3x3
    adjugate over a single division; near-singular covariance (|det| under
    1e-9) yields NULL distances and no flags rather than garbage.

    Scale: one partial aggregation of the raw table to (stream, day)
    features; stats are O(streams) rows broadcast back; ranking windows
    partition by stream over day-grain rows (bounded: days per stream,
    never data-sized).
    """
    from pyspark.sql import Window

    feats = mv_daily_features(df, ts_col, type_col, value_col)
    stats = mv_suffstats(feats)
    scored = mv_score(feats, stats)
    w = Window.partitionBy("event_type").orderBy(
        F.col("mahalanobis").desc_nulls_last(), F.col("day")
    )
    limit = F.greatest(
        F.lit(1).cast("long"),
        F.floor(F.lit(contamination) * F.col("__nd").cast("double")),
    )
    return (
        scored.withColumn("md_rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "is_anomaly",
            F.col("mahalanobis").isNotNull() & (F.col("md_rank") <= limit),
        )
        .drop("__nd")
    )


def mv_daily_features(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(event_type, day) feature vectors from exact integer sums: volume,
    6dp mean value (via micros), 6dp mean hour-of-day."""
    mic = F.floor(F.col(value_col) * F.lit(1000000.0) + F.lit(0.5)).cast(
        "long"
    )
    daily = df.groupBy(
        F.col(type_col).alias("event_type"),
        F.to_date(F.col(ts_col)).alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("event_count"),
        F.sum(mic).alias("__vm"),
        F.sum(F.hour(F.col(ts_col)).cast("long")).alias("__hs"),
    )
    ndub = F.col("event_count").cast("double")
    return daily.select(
        "event_type",
        "day",
        "event_count",
        F.round(F.col("__vm").cast("double") / ndub / F.lit(1000000.0), 6)
        .alias("avg_value"),
        F.round(F.col("__hs").cast("double") / ndub, 6).alias("avg_hour"),
    )


def mv_suffstats(feats: DataFrame) -> DataFrame:
    """Per-stream exact-decimal sufficient statistics of the daily feature
    vectors — the O(streams)-row trained model state the scorer broadcasts
    (the streaming twin reuses it as its batch-trained baseline)."""
    x1 = F.col("event_count").cast("double")
    x2 = F.col("avg_value")
    x3 = F.col("avg_hour")
    return feats.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__nd"),
        F.sum(x1.cast(MV_DEC)).alias("__s1"),
        F.sum(x2.cast(MV_DEC)).alias("__s2"),
        F.sum(x3.cast(MV_DEC)).alias("__s3"),
        F.sum((x1 * x1).cast(MV_DEC)).alias("__s11"),
        F.sum((x1 * x2).cast(MV_DEC)).alias("__s12"),
        F.sum((x1 * x3).cast(MV_DEC)).alias("__s13"),
        F.sum((x2 * x2).cast(MV_DEC)).alias("__s22"),
        F.sum((x2 * x3).cast(MV_DEC)).alias("__s23"),
        F.sum((x3 * x3).cast(MV_DEC)).alias("__s33"),
    )


def mv_score(
    feats: DataFrame, stats: DataFrame, how: str = "inner"
) -> DataFrame:
    """Mahalanobis distance of each feature row against its stream's model
    (broadcast join; 3x3 adjugate inverse, one division). Keeps ``__nd``
    for downstream contamination limits (NULL when ``how='left'`` and the
    stream has no model — the streaming monitor flags those). Works
    identically on batch day-grain features and the streaming aggregate's
    closing windows — drain-equality is asserted through this exact
    function."""
    nd = F.col("__nd").cast("double")
    m1 = F.col("__s1").cast("double") / nd
    m2 = F.col("__s2").cast("double") / nd
    m3 = F.col("__s3").cast("double") / nd
    c11 = F.col("__s11").cast("double") / nd - m1 * m1
    c12 = F.col("__s12").cast("double") / nd - m1 * m2
    c13 = F.col("__s13").cast("double") / nd - m1 * m3
    c22 = F.col("__s22").cast("double") / nd - m2 * m2
    c23 = F.col("__s23").cast("double") / nd - m2 * m3
    c33 = F.col("__s33").cast("double") / nd - m3 * m3
    det = (
        c11 * (c22 * c33 - c23 * c23)
        - c12 * (c12 * c33 - c13 * c23)
        + c13 * (c12 * c23 - c13 * c22)
    )
    x1 = F.col("event_count").cast("double")
    x2 = F.col("avg_value")
    x3 = F.col("avg_hour")
    d1 = x1 - m1
    d2 = x2 - m2
    d3 = x3 - m3
    quad = (
        d1 * d1 * (c22 * c33 - c23 * c23)
        + d2 * d2 * (c11 * c33 - c13 * c13)
        + d3 * d3 * (c11 * c22 - c12 * c12)
        + F.lit(2.0) * d1 * d2 * (c13 * c23 - c12 * c33)
        + F.lit(2.0) * d1 * d3 * (c12 * c23 - c13 * c22)
        + F.lit(2.0) * d2 * d3 * (c12 * c13 - c11 * c23)
    ) / det
    md2 = F.when((F.col("__nd") > 3) & (F.abs(det) > 1e-9), quad)
    passthrough = [c for c in feats.columns if c != "event_type"]
    return feats.join(F.broadcast(stats), "event_type", how).select(
        "event_type",
        *passthrough,
        # greatest() skips nulls in both engines, so gate the NULL case
        # explicitly: singular covariance means NO distance, not 0.
        F.when(
            md2.isNotNull(),
            F.round(F.sqrt(F.greatest(md2, F.lit(0.0))), 6),
        ).alias("mahalanobis"),
        F.col("__nd").alias("__nd"),
    )
