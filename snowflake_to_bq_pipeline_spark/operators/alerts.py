"""Unified pipeline-alert dataset.

The reference's monitors don't stop at metrics — they fold anomalies,
staleness, duplicate keys, and count drift into alert payloads that get
delivered (pipeline_fallback_monitor.py main flow,
slack_integration_agent.py, dashboard email digests). Transport is out of
scope for a query engine; the alert DATASET is not. This operator folds
the four monitoring operators into one severity-ranked table — the thing
an on-call user actually consumes:

    (alert_source, entity, metric, observed, threshold, severity)

Scale: each component is itself a partial aggregation over its source
(daily counts, per-type watermarks, key-group counts, day-level compare);
the fold is a union of already-tiny violation sets — no extra scan over
the raw tables beyond what the components do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .anomaly import volume_anomaly
from .quality import dup_key_audit, freshness_check, row_count_compare

SEVERITY_CRITICAL = "CRITICAL"
SEVERITY_WARNING = "WARNING"


def pipeline_alerts(
    events: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    z_threshold: float = 2.0,
    z_critical: float = 3.0,
    stale_after_seconds: int = 1800,
    dup_key_cols: tuple[str, ...] = ("user_id", "event_type", "value"),
    drift_critical_frac: float = 0.5,
) -> DataFrame:
    """Violations from all four monitors, one row per alert.

    Severity: each monitor has a WARNING bound (its own flag) and a
    CRITICAL bound (z beyond ``z_critical``, lag beyond twice the stale
    window, more than one extra duplicate, drift beyond
    ``drift_critical_frac`` of the source count).
    """
    crit = F.lit(SEVERITY_CRITICAL)
    warn = F.lit(SEVERITY_WARNING)

    va = (
        volume_anomaly(events, "ts", z_threshold)
        .filter(F.col("is_anomaly"))
        .select(
            F.lit("volume").alias("alert_source"),
            F.col("day").cast("string").alias("entity"),
            F.lit("daily_volume_z").alias("metric"),
            F.abs(F.col("z_score")).alias("observed"),
            F.lit(float(z_threshold)).alias("threshold"),
            F.when(F.abs(F.col("z_score")) > z_critical, crit)
            .otherwise(warn)
            .alias("severity"),
        )
    )

    fr = (
        freshness_check(events, "ts", "event_type", stale_after_seconds)
        .filter(F.col("is_stale"))
        .select(
            F.lit("freshness").alias("alert_source"),
            F.col("event_type").alias("entity"),
            F.lit("watermark_lag_seconds").alias("metric"),
            F.col("lag_seconds").cast("double").alias("observed"),
            F.lit(float(stale_after_seconds)).alias("threshold"),
            F.when(F.col("lag_seconds") > 2 * stale_after_seconds, crit)
            .otherwise(warn)
            .alias("severity"),
        )
    )

    # Float key parts render as integer micros via floor(x*1e6 + 0.5) —
    # pure IEEE double ops, identical in every engine. Decimal FORMATTING
    # is not engine-independent: Java's %.6f rounds ties HALF_UP while C
    # printf rounds half-to-even, so values exactly representable with
    # ≤ 7 fractional binary digits (e.g. 1/128) format differently.
    dup_entity = F.concat_ws(
        "|",
        *[
            F.floor(F.col(c).cast("double") * 1e6 + F.lit(0.5))
            .cast("long")
            .cast("string")
            if dict(events.dtypes)[c] in ("double", "float")
            else F.col(c).cast("string")
            for c in dup_key_cols
        ],
    )
    dk = dup_key_audit(events, list(dup_key_cols)).select(
        F.lit("dedup").alias("alert_source"),
        dup_entity.alias("entity"),
        F.lit("duplicate_key_count").alias("metric"),
        F.col("dup_count").cast("double").alias("observed"),
        F.lit(1.0).alias("threshold"),
        F.when(F.col("dup_count") > 2, crit).otherwise(warn).alias("severity"),
    )

    rc = (
        row_count_compare(orders, lineitem, "o_orderdate", "l_shipdate")
        .filter(~F.col("counts_match"))
        .select(
            F.lit("reconciliation").alias("alert_source"),
            F.col("day").cast("string").alias("entity"),
            F.lit("day_count_drift").alias("metric"),
            F.abs(F.col("count_diff")).cast("double").alias("observed"),
            F.lit(0.0).alias("threshold"),
            F.when(
                F.abs(F.col("count_diff")).cast("double")
                > drift_critical_frac * F.col("source_count").cast("double"),
                crit,
            )
            .otherwise(warn)
            .alias("severity"),
        )
    )

    alerts = va.unionByName(fr).unionByName(dk).unionByName(rc)

    # The reference doesn't stop at alerting: freshness violations map to a
    # NAMED fallback sync per table and trigger it
    # (pipeline_fallback_monitor.py:459 freshness→fallback mapping, :203
    # trigger_fallback_function). Transport stays out of scope; the
    # remediation PLAN is part of the dataset — per alert, what to run and
    # against which pipeline.
    src = F.col("alert_source")
    is_crit = F.col("severity") == SEVERITY_CRITICAL
    action = (
        F.when(src == "freshness",
               F.when(is_crit, F.lit("trigger_fallback_sync"))
               .otherwise(F.lit("schedule_catchup_sync")))
        .when(src == "volume",
              F.when(is_crit, F.lit("trigger_full_resync"))
              .otherwise(F.lit("flag_for_review")))
        .when(src == "dedup", F.lit("run_dedup_cleanup"))
        .otherwise(  # reconciliation
            F.when(is_crit, F.lit("backfill_date_window"))
            .otherwise(F.lit("flag_for_review"))
        )
    )
    target = (
        F.when(src == "freshness",
               F.concat(F.col("entity"), F.lit("_fallback_daily_sync")))
        .when(src == "volume", F.lit("events_full_sync"))
        .when(src == "dedup", F.lit("dedup_reconciliation_sync"))
        .otherwise(F.lit("daily_incremental_sync"))
    )
    return alerts.select(
        "*",
        action.alias("recommended_action"),
        target.alias("target_pipeline"),
    )


def alert_digest(
    events: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    **alert_kwargs,
) -> DataFrame:
    """Severity-rolled digest built from the raw tables — convenience
    wrapper over :func:`alert_digest_from` for standalone use.

    The alert dataset is persisted here for the digest's three consumers
    (summary, worst-offender, top-action) — without it the four-monitor
    build executes once per consumer (operators/_cache.py). Callers that
    already hold the dataset (the registry shares one fingerprint-memoized
    build across ``pipeline_alerts`` AND ``alert_digest``) should call
    :func:`alert_digest_from` directly.
    """
    from ._cache import swap_cache

    return alert_digest_from(
        swap_cache(
            "alert_digest_alerts",
            pipeline_alerts(events, orders, lineitem, **alert_kwargs),
        )
    )


def alert_digest_from(alerts: DataFrame) -> DataFrame:
    """Severity-rolled digest of a pre-built alert dataset — the engine
    form of the reference's report ASSEMBLY step
    (pipeline_fallback_monitor.py:247 and data_quality_agent.py:244 build
    severity-ranked HTML/e-mail digests from the raw monitor outputs;
    transport stays out of scope).

    One row per alert_source (the digest's sections): alert counts by
    severity, distinct offending entities, the worst offender (CRITICAL
    first, then highest observed value, entity as the deterministic
    tie-break), and the dominant recommended action (most frequent, ties
    lexicographic). Consumes the ``pipeline_alerts`` schema unchanged.

    Scale: the alert dataset is violation-sized (tiny at any corpus
    scale); rollup windows partition by alert_source over those rows.
    ``alerts`` should be persisted by the caller — the digest reads it
    three times (summary, worst-offender, top-action).
    """
    from pyspark.sql import Window

    is_crit = F.col("severity") == SEVERITY_CRITICAL
    summary = alerts.groupBy("alert_source").agg(
        F.count(F.lit(1)).alias("alerts_total"),
        F.count(F.when(is_crit, F.lit(1))).alias("critical_count"),
        F.count(F.when(~is_crit, F.lit(1))).alias("warning_count"),
        F.countDistinct("entity").alias("distinct_entities"),
    )
    sev_rank = F.when(is_crit, F.lit(0)).otherwise(F.lit(1))
    worst_w = Window.partitionBy("alert_source").orderBy(
        sev_rank, F.col("observed").desc(), F.col("entity")
    )
    worst = (
        alerts.withColumn("__rn", F.row_number().over(worst_w))
        .filter(F.col("__rn") == 1)
        .select(
            "alert_source",
            F.col("entity").alias("worst_entity"),
            F.col("observed").alias("worst_observed"),
            F.col("severity").alias("worst_severity"),
        )
    )
    act_w = Window.partitionBy("alert_source").orderBy(
        F.col("__n").desc(), F.col("recommended_action")
    )
    top_action = (
        alerts.groupBy("alert_source", "recommended_action")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__rn", F.row_number().over(act_w))
        .filter(F.col("__rn") == 1)
        .select(
            "alert_source",
            F.col("recommended_action").alias("top_action"),
        )
    )
    return summary.join(worst, "alert_source").join(
        top_action, "alert_source"
    )
