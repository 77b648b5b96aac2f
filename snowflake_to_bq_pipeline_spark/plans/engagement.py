"""User-engagement analytics: cohort retention and staged funnels.

The reference's dashboards slice synced event/work data into
utilization and trend views (work_item_individual_budget_time_tracking
view_v5's per-user tracking, KPI_Dashboard_Sync/main.py's rollups); the
same consumers invariably ask "do users come back?" (retention) and
"where do users drop off?" (funnel). Both are derived here from the raw
event stream in idiomatic Spark.

Scale posture:
- Retention is two hash aggregations on ``user_id`` (first-activity
  week, then distinct active weeks) and a cohort-keyed rollup; the only
  broadcast is the tiny per-cohort size table. No windows over raw data.
- The funnel is a chain of per-stage filtered aggregations joined on
  ``user_id`` — each stage's event-type filter is pushed to the scan,
  and each join key is the already-aggregated user set (shrinks every
  stage). The final conversion table is O(stages) rows; its window is
  explicitly tiny.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def retention_cohorts(events: DataFrame, max_week_offset: int = 12) -> DataFrame:
    """Weekly cohort retention matrix.

    Cohort = Monday-truncated week of a user's FIRST event; a cohort's
    week-``k`` retention is the fraction of its users with any event in
    cohort_week + k weeks. Offsets are exact integer (both week columns
    are Monday-truncated, so the day difference is a multiple of 7).
    """
    first = events.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    active = (
        events.select(
            "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("active_week")
        )
        .distinct()
        .join(first, "user_id")
        .select(
            "cohort_week",
            "user_id",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .filter(F.col("week_offset") <= max_week_offset)
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double"),
                6,
            ).alias("retention_rate"),
        )
    )


def funnel_conversion(
    events: DataFrame,
    stages: Sequence[str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered-funnel conversion counts.

    A user reaches stage ``k`` when they have a stage-``k`` event at or
    after their earliest qualifying stage-``k-1`` time (the classic
    min-timestamp chain — each stage joins the previous stage's user set
    and keeps ``MIN(ts)`` among events not earlier than the prior
    stage's time). Emits one row per stage with users reached and
    conversion vs the previous stage and vs stage 1.

    The per-stage window at the end orders O(len(stages)) rows — not a
    data-sized sort.
    """
    stage_counts: list[DataFrame] = []
    prev: DataFrame | None = None
    for idx, stage in enumerate(stages, start=1):
        matched = events.filter(F.col("event_type") == stage)
        if prev is None:
            cur = matched.groupBy("user_id").agg(F.min("ts").alias("__t"))
        else:
            cur = (
                matched.join(prev, "user_id")
                .filter(F.col("ts") >= F.col("__t"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("__t"))
            )
        stage_counts.append(
            cur.agg(
                F.lit(idx).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
        prev = cur.select("user_id", "__t")
    out = stage_counts[0]
    for s in stage_counts[1:]:
        out = out.unionByName(s)
    w = Window.orderBy("stage_idx")
    first_n = F.first("n_users").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_n = F.coalesce(F.lag("n_users").over(w), F.col("n_users"))
    return out.select(
        "stage_idx",
        "stage",
        "n_users",
        F.round(F.col("n_users").cast("double") / first_n.cast("double"), 6).alias(
            "conv_from_first"
        ),
        F.round(F.col("n_users").cast("double") / prev_n.cast("double"), 6).alias(
            "conv_from_prev"
        ),
    )
