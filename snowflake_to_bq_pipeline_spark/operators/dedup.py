"""Record-level deduplication operators.

Reference parity:
- ``latest_record``: work_item_details_latest_view.sql:58-62 (keep only the
  newest snapshot per business key).
- ``dedup_by_business_key``: the v5 view's IndividualBudgetSummary CTE
  (work_item_individual_budget_time_tracking_view_v5.sql:56-104) — identical
  business rows synced on different dates collapse to the newest sync.

Scale: each is a single window over one hash-partition shuffle on the key
columns — no global sort, no driver collection. At 100 TB the shuffle is
keyed by the dedup key; pre-bucketing the table on that key removes the
shuffle entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_record(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Keep only the newest row per key.

    ``row_number`` over (key → order desc, tiebreaks desc) rather than the
    reference's correlated MAX subquery: one shuffle instead of two scans,
    and deterministic under ties.
    """
    ordering = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_by_business_key(
    df: DataFrame,
    business_cols: Sequence[str],
    sync_order_col: str,
) -> DataFrame:
    """Collapse rows identical on ``business_cols`` to the newest sync.

    Unlike ``dropDuplicates`` this is deterministic about WHICH duplicate
    survives (the one with max ``sync_order_col``), matching the reference's
    ``ROW_NUMBER() ... ORDER BY sync_reporting_date DESC`` semantics.
    """
    w = Window.partitionBy(*business_cols).orderBy(F.col(sync_order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
