"""Resumable progressive backfill: a persisted chunk tracker + step runner.

The reference drives multi-day backfills through a BigQuery tracking table
(work_item_budget_vs_actual_pipeline/work_item_budget_vs_actual_sync_daily/
main_progressive.py:64 ``work_item_budget_vs_actual_sync_tracker``,
:31 ``get_progressive_date_range``): each scheduled invocation syncs one
date slice (delete + insert) and records what it covered, so a week of
invocations converges to full coverage and a failed day resumes where it
left off. This module is the Spark-native equivalent:

- the chunk plan comes from :func:`..operators.sync.chunked_backfill_plan`
  (one pass over the source, no per-day warehouse scans);
- the tracker is a tiny parquet state table (O(chunks) rows — for a 5-year
  backfill in 7-day chunks that is ~260 rows, driver-side by design);
- each step extracts exactly one chunk's date range and dynamically
  overwrites only that chunk's date partitions in the target, so a crashed
  or replayed step is idempotent (re-running a chunk rewrites the same
  partitions);
- state commits AFTER the data write, via the same write-temp-then-rename
  swap the merge sink uses — a crash between data and state replays one
  chunk, never skips one.

Resume property (pytest-verified): interrupt after any k steps, call
:func:`run_backfill` again, and the target equals the uninterrupted
full sync.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sync import chunked_backfill_plan

STATUS_PENDING = "PENDING"
STATUS_DONE = "DONE"

#: Partition column added to the target so each chunk's overwrite touches
#: only its own date partitions (the DELETE+INSERT pattern without DELETE).
SYNC_DATE_COL = "__sync_date"


def init_backfill_state(
    spark: SparkSession,
    source: DataFrame,
    date_col: str,
    state_path: str,
    chunk_days: int = 7,
) -> DataFrame:
    """Create (or load, if it already exists) the chunk tracker table.

    Existing state is NEVER recomputed — that is what makes a restarted
    backfill resume instead of starting over (ref main_progressive.py
    ``create_tracking_table_if_not_exists`` + tracker inserts).
    """
    if os.path.exists(state_path):
        return spark.read.parquet(state_path)
    state = (
        chunked_backfill_plan(source, date_col, chunk_days=chunk_days)
        .withColumn("status", F.lit(STATUS_PENDING))
        .withColumn("synced_in_step", F.lit(None).cast("long"))
    )
    _write_state_atomic(state, state_path)
    return spark.read.parquet(state_path)


def pending_chunks(spark: SparkSession, state_path: str) -> list:
    """Pending chunk rows, lowest chunk_id first (the resume cursor)."""
    return (
        spark.read.parquet(state_path)
        .filter(F.col("status") == STATUS_PENDING)
        .orderBy("chunk_id")
        .collect()
    )


def run_backfill_step(
    spark: SparkSession,
    source: DataFrame,
    date_col: str,
    target_path: str,
    state_path: str,
    step_no: int = 0,
) -> int | None:
    """Sync ONE pending chunk; return its chunk_id, or None when done.

    Mirrors one Cloud-Function invocation of the reference's progressive
    sync: pick the next uncovered date range, extract it, replace exactly
    that range in the target, record completion. The data write lands
    before the state commit, so the crash window replays (idempotent
    dynamic partition overwrite) rather than skips.
    """
    todo = pending_chunks(spark, state_path)
    if not todo:
        return None
    chunk = todo[0]
    d = F.to_date(F.col(date_col))
    rows = source.filter(
        (d >= F.lit(chunk.chunk_start)) & (d < F.lit(chunk.chunk_end))
    ).withColumn(SYNC_DATE_COL, d)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    rows.write.mode("overwrite").partitionBy(SYNC_DATE_COL).parquet(target_path)
    _mark_done(spark, state_path, int(chunk.chunk_id), step_no)
    return int(chunk.chunk_id)


def run_backfill(
    spark: SparkSession,
    source: DataFrame,
    date_col: str,
    target_path: str,
    state_path: str,
    chunk_days: int = 7,
    max_steps: int | None = None,
) -> list[int]:
    """Drive the backfill to completion (or ``max_steps``, to simulate the
    reference's one-chunk-per-scheduled-run cadence). Safe to call again
    after any interruption — completed chunks are never re-extracted."""
    init_backfill_state(spark, source, date_col, state_path, chunk_days)
    done: list[int] = []
    while max_steps is None or len(done) < max_steps:
        chunk_id = run_backfill_step(
            spark, source, date_col, target_path, state_path, step_no=len(done)
        )
        if chunk_id is None:
            break
        done.append(chunk_id)
    return done


def _mark_done(
    spark: SparkSession, state_path: str, chunk_id: int, step_no: int
) -> None:
    state = spark.read.parquet(state_path)
    updated = state.withColumn(
        "status",
        F.when(F.col("chunk_id") == chunk_id, F.lit(STATUS_DONE)).otherwise(
            F.col("status")
        ),
    ).withColumn(
        "synced_in_step",
        F.when(F.col("chunk_id") == chunk_id, F.lit(step_no).cast("long"))
        .otherwise(F.col("synced_in_step")),
    )
    _write_state_atomic(updated, state_path)


def _write_state_atomic(state: DataFrame, state_path: str) -> None:
    """Write the tracker via temp-dir + rename swap (crash-safe commit).

    The state table is O(chunks) — coalesce(1) keeps it a single small
    file; this is tracker metadata, not data, so driver-side smallness is
    the point, exactly like the reference's tracking table.
    """
    parent = os.path.dirname(os.path.abspath(state_path)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".backfill_state_", dir=parent)
    try:
        out = os.path.join(tmp, "data")
        state.coalesce(1).write.mode("overwrite").parquet(out)
        if os.path.exists(state_path):
            old = f"{state_path.rstrip('/')}.old.{uuid.uuid4().hex}"
            os.rename(state_path, old)
            os.rename(out, state_path)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(out, state_path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def backfill_progress(
    source: DataFrame, date_col: str, chunk_days: int = 7
) -> DataFrame:
    """Chunk-advance view: the plan plus cumulative coverage share.

    The monitoring face of the progressive sync (what fraction of the
    backfill is covered once chunks 0..k are done) — the reference reads
    this off its tracker table; here it is derived in the same pass that
    plans the chunks. Window over the tiny chunk table: one 1-partition
    sort, O(chunks) rows.
    """
    from pyspark.sql import Window

    plan = chunked_backfill_plan(source, date_col, chunk_days=chunk_days)
    w = Window.orderBy("chunk_id").rowsBetween(Window.unboundedPreceding, 0)
    total = Window.partitionBy()
    return plan.select(
        "chunk_id",
        "chunk_start",
        "chunk_end",
        "row_count",
        F.sum("row_count").over(w).cast("bigint").alias("rows_cum"),
        F.round(
            F.sum("row_count").over(w).cast("double")
            / F.sum("row_count").over(total).cast("double"),
            6,
        ).alias("coverage_frac"),
    )
