"""Sync / reconciliation operators: the reference's pipeline core.

Reference parity:
- ``full_sync``: */_sync_full/main.py — full extract with schema
  normalization (auto schema detection → here: explicit cast/rename map).
- ``incremental_window``: */_sync_daily/main.py — trailing-N-day window
  off the source watermark (daily delete+insert pattern).
- ``merge_upsert``: the daily sync's delete-then-insert expressed as a
  proper MERGE: updates override base rows on key, new keys append.
- ``orphaned_records`` / ``missing_records``:
  snowflake_bq_deduplication_sync.py:266-292 — set difference of keys
  between source and target, expressed as anti-joins (distributed; the
  reference collected both key sets to the driver, which cannot work at
  100 TB).

Scale: anti-joins and merges shuffle on the key once; AQE converts to
broadcast when one side is small. No ``collect()`` anywhere.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def full_sync(df: DataFrame, schema_map: Mapping[str, str] | None = None) -> DataFrame:
    """Full-extract snapshot with optional column→type normalization.

    ``schema_map`` maps column name → target Spark SQL type string,
    standing in for the reference's Snowflake→BigQuery auto schema
    detection. Unlisted columns pass through.
    """
    if not schema_map:
        return df
    cols = [
        F.col(c).cast(schema_map[c]).alias(c) if c in schema_map else F.col(c)
        for c in df.columns
    ]
    return df.select(*cols)


def incremental_window(
    df: DataFrame,
    watermark_col: str,
    days_back: int,
) -> DataFrame:
    """Rows within ``days_back`` days of the table's max watermark.

    The cutoff is computed with a scalar aggregate joined in (cross join of
    a 1-row aggregate — broadcast, free), not collected to the driver, so
    the same plan works on a cluster.
    """
    cutoff = df.agg(
        F.timestamp_add(
            "DAY", F.lit(-days_back), F.max(watermark_col)
        ).alias("__cutoff")
    )
    return (
        df.crossJoin(F.broadcast(cutoff))
        .filter(F.col(watermark_col) >= F.col("__cutoff"))
        .drop("__cutoff")
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """MERGE: rows from ``updates`` win on key collision, others kept.

    base ANTI JOIN updates (drop stale rows) UNION ALL updates. One shuffle
    on the key for the anti-join; the union is free. This is the
    distributed equivalent of the reference's per-day DELETE + INSERT.
    ``updates`` must already be unique per key (apply dedup first if not).
    """
    kept = base.join(updates.select(*key_cols), on=list(key_cols), how="left_anti")
    return kept.unionByName(updates.select(*base.columns))


def orphaned_records(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Target rows whose key no longer exists in source (to be deleted)."""
    return target.join(
        source.select(*key_cols).dropDuplicates(), on=list(key_cols), how="left_anti"
    )


def missing_records(
    source: DataFrame,
    target: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Source rows whose key is absent from target (to be synced)."""
    return source.join(
        target.select(*key_cols).dropDuplicates(), on=list(key_cols), how="left_anti"
    )


def paginated_extract(
    df: DataFrame,
    order_cols: Sequence[str],
    page: int,
    page_size: int,
) -> DataFrame:
    """One deterministic page of a keyed extract.

    The reference paginates Snowflake extracts with LIMIT/OFFSET loops
    (snowflake_bq_sync_daily Time Details/main_paginated.py:246). The
    distributed equivalent is a row_number window over a total order —
    OFFSET in a warehouse re-scans everything before the page, while this
    plan computes every page boundary in one pass. For repeated
    whole-table paging, prefer range predicates on the key (keyset
    pagination) so each page is a pruned scan.
    """
    from pyspark.sql import Window

    w = Window.orderBy(*[F.col(c) for c in order_cols])
    lo, hi = page * page_size, (page + 1) * page_size
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > lo) & (F.col("__rn") <= hi))
        .drop("__rn")
    )


def chunked_backfill_plan(
    df: DataFrame,
    date_col: str,
    chunk_days: int = 7,
) -> DataFrame:
    """Plan a chunked backfill: date-range chunks with row counts.

    The reference drives multi-day backfills through a BigQuery state
    table handing out 7-day chunks one Cloud Function invocation at a
    time (work_item_budget_vs_actual_sync_daily/main_progressive.py,
    get_next_date_chunk). Spark plans the whole backfill in one pass:
    bucket every row into its chunk, emit (chunk_id, start, end, count) —
    the orchestration table the progressive sync maintained by hand.
    """
    bounds = df.agg(F.to_date(F.min(date_col)).alias("__min_d"))
    # Pure date arithmetic: timezone-free (the column may be NTZ) and floor
    # is explicit because engines disagree on double→int cast rounding.
    with_chunk = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__chunk",
        F.floor(
            F.datediff(F.to_date(F.col(date_col)), F.col("__min_d"))
            / F.lit(float(chunk_days))
        ),
    )
    return (
        with_chunk.groupBy("__chunk")
        .agg(
            F.min("__min_d").alias("__min_d"),
            F.count(F.lit(1)).alias("row_count"),
        )
        .select(
            F.col("__chunk").alias("chunk_id"),
            F.date_add(
                F.col("__min_d"), (F.col("__chunk") * chunk_days).cast("int")
            ).alias("chunk_start"),
            F.date_add(
                F.col("__min_d"),
                ((F.col("__chunk") + 1) * chunk_days).cast("int"),
            ).alias("chunk_end"),
            "row_count",
        )
    )


def merge_partial_aggs(
    old: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_cols: Sequence[str],
) -> DataFrame:
    """Combine two partial-aggregate tables (incremental view maintenance).

    Sums and counts are algebraic: agg(base ∪ delta) = agg(base) ⊎
    agg(delta) merged per key. A daily increment then costs O(delta +
    |aggregate|), never a re-scan of history — the scalable replacement
    for the reference's recompute-the-view-daily pattern. Correctness is
    oracle-checked against direct full recomputation.
    """
    merged = old.join(delta, list(key_cols), "full_outer")
    out_cols = [F.col(c) for c in key_cols]
    for c in [*sum_cols, *count_cols]:
        lc, rc = old[c], delta[c]
        out_cols.append(
            (F.coalesce(lc, F.lit(0)) + F.coalesce(rc, F.lit(0))).alias(c)
        )
    return merged.select(*out_cols)


class TransientPageError(RuntimeError):
    """A page attempt failed in a retryable way (timeout/churn)."""


def paginated_extract_resilient(
    df: DataFrame,
    order_cols: Sequence[str],
    page_size: int,
    run_page,
    min_page_size: int = 1,
    shrink: int = 2,
) -> list[tuple[int, int, int]]:
    """Drive a whole paged extract with deterministic page-size degradation.

    The reference's paginated daily sync survives warehouse timeouts by
    hand-picking ever-smaller batch sizes per pipeline
    (snowflake_bq_sync_daily Time Details/main_paginated.py:235 "Increased
    batch size since we're processing smaller date ranges", main.py:133
    "Use a smaller batch size if memory is still a concern") — the ladder
    is a human redeploy loop. Here it is mechanical: each page slice is
    handed to ``run_page(page_df, offset, size)``; on
    :class:`TransientPageError` the SAME offset retries with the size
    divided by ``shrink``, down to ``min_page_size``, then the error
    propagates (non-transient failure). Successful pages advance the
    offset by the size that actually succeeded, so the sequence is
    deterministic for a given failure pattern — replayable and testable.

    Returns the executed ladder as ``[(offset, size, attempts), ...]``.

    The row-number ordering is computed ONCE over the stable total order
    (one window over one shuffle) and every page is a filter on it —
    pages never re-sort the table. At warehouse scale prefer keyset
    pagination on the order key (range-pruned scans); this operator's
    shape (offset cursor + degrade-on-failure) is the same either way.
    """
    from pyspark.sql import Window

    w = Window.orderBy(*[F.col(c) for c in order_cols])
    rn = df.withColumn("__rn", F.row_number().over(w))
    total = df.count()
    ladder: list[tuple[int, int, int]] = []
    offset, size = 0, page_size
    while offset < total:
        attempts = 0
        while True:
            attempts += 1
            page = rn.filter(
                (F.col("__rn") > offset) & (F.col("__rn") <= offset + size)
            ).drop("__rn")
            try:
                run_page(page, offset, size)
                break
            except TransientPageError:
                if size <= min_page_size:
                    raise
                size = max(size // shrink, min_page_size)
        ladder.append((offset, size, attempts))
        offset += size
    return ladder


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    num_partitions: int | None = None,
    row_col: str = "__rn",
) -> DataFrame:
    """Total-order row numbering WITHOUT a single-partition sort.

    ``row_number() OVER (ORDER BY ...)`` moves the whole table through
    one task — the plan that dies first at 100 TB. This is the classic
    two-phase alternative:

    1. range-partition on the order key (``repartitionByRange`` samples
       split points, so partitions hold disjoint, ordered key ranges),
    2. count rows per partition (a job over O(partitions) rows),
    3. rank within each partition and add the partition's prefix offset.

    Every stage is fully parallel; the only driver state is the
    O(partitions) offset array.

    The ranged intermediate is persisted before counting: the offset
    pass and the rank pass MUST see identical partition boundaries, and
    re-executing the range partitioner re-samples (correct but possibly
    different) split points, which would desynchronize the offsets.

    r14 shape: the within-partition rank rides the persisted
    ``monotonically_increasing_id`` (partition ordinal in the high
    bits, 0-based row index within the sorted partition in the low 33)
    instead of a ``Window.partitionBy(__pid)`` — the window required a
    full-table hash Exchange on ``__pid`` that moved every row a
    SECOND time after the range exchange; the id is computed during
    the one materialization of the sorted ranged table, so the rank
    pass is now map-side only (no second exchange, no window sort).
    The prefix offsets stay a bounded driver collect (O(partitions)
    rows off the already-persisted table — one tiny job) folded in as
    a map literal: an in-plan broadcast-join variant was measured
    SLOWER at sf0.1 (the broadcast build is an extra job per call) for
    zero scale benefit over the collect, which this operator's contract
    already bounds to O(partitions).

    ``order_cols`` must be a total order (include a unique key) — the
    same requirement LIMIT/OFFSET pagination has in any engine (and
    what makes the sorted row index deterministic under recompute).
    """
    from ._cache import swap_cache

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    order = [F.col(c) for c in order_cols]
    ranged = swap_cache(
        "sync.global_row_number",
        df.repartitionByRange(n, *order)
        .sortWithinPartitions(*order)
        .select(
            "*",
            F.spark_partition_id().alias("__pid"),
            F.monotonically_increasing_id().alias("__mid"),
        ),
    )
    counts = ranged.groupBy("__pid").count().collect()
    offsets: list[tuple[int, int]] = []
    acc = 0
    for r in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((r["__pid"], acc))
        acc += r["count"]
    off_map = F.create_map(*[F.lit(v) for pair in offsets for v in pair])
    local_rank = F.col("__mid") - F.shiftleft(
        F.col("__pid").cast("bigint"), 33
    )
    return ranged.withColumn(
        row_col,
        local_rank
        + F.coalesce(off_map[F.col("__pid")].cast("bigint"), F.lit(0))
        + F.lit(1).cast("bigint"),
    ).select(*df.columns, row_col)


def paginated_extract_scalable(
    df: DataFrame,
    order_cols: Sequence[str],
    page: int,
    page_size: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """``paginated_extract`` on the two-phase global ranking — identical
    output, no single-partition window. Use this form when the table
    being paged is fact-sized; the plain form's one-task sort is fine
    for dimension-sized extracts."""
    lo, hi = page * page_size, (page + 1) * page_size
    ranked = global_row_number(df, order_cols, num_partitions=num_partitions)
    return ranked.filter((F.col("__rn") > lo) & (F.col("__rn") <= hi)).drop(
        "__rn"
    )


class EmptySourceRefusal(RuntimeError):
    """Raised instead of deleting when the source returned no rows.

    The reference's critical data-loss fix
    (CRITICAL_DELETE_LOGIC_FIX_SUMMARY.md): an empty extract means "the
    source is unreachable or the query is wrong" far more often than
    "every record was deleted upstream" — destroying the target snapshot
    on that evidence destroyed historical budget data in production.
    """


def stale_snapshot_records(
    target: DataFrame,
    source_keys: DataFrame,
    key_cols: Sequence[str],
    snapshot_expr: Column,
) -> DataFrame:
    """The SAFE delete plan: stale rows of the CURRENT snapshot only.

    Two properties the reference's fix demands (ref
    CRITICAL_DELETE_LOGIC_FIX_SUMMARY.md "intelligent stale record
    detection"):
    - deletion candidates are scoped to the latest snapshot (historical
      snapshots are never candidates, whatever the source says);
    - a row is stale only because its key is ABSENT from the current
      source keyset (anti-join), never because of a blind date range.

    Returns the audit/delete plan as a DataFrame; apply_safe_stale_delete
    executes it with the empty-source refusal.
    """
    latest = target.agg(F.max(snapshot_expr).alias("__latest"))
    current = (
        target.withColumn("__snap", snapshot_expr)
        .crossJoin(F.broadcast(latest))
        .filter(F.col("__snap") == F.col("__latest"))
        .drop("__snap", "__latest")
    )
    return current.join(
        source_keys.select(*key_cols).dropDuplicates(),
        list(key_cols),
        "left_anti",
    )


def apply_safe_stale_delete(
    target: DataFrame,
    source_keys: DataFrame,
    key_cols: Sequence[str],
    snapshot_expr: Column,
) -> DataFrame:
    """Remove current-snapshot stale rows; refuse on an empty source.

    Returns the cleaned target (history untouched). Raises
    :class:`EmptySourceRefusal` when ``source_keys`` has no rows — the
    caller decides whether to alert, retry, or proceed manually; the
    engine never converts "no data fetched" into a delete.
    """
    if source_keys.limit(1).count() == 0:
        raise EmptySourceRefusal(
            "source returned 0 rows; refusing to delete target snapshot "
            "records (historical data preserved)"
        )
    latest = target.agg(F.max(snapshot_expr).alias("__latest"))
    with_snap = target.withColumn("__snap", snapshot_expr).crossJoin(
        F.broadcast(latest)
    )
    is_current = F.col("__snap") == F.col("__latest")
    keyset = source_keys.select(*key_cols).dropDuplicates()
    # Keep: every historical row, plus current rows whose key survives.
    kept_current = (
        with_snap.filter(is_current)
        .join(keyset, list(key_cols), "left_semi")
    )
    historical = with_snap.filter(~is_current)
    return historical.unionByName(kept_current).drop("__snap", "__latest")
