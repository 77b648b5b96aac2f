"""Target-side sinks.

The reference loads BigQuery with truncate-and-reload or per-day
DELETE+INSERT (snowflake_bq_sync_daily Time Details/main.py). Spark-native
equivalents over lake storage:

- ``write_snapshot``: full-replace load (the *_sync_full path).
- ``write_partitioned``: date-partitioned layout so daily increments
  replace only their partitions (dynamic partition overwrite) — the
  DELETE+INSERT pattern without the DELETE.
- ``merge_into_path``: key-based MERGE into an existing parquet directory
  (read → anti-join → union → atomic swap). On a real lake this is one
  ``MERGE INTO`` against Delta/Iceberg; the manual swap here keeps the
  engine dependency-free.

Scale: partitioned writes let 1000 executors write independently;
``maxRecordsPerFile`` bounds file sizes; dynamic overwrite touches only
affected partitions.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sync import merge_upsert


def write_snapshot(df: DataFrame, path: str, max_records_per_file: int = 1_000_000) -> None:
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    dynamic_overwrite: bool = True,
) -> None:
    """Date/key-partitioned write; with dynamic overwrite only the
    partitions present in ``df`` are replaced (daily-increment pattern)."""
    spark = df.sparkSession
    if dynamic_overwrite:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        df.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def merge_into_path(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: Sequence[str],
    order_col: str | None = None,
    tiebreak_cols: Sequence[str] = (),
    delete_absent_keys: bool = False,
) -> None:
    """MERGE ``updates`` into the parquet directory at ``path``.

    Missing target → plain write. Otherwise read, merge, write to a
    sibling temp dir, swap. With ``order_col`` the merge is
    WHEN-MATCHED-AND-NEWER: the row with the greatest (order_col,
    tiebreaks) survives per key, so replaying an old batch can never
    clobber newer target rows (required for out-of-order streaming
    upserts). Without it, updates win unconditionally.

    ``delete_absent_keys=True`` is the full-reconciliation mode (ref:
    snowflake_bq_deduplication_sync.py:270 — delete target orphans, insert
    missing): ``updates`` is treated as the complete source keyspace, so
    target rows whose keys no longer appear in it are dropped. The
    orphan drop is a left_semi join on the keys — one shuffle, no
    collect. Prod note: swap for Delta/Iceberg MERGE INTO to get ACID +
    concurrent readers.
    """
    _recover_dangling_swap(path)
    if not os.path.exists(path):
        write_snapshot(updates, path)
        return
    base = spark.read.parquet(path)
    if delete_absent_keys:
        base = base.join(
            updates.select(*key_cols).dropDuplicates(), list(key_cols), "left_semi"
        )
    if order_col is not None:
        from ..operators.dedup import latest_record

        merged = latest_record(
            base.unionByName(updates.select(*base.columns)),
            key_cols,
            order_col,
            tiebreak_cols,
        )
    else:
        merged = merge_upsert(base, updates, key_cols)
    tmp = tempfile.mkdtemp(
        prefix=".merge_", dir=os.path.dirname(os.path.abspath(path))
    )
    try:
        out = os.path.join(tmp, "data")
        merged.write.mode("overwrite").parquet(out)
        # Unique suffix: a leftover old dir from a prior crash can never
        # collide with this swap's rename.
        old = f"{path.rstrip('/')}.old.{uuid.uuid4().hex}"
        os.rename(path, old)
        os.rename(out, path)
        shutil.rmtree(old, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _recover_dangling_swap(path: str) -> None:
    """Heal a crash inside merge_into_path's two-rename swap.

    A crash between ``rename(path, old)`` and ``rename(out, path)`` leaves
    the target missing and the data parked in ``path.old.*``. Without
    recovery, the replayed batch (its checkpoint never committed) would see
    no target and write_snapshot() only itself — silently discarding all
    previously merged history. If the target exists, any ``.old.*`` dirs
    are post-swap leftovers and are safe to drop.
    """
    dangling = sorted(glob.glob(glob.escape(path.rstrip("/")) + ".old.*"))
    if not dangling:
        return
    if not os.path.exists(path):
        newest = max(dangling, key=os.path.getmtime)
        os.rename(newest, path)
        dangling.remove(newest)
    for leftover in dangling:
        shutil.rmtree(leftover, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed table: joins/aggregations on the bucket key
    then run shuffle-free (each bucket pairs 1:1 across tables).

    This is the storage-level answer to the biggest 100 TB cost in this
    engine — the fact⋈fact shuffle: bucket lineitem and orders by order
    key once at load time and every downstream join/groupBy on that key
    skips its Exchange. Requires a session with a warehouse dir (any
    Spark ≥3 local or cluster session has one).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def delta_available() -> bool:
    """True when the delta-spark package is importable (env gate — the
    test container ships without it; see also read_jdbc)."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    return True


def delta_merge_condition(key_cols: Sequence[str]) -> str:
    """The MERGE ON condition ``merge_into_delta`` uses — exposed so the
    contract test (tests/test_pipelines.py) can exercise the exact
    condition string against a DataFrame simulation of Delta's
    whenMatchedUpdateAll/whenNotMatchedInsertAll actions and assert
    equivalence with ``merge_into_path`` without delta-spark installed."""
    return " AND ".join(f"t.{k} = u.{k}" for k in key_cols)


def delta_matched_condition(order_col: str | None) -> str | None:
    """The WHEN MATCHED update gate: strictly-newer-wins with an
    ``order_col`` (an exact order tie keeps the target; merge_into_path
    resolves ties by the caller's tiebreak_cols instead, so callers that
    need tie determinism across both backends must order on a column
    that never ties — the contract test uses distinct orders),
    unconditional otherwise."""
    return None if order_col is None else f"u.{order_col} > t.{order_col}"


def merge_into_delta(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: Sequence[str],
    order_col: str | None = None,
) -> None:
    """ACID MERGE INTO a Delta table — the production upgrade of
    ``merge_into_path`` (same semantics, no swap window, concurrent
    readers). With ``order_col`` the update applies only when strictly
    newer (out-of-order replay safety, matching the parquet path's
    newer-wins merge).

    Requires delta-spark AND a session built with the Delta SQL extension
    + catalog; raises with guidance otherwise so callers fall back to
    ``merge_into_path`` explicitly rather than silently losing ACID.
    """
    if not delta_available():
        raise RuntimeError(
            "delta-spark is not installed; use merge_into_path (parquet "
            "swap merge) or install delta-spark and build the session with "
            "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"
        )
    from delta.tables import DeltaTable

    if not DeltaTable.isDeltaTable(spark, path):
        updates.write.format("delta").mode("overwrite").save(path)
        return
    target = DeltaTable.forPath(spark, path)
    merge = target.alias("t").merge(
        updates.alias("u"), delta_merge_condition(key_cols)
    )
    matched_cond = delta_matched_condition(order_col)
    if matched_cond is not None:
        merge = merge.whenMatchedUpdateAll(condition=matched_cond)
    else:
        merge = merge.whenMatchedUpdateAll()
    merge.whenNotMatchedInsertAll().execute()


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int | None = None,
) -> None:
    """Range-clustered write: co-locate rows by the columns queries
    filter on, so parquet min/max footer stats prune whole files.

    ``repartitionByRange`` gives each output file a disjoint key range
    (the 1-D equivalent of Z-ordering; enough when one column dominates
    predicates), and ``sortWithinPartitions`` tightens row-group stats
    inside each file. A reader filtering on the cluster column then
    skips every file whose range misses — the layout-level complement
    of partition pruning, without the directory explosion of
    ``partitionBy`` on a high-cardinality key.
    """
    spark = df.sparkSession
    n = num_files or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_path(
    spark: SparkSession,
    path: str,
    target_bytes_per_file: int = 128 * 1024 * 1024,
) -> int:
    """Coalesce a directory of small parquet files into ~target-sized
    ones; returns the new file count.

    The streaming/daily-increment pattern leaves thousands of tiny files
    whose open/footer overhead dominates scans; periodic compaction is
    table maintenance every lake engine runs (Delta OPTIMIZE, Iceberg
    rewrite_data_files). Implemented as read → coalesce(ceil(bytes /
    target)) → atomic swap (same crash-safe rename dance as
    merge_into_path). ``coalesce`` avoids a shuffle: existing partitions
    concatenate into fewer files.
    """
    _recover_dangling_swap(path)
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_bytes_per_file))
    compacted = spark.read.parquet(path).coalesce(n_files)
    tmp = tempfile.mkdtemp(
        prefix=".compact_", dir=os.path.dirname(os.path.abspath(path))
    )
    try:
        out = os.path.join(tmp, "data")
        compacted.write.mode("overwrite").parquet(out)
        old = f"{path.rstrip('/')}.old.{uuid.uuid4().hex}"
        os.rename(path, old)
        os.rename(out, path)
        shutil.rmtree(old, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )


def expire_snapshots(
    spark: SparkSession,
    path: str,
    partition_col: str,
    keep_n: int,
) -> list[str]:
    """Retention vacuum for a ``partitionBy(partition_col)`` layout: keep
    the newest ``keep_n`` partition values, delete the rest.

    The third leg of table maintenance next to write_partitioned
    (layout) and compact_path (file sizing): daily-snapshot tables grow
    one partition per run forever, and retention is a DIRECTORY delete
    on the partition key — never a rewrite of surviving data. Values
    sort lexicographically, which orders ISO dates correctly (the
    layout's own convention). Returns the deleted partition values.

    Refuses (ValueError) when asked to delete everything — the same
    conservatism as apply_safe_stale_delete's empty-source refusal.
    """
    prefix = f"{partition_col}="
    parts = sorted(
        d[len(prefix):]
        for d in os.listdir(path)
        if d.startswith(prefix)
        and os.path.isdir(os.path.join(path, d))
    )
    if keep_n < 1:
        raise ValueError(
            "keep_n must be >= 1: refusing to expire every snapshot"
        )
    doomed = parts[:-keep_n] if keep_n < len(parts) else []
    for v in doomed:
        shutil.rmtree(os.path.join(path, f"{prefix}{v}"))
    return doomed


def write_training_shards(
    assigned: DataFrame,
    path: str,
    shard_col: str = "shard_id",
    order_col: str | None = None,
) -> None:
    """Materialize a training-shard assignment as one parquet file per
    shard — the physical export the token-balanced assignment
    (operators/curation.shard_assignment) exists for: a training job maps
    one shard file to one data-loader worker, so per-shard token balance
    becomes wall-clock balance.

    Shape: hash-repartition on the shard id (so each shard's rows sit in
    one task — colliding shards share a task but still emit separate
    files via partitionBy), optional in-shard sort for deterministic
    intra-file order, dynamic partition write. File count = shard count
    exactly; no small-file spray.
    """
    n_shards = assigned.select(shard_col).distinct().count()
    df = assigned.repartition(max(n_shards, 1), F.col(shard_col))
    if order_col is not None:
        df = df.sortWithinPartitions(shard_col, order_col)
    df.write.partitionBy(shard_col).mode("overwrite").parquet(path)
