"""Streaming MERGE sink: continuously fold arriving changes into a keyed
parquet target via foreachBatch.

This is the full streaming analog of the reference's daily sync loop: the
daily Cloud Function extracted a window and delete+inserted it into
BigQuery; here each micro-batch of arriving rows is deduped to its latest
version per key and merged into the target directory exactly once
(checkpointed). On a real lake the merge body becomes a Delta/Iceberg
MERGE INTO with the same driver.

Scale: each micro-batch costs O(batch + |target|) for the rewrite here;
with a transactional table format the target rewrite narrows to touched
files only. State is only Spark's file-source checkpoint.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import latest_record
from ..sinks.writers import merge_into_path


def run_merge_stream(
    spark: SparkSession,
    source: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    key_cols: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> None:
    """Drain the available stream into ``target_dir`` as keyed upserts."""

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        latest = latest_record(batch, key_cols, order_col, tiebreak_cols)
        # Newer-wins merge: micro-batches are not ordered by version, so a
        # batch may carry rows older than what the target already holds.
        merge_into_path(
            spark, latest, target_dir, key_cols, order_col, tiebreak_cols
        )

    q = (
        source.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
