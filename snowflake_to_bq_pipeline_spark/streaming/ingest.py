"""Structured-Streaming CORPUS INGESTION — the streaming form of the
daily curation pipeline (pipelines.run_daily_increment), completing the
batch/stream twin pattern for the curation family the same way
streaming/ann.py completes it for IVF maintenance.

Shape: each arriving micro-batch of documents IS one daily increment —
the foreachBatch sink calls the SAME composed pipeline (standing-NB-model
quality gate → dedup vs the standing seen index + intra-batch keep-first
→ split-stable assignment → lightest-first token-balanced shard append →
per-run audit slice) with ``run_id = batch id``. No new logic lives on
the streaming side; the stream is purely a cadence.

Exactly-once without a state store: the pipeline's date-window
delete+insert discipline (each run overwrites its own ``__run=``
partition and reads standing state EXCLUDING it) makes the sink
IDEMPOTENT per batch id, so Structured Streaming's at-least-once
foreachBatch replay after a crash converges to the exactly-once state —
the same argument the reference's daily delete+insert sync makes for
re-run days (``snowflake_bq_sync_daily Time Details/main.py``), and the
property tests/test_streaming.py pins by replaying a committed batch.

Ordering contract: the pipeline's keep-first dedup rule requires each
micro-batch to own a DISJOINT doc_id interval (checked per run — a
violation raises instead of silently mis-deduping; replaying an already
committed batch keeps its interval and is fine). A production feed with
monotone ids (log offsets, snowflake-style ids) satisfies it by
construction.

Scale: per micro-batch cost is the daily pipeline's — the expensive side
of every join is the standing corpus, probed through the same inverted
shingle index the batch run probes; the increment is batch-sized. State
grows by increment size only; nothing is held in the streaming state
store at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..pipelines import run_daily_increment


def read_docs_stream(
    spark: SparkSession, source_dir: str, schema=None
) -> DataFrame:
    """File-source stream over document parquet files (doc_id, source,
    text). Streaming file sources need an explicit schema, so we probe
    the on-disk schema with a metadata-only batch read unless the caller
    supplies one."""
    if schema is None:
        try:
            schema = spark.read.parquet(source_dir).schema
        except Exception as e:
            raise ValueError(
                "read_docs_stream: cannot infer a schema from "
                f"{source_dir!r} (missing or not-yet-populated landing "
                "directory) — pass schema= explicitly so the stream can "
                "start before the first file arrives"
            ) from e
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )


def maintain_corpus(
    stream: DataFrame,
    state_dir: str,
    model: dict,
    checkpoint_dir: str,
    jaccard_tau: float = 0.6,
    n_shards: int = 8,
    cut_spans: bool = False,
) -> StreamingQuery:
    """Start the ingestion query: each micro-batch of new documents runs
    through the full daily-increment pipeline against the standing state
    under ``state_dir``. ``model`` is the trained standing NB classifier
    (operators/curation.train_nbq_model) — bounded driver state shipped
    into the sink closure, the same standing-model posture as the IVF
    maintenance twin's centroid table. ``cut_spans`` forwards the daily
    pipeline's span-grain ExactSubstr cutting (a per-state-dir mode —
    the pipeline refuses a mixed-mode state, so pick it when the state
    dir is born).

    Empty micro-batches are skipped outright (a zero-row run would still
    be correct — every stage degrades to empty partitions — but writing
    empty ``__run=`` partitions per idle trigger is pointless churn)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        run_daily_increment(
            batch_df.sparkSession,
            state_dir,
            batch_df,
            f"batch{batch_id:06d}",
            model,
            jaccard_tau=jaccard_tau,
            n_shards=n_shards,
            cut_spans=cut_spans,
        )

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
