"""Structured-Streaming IVF index maintenance — the streaming form of
the batch incremental assignment pass (operators/similarity.py
``ivf_incremental_topk``), completing the batch/stream twin pattern for
the ANN family (ref pattern: the reference's daily syncs append into
standing tables and never rebuild, ``*_sync_daily/main.py``; the batch
twin does the same assignment once a day, this does it per micro-batch).

Shape: the coarse quantizer (a trained k-means centroid table — MODEL
state, O(n_centroids) rows) is captured once driver-side and shipped to
executors inside the per-batch assignment closure; each arriving
micro-batch of new vectors is scored against all centroids in one BLAS
matmul (``similarity._assign`` — stateless, row-local, no shuffle) and
APPENDED to the inverted-list index sink.  No streaming state store is
needed at all: nearest-centroid assignment is a pure per-row function of
(vector, model), so the sink converges to exactly the batch assignment
table regardless of micro-batch boundaries — asserted drain-equal in
tests/test_streaming.py.

Scale: arriving files partition across executors; per-batch cost is one
map-only pass over the increment (the same cost the batch twin pays
daily, amortized continuously); the index sink grows by increment size
only.  Queries keep probing the standing base index plus this appended
increment — ``ivf_incremental_topk`` over base ∪ sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import similarity


def read_vectors_stream(
    spark: SparkSession, source_dir: str, schema=None
) -> DataFrame:
    """File-source stream over embedding parquet files (vec_id,
    embedding).  Streaming file sources need an explicit schema, so we
    probe the on-disk schema with a metadata-only batch read unless the
    caller supplies one."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )


def assign_vectors_batch(
    vectors: DataFrame, centroids: DataFrame
) -> DataFrame:
    """One micro-batch (or the batch twin) of index maintenance: assign
    each vector to its nearest coarse centroid.  Output
    (vec_id, cent_id) — the inverted-list membership rows the sink
    appends.  Deterministic per row (BLAS scores are row-local, ties
    break on cent_id), so stream and batch agree bit-for-bit."""
    v = vectors.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    return similarity._assign(v, centroids, "vec_id", "e", 1).select(
        "vec_id", "cent_id"
    )


def maintain_ivf_index(
    stream: DataFrame,
    centroids: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start the maintenance query: each micro-batch of new vectors is
    assigned into the EXISTING coarse lists (no retrain — the standing
    model arrives via ``centroids``) and appended to the parquet index
    sink.  foreachBatch because the assignment is a mapInPandas over a
    model closure — no aggregation state, so a restart from the same
    checkpoint resumes at the next uncommitted batch (pytest-asserted).
    Delivery is Structured Streaming's foreachBatch contract:
    exactly-once across clean restarts, at-least-once if a crash lands
    MID-append — a consumer that must tolerate that replays dedups on
    vec_id at read time (assignment is deterministic, so duplicates are
    identical rows)."""
    # Capture the model rows once: a streaming foreachBatch closure must
    # not re-reference a driver DataFrame built from a batch source.
    rows = [(int(r["cent_id"]), list(r["ce"])) for r in centroids.collect()]

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        cents = batch_df.sparkSession.createDataFrame(
            rows, "cent_id long, ce array<double>"
        )
        assign_vectors_batch(batch_df, cents).write.mode("append").parquet(
            sink_dir
        )

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
