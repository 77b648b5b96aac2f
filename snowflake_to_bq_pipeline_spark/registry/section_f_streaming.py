"""SURVEY §2-F — batch twins of the streaming pipelines.

Split from the monolithic registry.py (r9); every query body is
unchanged — registration still flows through registry._core.query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..catalog import load_table
from ..operators import curation
from ..streaming import curation as stream_curation, incremental
from ._core import query


@query(
    "events_windowed_counts",
    oracle="""
    SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 300000000)
             AS window_start,
           make_timestamp(epoch_us(ts) - epoch_us(ts) % 300000000 + 300000000)
             AS window_end,
           event_type,
           COUNT(*) AS event_count
    FROM events
    GROUP BY 1, 2, event_type
    """,
)
def events_windowed_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windowed counts — batch twin of the streaming
    incremental sync (streaming/incremental.py); the streaming path is
    asserted equal to this in tests/test_streaming.py."""
    return incremental.windowed_counts_batch(load_table(spark, sf_dir, "events"))


@query("streaming_near_dedup_twin")  # rows-only: xxhash64 simhash, no SQL twin
def streaming_near_dedup_twin_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming simhash-band near-dedup stage
    (streaming/curation.near_dedup_docs): the keep-list over documents
    arriving in doc_id order (synthetic one-second event times). The
    streaming form is asserted drain-equal to exactly this plan — plus
    pigeonhole recall 1.0 vs batch dedup_simhash — in
    tests/test_streaming.py."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("doc_id")
        ).alias("ts"),
    )
    from .section_e_similarity import _simhash_sigs_for

    return stream_curation.near_dedup_docs(
        docs, watermark=None, sig=_simhash_sigs_for(spark, sf_dir)
    )


@query("streaming_near_dedup_verified_twin")  # rows-only: xxhash64 simhash
def streaming_near_dedup_verified_twin_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch twin of the VERIFIED-state streaming near-dedup stage
    (streaming/curation.near_dedup_docs_verified): the keep-list where a
    doc is dropped only on an exact hamming<=3 match against an earlier
    doc — band candidates verified in state, so chance band collisions
    never over-drop (closes the banding stage's dense-horizon retention
    cliff). The streaming form is asserted drain-equal to exactly this
    plan — plus recall 1.0 AND precision 1.0 vs ground truth on a dense
    5,000-doc horizon — in tests/test_streaming.py. Rides the shared
    per-snapshot signature memo."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("doc_id")
        ).alias("ts"),
    )
    from .section_e_similarity import _simhash_sigs_for

    return stream_curation.near_dedup_docs_verified(
        docs, watermark=None, sig=_simhash_sigs_for(spark, sf_dir)
    )


@query("streaming_quality_score_twin")  # rows-only: literal-model plan
def streaming_quality_score_twin_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch twin of the STREAMING quality-classifier scorer
    (operators/curation.score_docs_with_model): every doc scored
    row-locally against the standing NB model shipped as a
    constant-folded decimal-array literal — zero shuffle, no model
    join, the plan an ingest-time quality gate runs per record. Values
    are pytest-pinned bit-equal to the join-shaped
    quality_classifier_scores (plan-diverse equality), and the
    streaming form is asserted drain-equal in tests/test_streaming.py.
    Rides the driver-resident model memo (O(4096) strings)."""
    from .section_e_text import _nbq_model_for

    return curation.score_docs_with_model(
        load_table(spark, sf_dir, "documents"),
        _nbq_model_for(spark, sf_dir),
    )


@query("streaming_ivf_assign_twin")  # rows-only: trained float model
def streaming_ivf_assign_twin_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming IVF index-maintenance pass
    (streaming/ann.maintain_ivf_index): the (vec_id, cent_id)
    inverted-list membership rows for the daily increment (every 10th
    vec), assigned into the base-trained standing model WITHOUT retrain.
    The streaming foreachBatch form is asserted drain-equal to exactly
    this table — including across a checkpoint restart — in
    tests/test_streaming.py. Rides the shared per-(snapshot, model)
    assignment memo, so it's a filter over the standing index, not a new
    corpus scan."""
    from .section_e_similarity import _assigned_for

    return (
        _assigned_for(spark, sf_dir, 16, exclude_mod=10)
        .filter(F.col("vec_id") % 10 == 0)
        .select("vec_id", "cent_id")
    )
