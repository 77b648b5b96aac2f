"""End-to-end pipeline compositions — the engine-side equivalent of the
reference's per-pipeline ``main.py`` entry points (extract → transform →
load → monitor in one invocation, e.g.
work_item_budget_vs_actual_pipeline/main.py), applied to the
training-corpus use case this engine extends the reference toward.

``build_training_corpus`` chains the curation operators the registry
exposes individually into the standard corpus-production sequence:

1. quality gate (Gopher word-shape rules — row-local, zero shuffle)
2. exact dedup (md5 fingerprint, keep min doc_id)
3. fuzzy dedup (n-gram Jaccard pairs → verified CC → keep canonical)
4. language-mix downsampling (deterministic md5 stratified sample)
5. token-balanced shard assignment + one-file-per-shard parquet export

Every stage is the already-oracle-gated operator, so end-to-end
correctness reduces to composition accounting: the pipeline returns a
per-stage funnel (docs in/out) the caller can assert and monitor — the
same survivors-per-gate discipline as ``curation.quality_funnel``.

Scale posture inherits from the stages: the only corpus-sized shuffles
are the dedup joins; the quality gate and sampling are row-local filters
pushed before both, so the expensive stages see the smallest corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import curation, neardup
from .operators.graph import dup_clusters
from .operators.text import fingerprint
from .sinks.writers import write_training_shards

#: Default language-mix rates (matches the registry's stratified query).
MIX_RATES = {"en": 1.0, "zh": 0.5, "fr": 0.25, "es": 0.1, "de": 0.05}


def build_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    jaccard_tau: float = 0.6,
    n_shards: int = 8,
    mix_rates: dict[str, float] | None = None,
) -> dict[str, int]:
    """Produce a curated, deduplicated, mix-balanced, sharded corpus at
    ``out_path``; returns the per-stage document-count funnel.
    """
    docs = load_table(spark, sf_dir, "documents")
    stats: dict[str, int] = {"input": docs.count()}

    # 1. Quality gate (row-local; cheapest filter runs first).
    kept = (
        curation.gopher_quality_rules(docs)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    docs = docs.join(kept, "doc_id")
    stats["after_quality"] = docs.count()

    # 2. Exact dedup: keep min doc_id per normalized-text fingerprint.
    fp = fingerprint(docs)
    keep_exact = fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id")
    )
    docs = docs.join(keep_exact.select("doc_id"), "doc_id")
    stats["after_exact_dedup"] = docs.count()

    # 3. Fuzzy dedup: Jaccard pairs → transitive clusters → canonical only.
    pairs = neardup.ngram_jaccard_pairs(docs, jaccard_tau)
    drop = (
        dup_clusters(pairs)
        .filter(~F.col("is_canonical"))
        .select("doc_id")
    )
    docs = docs.join(drop, "doc_id", "left_anti")
    stats["after_fuzzy_dedup"] = docs.count()

    # 4. Language-mix downsampling (deterministic, auditable).
    docs = curation.stratified_sample(
        docs, "doc_id", "lang", mix_rates or MIX_RATES
    )
    stats["after_mix_sample"] = docs.count()

    # 5. Split-leakage QA: fuzzy dedup at tau should have removed
    # cross-split near-dups; report residual exact-5-gram leakage across
    # the deterministic train/val/test boundary (the number an eval-set
    # owner watches — nonzero means step 3's tau is too loose).
    leak = curation.cross_split_contamination(docs)
    stats["heldout_docs"] = leak.count()
    stats["heldout_leaked"] = leak.filter(F.col("leaked")).count()

    # 6. Token-balanced shards → one parquet file per shard.
    n_tokens = F.array_size(F.split(F.col("text"), " "))
    assigned = curation.shard_assignment(docs, n_tokens, n_shards=n_shards)
    out = docs.join(assigned.select("doc_id", "shard_id"), "doc_id")
    write_training_shards(out, out_path, order_col="doc_id")
    stats["written"] = spark.read.parquet(out_path).count()
    return stats
