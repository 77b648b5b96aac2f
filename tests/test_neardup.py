"""Quality gates for the approximate near-dup operators: the LSH candidate
path must recover (almost) everything the exact shingle-join finds."""

from __future__ import annotations

from snowflake_to_bq_pipeline_spark.catalog import load_table
from snowflake_to_bq_pipeline_spark.operators import neardup


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_minhash_recall_vs_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = _pairs(neardup.ngram_jaccard_pairs(docs, 0.6))
    lsh = _pairs(neardup.minhash_lsh_pairs(docs, 0.6))
    assert lsh <= exact, "LSH output must be exact-verified (no false positives)"
    assert exact, "test data should contain injected near-dups"
    recall = len(lsh & exact) / len(exact)
    # 8 bands x 4 rows: P(candidate | j=0.6) ≈ 0.67 per pair is the floor at
    # the threshold itself; injected dups sit well above it (j≈0.95+).
    assert recall >= 0.8, f"minhash recall too low: {recall}"


def test_minhash_jaccard_values_match_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in neardup.ngram_jaccard_pairs(docs, 0.6).collect()
    }
    for r in neardup.minhash_lsh_pairs(docs, 0.6).collect():
        assert exact[(r.doc_a, r.doc_b)] == r.jaccard

def test_simhash_finds_near_identical_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact_high = _pairs(neardup.ngram_jaccard_pairs(docs, 0.9))
    sim = _pairs(
        neardup.simhash_pairs(docs, max_hamming=6).select("doc_a", "doc_b")
    )
    assert exact_high, "test data should contain >0.9-jaccard pairs"
    hit = len(sim & exact_high) / len(exact_high)
    assert hit >= 0.7, f"simhash missed too many near-identical pairs: {hit}"


def test_exact_dedup_idempotent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = neardup.exact_dedup(docs)
    canon_ids = [r.canonical_doc_id for r in out.filter("is_duplicate = false").collect()]
    assert len(canon_ids) == len(set(canon_ids))
    # Re-deduping the canonical set finds nothing.
    kept = docs.join(
        out.filter("is_duplicate = false").select("doc_id"), "doc_id", "left_semi"
    )
    again = neardup.exact_dedup(kept)
    assert again.filter("is_duplicate = true").count() == 0
