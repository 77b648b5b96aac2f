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


def test_substring_dup_profile_micro(spark):
    # Two docs share a verbatim 60-char span; a third is unique; a fourth
    # is shorter than the window and must be excluded.
    shared = "the quick brown fox jumps over the lazy dog again and again!"
    # Fillers must be non-self-repetitive: a run like "x"*40 makes
    # identical windows WITHIN one doc, which correctly counts as dup.
    a = "AAAA " + shared + " tail of doc a with plenty of distinct words here"
    b = "BBBBBBBBB " + shared + " doc b closing remarks differ from everything"
    c = "totally unique content with no repeats whatsoever in this string at all"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, "short")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in neardup.substring_dup_profile(
            docs, window=20, stride=5
        ).collect()
    }
    assert 4 not in out  # shorter than the window
    assert out[3].n_dup_windows == 0 and out[3].dup_chars == 0
    # Both sharers flag dup windows covering (at least) most of the
    # shared span, and coverage never exceeds doc length.
    for d in (1, 2):
        r = out[d]
        assert r.n_dup_windows > 0
        assert r.dup_chars >= len(shared) - 25  # stride granularity slack
        assert r.dup_chars <= len((a, b)[d - 1])
        assert 0.0 < r.dup_char_share <= 1.0


def test_substring_dup_profile_interval_union_no_double_count(spark):
    # One doc fully duplicated by another: every window dups, and the
    # union of overlapping windows must equal the full windowed span
    # (len chars), not n_windows * window.
    t = "abcdefghij" * 12  # 120 chars
    docs = spark.createDataFrame([(1, t), (2, t)], ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in neardup.substring_dup_profile(
            docs, window=30, stride=10
        ).collect()
    }
    for d in (1, 2):
        # starts 1,11,...,91 -> 10 windows, all duplicated; union covers
        # chars 1..120 = the whole doc.
        assert out[d].n_windows == 10
        assert out[d].n_dup_windows == 10
        assert out[d].dup_chars == 120
        assert out[d].dup_char_share == 1.0


def test_minhash_recall_report_floor(spark, sf_dir):
    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.operators import neardup

    docs = load_table(spark, sf_dir, "documents")
    row = neardup.minhash_recall_report(
        neardup.ngram_jaccard_pairs(docs, 0.6),
        neardup.minhash_lsh_pairs(docs, 0.6),
    ).collect()[0]
    # Verified candidates can never invent a pair: precision is exactly 1
    # whenever anything was found, and approx pairs are a subset of exact.
    assert row["n_common"] == row["n_approx"]
    assert row["precision"] == 1.0
    # Banding recall floor (same bar as test_minhash_recall).
    assert row["recall"] >= 0.9, row
