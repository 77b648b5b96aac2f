"""Cross-query memo caches (registry pair tables / models) key on a corpus
snapshot fingerprint: rewriting the dataset at the SAME path must miss the
cache and recompute instead of serving stale state."""

from __future__ import annotations

from snowflake_to_bq_pipeline_spark import registry


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [
            (i, t, "en", "src", len(t))
            for i, t in rows
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_jaccard_memo_invalidates_on_rewrite(spark, tmp_path):
    d = str(tmp_path)
    base = "the quick brown fox jumps over the lazy dog again and again"
    _write_docs(
        spark,
        d,
        [(1, base), (2, base), (3, "completely unrelated words occupy this document body here")],
    )
    first = registry._jaccard_pairs_for(spark, d)
    # warm hit: same live handle, no recompute
    assert registry._jaccard_pairs_for(spark, d) is first
    n1 = first.count()
    assert n1 == 1  # docs 1-2 duplicate

    # rewrite at the SAME path: two dup pairs now
    _write_docs(
        spark,
        d,
        [(1, base), (2, base), (3, base)],
    )
    second = registry._jaccard_pairs_for(spark, d)
    assert second is not first  # fingerprint changed -> recompute
    assert second.count() == 3  # 1-2, 1-3, 2-3


def test_fingerprint_stable_without_changes(tmp_path):
    (tmp_path / "documents.parquet").write_bytes(b"x" * 16)
    a = registry._corpus_fingerprint(str(tmp_path), "documents")
    b = registry._corpus_fingerprint(str(tmp_path), "documents")
    assert a == b
    (tmp_path / "documents.parquet").write_bytes(b"y" * 17)
    assert registry._corpus_fingerprint(str(tmp_path), "documents") != a


def test_clear_model_caches_resets(spark, tmp_path):
    d = str(tmp_path)
    _write_docs(spark, d, [(1, "alpha beta gamma delta epsilon zeta eta")])
    first = registry._jaccard_pairs_for(spark, d)
    registry.clear_model_caches()
    assert not registry._JACCARD_PAIRS_CACHE
    assert registry._jaccard_pairs_for(spark, d) is not first
