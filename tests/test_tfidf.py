"""Max-df guard for the TF-IDF inverted-index self-join: the guard prunes
hot tokens from candidate generation only and exactly rescores candidates,
so for ANY max_df the output must be identical to the unguarded plan (the
docstring's exemption bound makes candidate generation complete)."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.catalog import load_table
from snowflake_to_bq_pipeline_spark.operators import text


def _pairs(df):
    return sorted((r.doc_a, r.doc_b, r.cosine) for r in df.collect())


def test_tfidf_guard_noop_on_clean_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = _pairs(text.tfidf_doc_similarity(docs))
    assert base  # the corpus has near-dup pairs at the default tau
    # force the guard on aggressively: equality must hold for any cap
    for cap in (1, 2, 8):
        assert _pairs(text.tfidf_doc_similarity(docs, max_df=cap)) == base


def test_tfidf_guard_with_boilerplate_token(spark):
    """Corpus-wide boilerplate 3-gram that makes every top-k list — the
    residual hot-key case the guard exists for. Guarded output must equal
    the effectively-unguarded (huge cap) output."""
    boiler = "terms of service apply"
    rows = []
    for i in range(30):
        body = f"unique subject {i} alpha beta{i} gamma{i} delta epsilon{i}"
        rows.append((i, f"{body} {boiler}"))
    # two exact near-dup pairs that must survive
    rows.append((100, rows[0][1]))
    rows.append((101, rows[5][1]))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wide = _pairs(text.tfidf_doc_similarity(docs, max_df=10**9))
    guarded = _pairs(text.tfidf_doc_similarity(docs, max_df=3))
    assert guarded == wide
    surviving = {(a, b) for a, b, _ in guarded}
    assert (0, 100) in surviving and (5, 101) in surviving
