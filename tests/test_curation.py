"""Unit checks for curation operators beyond the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.operators import curation


def test_sample_threshold_hex_edges():
    assert curation.sample_threshold_hex(1.0) is None
    assert curation.sample_threshold_hex(1.5) is None
    assert curation.sample_threshold_hex(0.5) == "800"
    assert curation.sample_threshold_hex(0.0) == "000"
    # 3 lowercase hex digits: lexicographic == numeric comparison
    assert curation.sample_threshold_hex(0.05) == "0cc"


def test_stratified_sample_rate_accuracy(spark):
    df = spark.range(10000).select(
        F.col("id").alias("k"), F.lit("s").alias("stratum")
    )
    kept = curation.stratified_sample(df, "k", "stratum", {"s": 0.25}).count()
    assert abs(kept / 10000 - 0.25) < 0.02


def test_stratified_sample_is_deterministic_subset(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), F.lit("s").alias("stratum")
    )
    a = {r.k for r in curation.stratified_sample(df, "k", "stratum", {"s": 0.5}).collect()}
    b = {r.k for r in curation.stratified_sample(df, "k", "stratum", {"s": 0.2}).collect()}
    assert b <= a, "lower rate must select a subset of higher rate"


def test_sequence_packing_boundaries(spark):
    docs = spark.createDataFrame(
        [(1, "s", "x " * 100), (2, "s", "x " * 100), (3, "s", "x " * 100)],
        "doc_id long, source string, text string",
    )
    nt = F.array_size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0))
    rows = {
        r.doc_id: r
        for r in curation.sequence_packing(docs, nt, budget=256).collect()
    }
    assert rows[1].pack_id == 0 and rows[1].offset_in_pack == 0
    assert rows[2].pack_id == 0 and rows[2].offset_in_pack == 100
    assert rows[3].pack_id == 0 and rows[3].offset_in_pack == 200
    # doc 3 straddles into pack 1; its assignment is where it STARTS.


def test_pii_redact_counts_and_text(spark):
    docs = spark.createDataFrame(
        [(1, "mail me at bob@x.org or 555-123-4567 now")],
        "doc_id long, text string",
    )
    r = curation.pii_redact(docs).collect()[0]
    assert r.n_email == 1 and r.n_phone == 1 and r.total_redactions == 2
    assert "<EMAIL>" in r.redacted_text and "<PHONE>" in r.redacted_text
    assert "bob@x.org" not in r.redacted_text
