"""Product-quantization ANN: recall against brute force, code validity,
compression fidelity, and determinism of the trained model."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.catalog import load_table
from snowflake_to_bq_pipeline_spark.operators import pq, similarity


def test_pq_codes_valid_and_complete(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq.train_codebooks(emb)
    assert books.shape == (pq.M_SUBSPACES, pq.K_CODES, 64 // pq.M_SUBSPACES)
    codes = pq.pq_encode(emb, books)
    assert codes.count() == emb.count()
    bad = codes.filter(
        (F.array_size("codes") != pq.M_SUBSPACES)
        | F.exists(
            "codes", lambda c: (c < 0) | (c >= F.lit(pq.K_CODES))
        )
    )
    assert bad.count() == 0


def test_pq_train_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = pq.train_codebooks(emb)
    b = pq.train_codebooks(emb)
    assert np.array_equal(a, b)


def test_pq_topk_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") < 10
    truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, pred, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq.pq_topk(emb, pred, k=20).collect()
    }
    recall = len(truth & approx) / len(truth)
    # 8×16 PQ on 64-dim near-orthogonal synthetic vectors is a coarse
    # quantizer; requiring half the true top-5 inside the ADC top-20
    # catches broken LUT indexing / subspace slicing without flaking.
    assert recall >= 0.5, recall


def test_pq_compression_stats(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    row = pq.pq_compression_stats(emb).collect()[0]
    assert row.n_vectors == emb.count()
    assert row.raw_bytes_per_vec == 256 and row.coded_bytes_per_vec == 8
    assert 0.0 < row.mean_recon_cosine <= 1.0


def test_ivfpq_topk_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") < 10
    truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, pred, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq.ivfpq_topk(emb, pred, k=20).collect()
    }
    recall = len(truth & approx) / len(truth)
    # Residual coding + 6/16 probes: expect at least the flat-PQ bar.
    assert recall >= 0.5, recall


def test_pq_registry_memo_equals_unmemoized(spark, sf_dir):
    """The standing-index memo path (registry) must return exactly the
    rows the per-call train+encode path returns — the memo is a reuse of
    identical work, never a different model."""
    from snowflake_to_bq_pipeline_spark.registry import (
        QUERIES,
        clear_model_caches,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") < 10
    clear_model_caches()
    direct_pq = {
        tuple(r) for r in pq.pq_topk(emb, pred, k=5).collect()
    }
    memo_pq = {
        tuple(r) for r in QUERIES["ann_pq_topk"](spark, sf_dir).collect()
    }
    assert memo_pq == direct_pq
    direct_ivfpq = {
        tuple(r) for r in pq.ivfpq_topk(emb, pred, k=5).collect()
    }
    memo_ivfpq = {
        tuple(r)
        for r in QUERIES["ann_ivfpq_topk"](spark, sf_dir).collect()
    }
    assert memo_ivfpq == direct_ivfpq
    # Second invocation rides the warm memo and still matches.
    memo_pq2 = {
        tuple(r) for r in QUERIES["ann_pq_topk"](spark, sf_dir).collect()
    }
    assert memo_pq2 == direct_pq


def test_injected_codes_contract_debug_check(spark, sf_dir, monkeypatch):
    """Negative path for the standing-index injection contract (r15):
    with $SPARK_GRAFT_DEBUG_CONTRACTS set, pq_topk/ivfpq_topk reject
    injected codes whose shape cannot be the encoding under the supplied
    model (wrong M width / code values outside the codebook range)
    instead of silently scoring garbage. A MATCHED pair passes the check
    and returns the normal result."""
    import pytest

    emb = load_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") < 3
    books = pq.train_codebooks(emb)
    good = pq.pq_encode(emb, books)
    monkeypatch.setenv("SPARK_GRAFT_DEBUG_CONTRACTS", "1")
    # matched pair: check passes, result equals the uninjected run
    ok = pq.pq_topk(emb, pred, k=3, codebooks=books, codes=good)
    base = pq.pq_topk(emb, pred, k=3)
    assert {tuple(r) for r in ok.collect()} == {
        tuple(r) for r in base.collect()
    }
    # wrong width: codes truncated to M-1 entries
    narrow = good.select(
        "vec_id", F.slice("codes", 1, pq.M_SUBSPACES - 1).alias("codes")
    )
    with pytest.raises(ValueError, match="not the encoding under"):
        pq.pq_topk(emb, pred, k=3, codebooks=books, codes=narrow)
    # out-of-range code values vs the model's K
    hot = good.select(
        "vec_id",
        F.transform("codes", lambda c: c + F.lit(pq.K_CODES)).alias("codes"),
    )
    with pytest.raises(ValueError, match="outside the model's codebook"):
        pq.pq_topk(emb, pred, k=3, codebooks=books, codes=hot)
    # ivfpq rides the same check
    model = pq.train_ivfpq_model(emb)
    coded = pq.ivfpq_encode(emb, *model)
    bad = coded.select(
        "vec_id",
        "cent_id",
        F.slice("codes", 1, pq.M_SUBSPACES - 1).alias("codes"),
    )
    with pytest.raises(ValueError, match="not the encoding under"):
        pq.ivfpq_topk(emb, pred, k=3, model=model, coded=bad)
