"""Quality gates for ANN: the LSH path trades recall for candidate-set
size; both properties are asserted against the brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.catalog import load_table
from snowflake_to_bq_pipeline_spark.operators import similarity


def test_lsh_topk_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") < 10
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, pred, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_topk(emb, pred, k=5).collect()
    }
    recall = len(approx & exact) / len(exact)
    # Near-orthogonal synthetic vectors are the hardest case for
    # hyperplane LSH; still expect a solid fraction of true neighbors.
    assert recall >= 0.3, f"LSH ANN recall collapsed: {recall}"


def test_lsh_topk_scores_match_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") < 10
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in similarity.cosine_topk(emb, pred, k=5000).collect()
    }
    for r in similarity.lsh_topk(emb, pred, k=5).collect():
        assert exact[(r.query_id, r.neighbor_id)] == r.cosine


def test_dup_pairs_symmetric_threshold(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.dup_pairs(emb, 0.3, sample_mod=10)
    rows = out.collect()
    for r in rows:
        assert r.vec_a < r.vec_b
        assert r.cosine >= 0.3


def test_dup_pairs_lsh_full_recall_vs_exact(spark, sf_dir):
    """The LSH candidate path must reproduce the exact all-pairs output on
    the test corpus — same pairs, same cosines (the oracle hash-compares)."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in similarity.dup_pairs(
            emb, 0.3, sample_mod=1, method="exact"
        ).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.cosine
        for r in similarity.dup_pairs(emb, 0.3).collect()
    }
    assert lsh == exact


def test_dup_pairs_exact_requires_sample_gate(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    import pytest

    with pytest.raises(ValueError, match="sample_mod"):
        similarity.dup_pairs(emb, 0.3, method="exact")


def test_dup_pairs_blocked_equals_exact(spark, sf_dir):
    """The block-grid BLAS path is exact: same pairs, same 6dp cosines as
    the all-pairs baseline (this is what the oracle hash-compares)."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in similarity.dup_pairs(
            emb, 0.3, sample_mod=1, method="exact"
        ).collect()
    }
    blocked = {
        (r.vec_a, r.vec_b): r.cosine
        for r in similarity.dup_pairs(emb, 0.3, method="blocked").collect()
    }
    assert blocked == exact


def test_kmeans_clusters_self_consistent(spark, sf_dir):
    from snowflake_to_bq_pipeline_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.kmeans_clusters(emb, n_clusters=4, n_iters=2).cache()
    n = emb.count()
    rows = out.collect()
    # one assignment per vector
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n
    # sizes are consistent with assignments
    from collections import Counter
    sizes = Counter(r["cent_id"] for r in rows)
    for r in rows:
        assert sizes[r["cent_id"]] == r["cluster_size"]
    assert len(sizes) <= 4
    # cosine to own centroid is a valid similarity
    assert all(-1.0 <= r["cosine_to_centroid"] <= 1.0 for r in rows)
    # partitioning independence of assignments
    again = similarity.kmeans_clusters(
        emb.repartition(13), n_clusters=4, n_iters=2
    ).collect()
    assert sorted((r["vec_id"], r["cent_id"]) for r in again) == sorted(
        (r["vec_id"], r["cent_id"]) for r in rows
    )
    out.unpersist()


def test_semdedup_invariants(spark, sf_dir):
    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.semdedup_prune(emb, n_clusters=4).collect()
    n_vecs = emb.count()
    assert len(out) == n_vecs  # one row per vector, none lost
    rows = {r["vec_id"]: r for r in out}
    groups: dict[int, list] = {}
    for r in out:
        groups.setdefault(r["group_id"], []).append(r)
    for gid, members in groups.items():
        # group id is the min member id, and exactly that member is kept
        assert gid == min(m["vec_id"] for m in members)
        assert [m["keep"] for m in members].count(True) == 1
        assert rows[gid]["keep"]
        # semantic groups never span kmeans clusters (pairs are scored
        # within-cluster only)
        assert len({m["cluster_id"] for m in members}) == 1
        for m in members:
            assert m["group_size"] == len(members)
    # determinism: a second full run reproduces the same assignment
    again = similarity.semdedup_prune(emb, n_clusters=4).collect()
    key = lambda r: r["vec_id"]
    assert sorted(map(tuple, again), key=lambda t: t[0]) == sorted(
        map(tuple, out), key=lambda t: t[0]
    )


def test_semdedup_subblocking_bounds_cells(spark, sf_dir):
    """Skewed-cluster regime: with every vector forced into ONE cluster,
    sub-blocking must (a) keep each scoring cell's membership bounded —
    no task materializes the whole cluster — and (b) emit exactly the
    pairs the single-cell plan emits."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = similarity._vectors(emb).withColumn(
        "cent_id", F.lit(0).cast("long")
    )
    n = assigned.count()
    max_cell = 40
    nsub = -(-n // max_cell)
    assert nsub > 1  # the skew case actually sub-blocks
    # hash placement keeps every sub-block well under the whole cluster
    counts = (
        assigned.withColumn(
            "blk", F.pmod(F.xxhash64("vec_id"), F.lit(nsub))
        )
        .groupBy("blk")
        .count()
        .collect()
    )
    assert len(counts) == nsub
    assert max(r["count"] for r in counts) <= 3 * max_cell
    blocked = sorted(
        map(tuple, similarity._cluster_blocked_pairs(assigned, 0.3, max_cell).collect())
    )
    single = sorted(
        map(tuple, similarity._cluster_blocked_pairs(assigned, 0.3, 10**9).collect())
    )
    assert blocked == single
    assert len(blocked) > 0  # τ=0.3 on this corpus has real pairs


def test_semdedup_equal_across_cell_sizes(spark, sf_dir):
    """End-to-end semdedup output is invariant to the memory knob."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = similarity.semdedup_prune(
        emb, n_clusters=4, max_cell_rows=64
    ).collect()
    b = similarity.semdedup_prune(emb, n_clusters=4).collect()
    key = lambda t: t[0]
    assert sorted(map(tuple, a), key=key) == sorted(map(tuple, b), key=key)


def test_cluster_quality_report_invariants(spark, sf_dir):
    """Doc-count conservation (every embedded doc lands in exactly one
    cluster row), share bounds, and low-count consistency."""
    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.registry import (
        cluster_quality_report_q,
    )

    rows = cluster_quality_report_q(spark, sf_dir).collect()
    assert rows, "report must be nonempty"
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_docs"] for r in rows) == n_emb
    for r in rows:
        assert 0 <= r["n_low"] <= r["n_docs"]
        assert 0.0 <= r["low_share"] <= 1.0
        assert 0.0 <= r["mean_quality"] <= 1.0
        assert r["tokens_total"] >= 0
    cents = [r["cent_id"] for r in rows]
    assert cents == sorted(cents) and len(set(cents)) == len(cents)


def test_lsh_registry_memo_equals_unmemoized(spark, sf_dir):
    """The standing bucket-index memo path (registry) must return exactly
    the rows the per-call bucketize path returns — the hyperplanes are
    deterministic, so the memo is a reuse of identical work."""
    from snowflake_to_bq_pipeline_spark.registry import (
        QUERIES,
        clear_model_caches,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") < 10
    clear_model_caches()
    direct = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.lsh_topk(emb, pred, k=5).collect()
    }
    memo = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in QUERIES["ann_lsh_topk"](spark, sf_dir).collect()
    }
    assert memo == direct
    # Second invocation rides the warm memo and still matches.
    memo2 = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in QUERIES["ann_lsh_topk"](spark, sf_dir).collect()
    }
    assert memo2 == direct
