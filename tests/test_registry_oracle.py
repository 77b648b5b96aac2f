"""Every registered query with an oracle must hash-match DuckDB at sf0.001 —
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from snowflake_to_bq_pipeline_spark.registry import ORACLES, QUERIES

from .conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, ddb):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ddb, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_memo_consumers_introspection_is_complete():
    """MEMO_CONSUMERS is derived from query sources at import — pin the
    known relationships (including the transitive one through
    _jaccard_pairs_for) so a helper rename or a refactor that silently
    breaks the introspection fails here instead of silently un-flagging
    bench results."""
    from snowflake_to_bq_pipeline_spark.registry import MEMO_CONSUMERS

    expect = {
        "tfidf_top_terms": {"_tok_counts_for"},
        "vocab_top_k": {"_tok_counts_for"},
        "vocab_coverage_curve": {"_tok_counts_for"},
        "doc_novelty_profile": {"_shingles_for"},
        "ngram_containment_dups": {"_shingles_for"},
        "dedup_simhash": {"_shingles_for"},
        "incremental_dedup_check": {"_shingles_for"},
        # transitive: these call _jaccard_pairs_for, which itself
        # consumes the shingle memo
        "ngram_jaccard_dups": {"_jaccard_pairs_for", "_shingles_for"},
        "dedup_clusters": {"_jaccard_pairs_for", "_shingles_for"},
        # r14: the fuzzy stage reads the memoized full-corpus cluster
        # table (equivalence argument in the query docstring) instead of
        # re-running CC per call
        "dedup_savings_report": {
            "_dup_clusters_for",
            "_jaccard_pairs_for",
            "_shingles_for",
        },
        "kmeans_doc_clusters": {"_assigned_for", "_centroids_for"},
        "semdedup_prune": {"_assigned_for", "_centroids_for"},
        # r12: the IVF family rides the shared assignment memo (and the
        # recall curve additionally the brute-top-k ground-truth memo)
        "ann_cosine_topk": {"_brute_topk_for"},
        "ann_ivf_topk": {"_assigned_for", "_centroids_for"},
        "ann_ivf_incremental_topk": {"_assigned_for", "_centroids_for"},
        "ann_ivf_list_drift": {"_assigned_for", "_centroids_for"},
        "ann_ivf_recall_curve": {
            "_assigned_for",
            "_brute_topk_for",
            "_centroids_for",
        },
        "streaming_ivf_assign_twin": {"_assigned_for", "_centroids_for"},
        "dataset_split_assign_cluster_safe": {
            "_jaccard_pairs_for",
            "_shingles_for",
        },
        "dsir_importance_weights": {"_dsir_weights_for"},
        "dsir_select_topk": {"_dsir_weights_for"},
        "bpe_merge_table": {"_bpe_merges_for"},
        "bpe_encode_tokens": {"_bpe_merges_for"},
        "dedup_minhash_lsh": {"_minhash_pairs_for"},
        # r10 shared-scan memos: the alert pair and the budget family
        "pipeline_alerts": {"_alerts_for"},
        "alert_digest": {"_alerts_for"},
        "budget_vs_actual": {"_budget_rollup_for"},
        "individual_budget_tracking": {"_budget_rollup_for"},
        "budget_fallback_allocation": {"_budget_rollup_for"},
        "contributor_utilization_rollup": {"_budget_rollup_for"},
        "client_budget_rollup": {"_budget_rollup_for"},
        "utilization_rollup": {"_budget_rollup_for"},
        "view_variance_detection": {"_budget_rollup_for"},
    }
    for name, helpers in expect.items():
        assert helpers <= set(MEMO_CONSUMERS.get(name, ())), name
    # non-consumers must NOT be flagged (a false flag would discount a
    # genuine engine win in the bench read)
    for name in ("q1_pricing_summary", "text_stats", "monthly_hours_pivot"):
        assert name not in MEMO_CONSUMERS


def test_bench_diff_tool_parses_both_artifact_forms(tmp_path):
    import json
    import subprocess
    import sys as _sys

    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({
        "tail": "# q_one: best 1.0s of [1.2, 1.0, 1.1]\n"
                "# q_two: best 2.0s of [2.0, 2.4, 2.2]\n"
    }))
    b.write_text(json.dumps({
        "queries": {"q_one": 0.5, "q_two": 3.0, "q_extra": 1.0},
        "rep_times": {"q_one": [0.5, 0.6], "q_two": [3.0, 3.1],
                      "q_extra": [1.0]},
    }))
    out = subprocess.run(
        [_sys.executable, "tools/bench_diff.py", str(a), str(b)],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    ).stdout
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["common_n"] == 2
    assert summary["improved_beyond_spread"] == ["q_one"]
    assert summary["regressed_beyond_spread"] == ["q_two"]


def test_bench_calibration_probe_runs_and_is_deterministic(spark):
    """The calibration probe must execute under ANSI mode (raw xxhash64
    sums overflow long — the bug that killed a bench run) and produce a
    deterministic result so it measures the VM, not the data."""
    from bench import calibration_probe

    rows = calibration_probe(spark, n_rows=200_000).collect()
    assert len(rows) == 9973
    assert rows == calibration_probe(spark, n_rows=200_000).collect()


def test_bench_mc_probe_runs_and_is_deterministic(spark):
    """The shuffle-heavy multi-core probe must run (full range-partition
    sort) and produce a deterministic ordering so it measures the VM's
    shuffle path, not the data."""
    from bench import calibration_probe_mc

    rows = calibration_probe_mc(spark, n_rows=100_000).collect()
    assert len(rows) == 100_000
    assert rows == calibration_probe_mc(spark, n_rows=100_000).collect()


def test_dedup_savings_fuzzy_stage_equals_restricted_cc(spark, sf_dir):
    """The r14 dedup_savings_report rewrite reads the memoized
    FULL-corpus cluster table and filters to exact-dedup survivors; pin
    it equal to the r13 shape (pointer-jumping CC over the
    survivor-restricted pair set). The equivalence argument (identical
    text => identical pair edges, so dropping exact-dup non-survivors
    never disconnects a component or changes its minimum) lives in the
    query docstring; this test is its executable form."""
    from pyspark.sql import functions as F

    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.operators import graph
    from snowflake_to_bq_pipeline_spark.registry import QUERIES
    from snowflake_to_bq_pipeline_spark.registry.section_e_similarity import (
        _jaccard_pairs_for,
    )

    row = QUERIES["dedup_savings_report"](spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("ch")
    )
    g = base.groupBy("ch").agg(F.min("doc_id").alias("cid"))
    surv = (
        base.join(g, "ch")
        .filter(F.col("doc_id") == F.col("cid"))
        .select("doc_id")
    )
    pairs = _jaccard_pairs_for(spark, sf_dir).select("doc_a", "doc_b")
    spairs = pairs.join(
        surv.select(F.col("doc_id").alias("doc_a")), "doc_a"
    ).join(surv.select(F.col("doc_id").alias("doc_b")), "doc_b")
    old_fuzzy = (
        graph.dup_clusters(spairs)
        .filter(~F.col("is_canonical"))
        .join(surv, "doc_id")
        .count()
    )
    assert row["fuzzy_dup_docs"] == old_fuzzy
    assert old_fuzzy > 0, "fixture must exercise the fuzzy stage"
