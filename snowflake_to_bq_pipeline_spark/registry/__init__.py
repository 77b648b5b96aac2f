"""Query registry: every operator from SURVEY.md §2 as a named
(spark, sf_dir) -> DataFrame callable, plus the DuckDB oracle SQL used by
the driver's correctness gate.

Column-name discipline: every computed column is aliased identically in the
Spark plan and the oracle SQL (the driver sorts columns by name and hashes
values). Money aggregates are computed in exact decimal then emitted as
round(x, 2) doubles on BOTH sides — see functions.DEC for why.
"""

from __future__ import annotations

from ._core import (QueryFn, QUERIES, ORACLES, query, _corpus_fingerprint, _ModelMemo)  # noqa: F401
from . import section_a_sync as _a_sync
from . import section_b_analytics as _b_analytics
from . import section_c_monitoring as _c_monitoring
from . import section_d_classic as _d_classic
from . import section_e_text as _e_text
from . import section_e_similarity as _e_similarity
from . import section_f_streaming as _f_streaming

from .section_a_sync import (  # noqa: F401
    _PAGE,
    _PAGE_SIZE,
    backfill_progress_q,
    cdc_fold_snapshot_q,
    chunked_backfill_plan_q,
    column_value_drift_q,
    dedup_latest_record_q,
    full_sync_snapshot,
    incremental_agg_maintenance_q,
    incremental_sync_window,
    merge_upsert_q,
    missing_records_q,
    orphaned_records_q,
    paginated_extract_q,
    snapshot_changelog_q,
    stale_snapshot_audit_q,
    sync_date_dedup_q,
)
from .section_b_analytics import (  # noqa: F401
    _BUDGET_ROLLUP_CACHE,
    _NET,
    _PIVOT_YEAR,
    _budget_rollup_for,
    asof_join_q,
    bom_per_case_q,
    budget_fallback_allocation_q,
    budget_vs_actual_q,
    click_attribution_q,
    client_budget_rollup_q,
    contributor_utilization_rollup_q,
    customer_revenue_deciles_q,
    event_lateness_profile_q,
    event_session_stats_q,
    event_sessions_q,
    funnel_conversion_q,
    individual_budget_tracking_q,
    monthly_hours_pivot_q,
    open_orders_by_day_q,
    reporting_lag_q,
    retention_cohorts_q,
    rolling_revenue_7d_q,
    sales_rollup_sets_q,
    scd2_status_history_q,
    user_activity_trend_q,
    user_running_totals_q,
    utilization_rollup_q,
    view_variance_detection_q,
    work_item_enriched_q,
)
from .section_c_monitoring import (  # noqa: F401
    _ALERTS_CACHE,
    _ALERTS_SQL_CTES,
    _PROFILE_COLS,
    _alerts_for,
    alert_digest_q,
    data_quality_metrics_q,
    distribution_drift_psi_q,
    dup_key_audit_q,
    freshness_check_q,
    json_props_profile_q,
    key_skew_profile_q,
    mad_outlier_profile_q,
    multivariate_anomaly_q,
    pipeline_alerts_q,
    robust_value_stats_q,
    row_count_by_day_q,
    row_count_compare_q,
    status_flap_q,
    volume_anomaly_dow_q,
    volume_anomaly_q,
)
from .section_d_classic import (  # noqa: F401
    bloom_filtered_entries_q,
    q10_q,
    q11_q,
    q12_q,
    q13_q,
    q14_q,
    q15_q,
    q16_q,
    q17_q,
    q18_q,
    q19_q,
    q1_q,
    q20_q,
    q21_q,
    q22_q,
    q2_q,
    q3_q,
    q4_q,
    q5_q,
    q6_q,
    q7_q,
    q8_q,
    q9_q,
)
from .section_e_text import (  # noqa: F401
    _BPE_MERGE_CACHE,
    _CHARLM_REF,
    _DSIR_SELECT_FRAC,
    _DSIR_TARGET,
    _DOC_WORD_CACHE,
    _DSIR_W_CACHE,
    _DSIR_W_SQL,
    _FUNNEL_TOKEN_RE,
    _GOPHER_STOP_SQL,
    _MIX_RATES,
    _NBQ_MODEL_CACHE,
    _NBQ_SCORES_CACHE,
    _PII_AUG_SPARK,
    _PII_AUG_SQL,
    _SHARD_RANK_SQL,
    _TOK_COUNTS_CACHE,
    _UNIGRAM_VOCAB_CACHE,
    _WORD_TOKENS_CACHE,
    _bpe_merges_for,
    _doc_word_for,
    _dsir_weights_for,
    _nbq_model_for,
    _nbq_scores_for,
    _tok_counts_for,
    _unigram_vocab_for,
    _word_tokens_for,
    bpe_encode_tokens_q,
    bpe_merge_table_q,
    char_entropy_q,
    charlm_perplexity_q,
    classifier_gate_funnel_q,
    dataset_split_assign_q,
    dedup_token_savings_by_source_q,
    doc_length_histogram_q,
    dsir_importance_weights_q,
    dsir_select_topk_q,
    error_window_events_q,
    gopher_quality_rules_q,
    group_percentiles_exact_q,
    lang_id_q,
    length_curriculum_buckets_q,
    pack_fill_summary_q,
    pii_redaction_q,
    priority_sample_docs_q,
    quality_classifier_report_q,
    quality_classifier_scores_q,
    quality_filter_funnel_q,
    repetition_filter_q,
    sequence_packing_q,
    shard_assignment_balanced_q,
    shard_balance_summary_q,
    sketch_distinct_users_q,
    sketch_value_quantiles_q,
    source_language_mix_q,
    source_mix_temperature_q,
    source_mix_weights_q,
    source_quality_report_q,
    stratified_sample_q,
    text_quality_score_q,
    text_stats_q,
    token_count_bpe_q,
    tokenizer_fertility_by_source_q,
    unigram_encode_tokens_q,
    unigram_vocab_table_q,
    vocab_coverage_q,
    vocab_top_k_q,
)
from .section_e_similarity import (  # noqa: F401
    _ANN_DIMS,
    _ASSIGN_CACHE,
    _BRUTE_TOPK_CACHE,
    _CENTROID_CACHE,
    _CHUNK_ASSIGN_CACHE,
    _CHUNK_CENTROID_CACHE,
    _CONTAINMENT_TAU,
    _COS_SQL,
    _DUP_CLUSTERS_CACHE,
    _DUP_COS_TAU,
    _EMBDOC_PAIRS_CACHE,
    _EVAL_SOURCE,
    _GUARD_STATS_CACHE,
    _INCR_BLOOM_CACHE,
    _JACCARD_PAIRS_CACHE,
    _JACCARD_TAU,
    _MINHASH_PAIRS_CACHE,
    _MINHASH_SIGS_CACHE,
    _SEM_GROUPS_CACHE,
    _SHINGLE_CACHE,
    _SEMDEDUP_CACHE,
    _SPANS_CACHE,
    _SPAN_ANCHORS_CACHE,
    _SHINGLE_SQL,
    _SIMHASH_SIG_CACHE,
    _SUBSTR_S,
    _SUBSTR_W,
    _TFIDF_SIM_TAU,
    _TFIDF_TOPK_CACHE,
    _RECALL_SCORED_CACHE,
    _assigned_for,
    _brute_topk_for,
    _recall_scored_for,
    _centroids_for,
    _chunk_index_for,
    _dup_clusters_for,
    _embdoc_pairs_for,
    _guard_stats_for,
    _sem_groups_for,
    _spans_for,
    _span_anchors_for,
    _incr_bloom_for,
    _ivfpq_coded_for,
    _ivfpq_model_for,
    _jaccard_pairs_for,
    _lsh_buckets_for,
    _minhash_pairs_for,
    _minhash_sigs_for,
    _pq_codes_for,
    _pq_model_for,
    _semdedup_for,
    _shingles_for,
    _simhash_sigs_for,
    _tfidf_topk_for,
    ann_cosine_topk_q,
    ann_ivf_incremental_topk_q,
    chunk_ann_topk_q,
    ann_ivf_list_drift_q,
    ann_ivf_topk_q,
    ann_ivfpq_topk_q,
    ann_lsh_topk_q,
    ann_pq_topk_q,
    boilerplate_phrase_profile_q,
    cluster_quality_report_q,
    cross_split_contamination_q,
    dataset_split_assign_cluster_safe_q,
    decontamination_overlap_q,
    dedup_cluster_size_histogram_q,
    dedup_clusters_q,
    dedup_exact_q,
    dedup_provenance_rollup_q,
    substring_dup_spans_q,
    dedup_minhash_lsh_q,
    dedup_savings_report_q,
    dedup_simhash_q,
    doc_fingerprint_q,
    doc_novelty_q,
    embedding_doc_dedup_q,
    embedding_dup_pairs_q,
    embedding_norm_profile_q,
    embedding_outlier_topk_q,
    incremental_dedup_check_q,
    incremental_span_check_q,
    kmeans_doc_clusters_q,
    minhash_recall_q,
    near_dup_rate_by_source_q,
    ngram_containment_q,
    ngram_jaccard_dups_q,
    paragraph_dedup_q,
    pq_compression_stats_q,
    semdedup_prune_q,
    span_cut_rollup_q,
    split_leakage_compare_q,
    substring_dup_profile_q,
    tfidf_doc_similarity_q,
    tfidf_top_terms_q,
)
from .section_f_streaming import (  # noqa: F401
    events_windowed_counts_q,
    streaming_ivf_assign_twin_q,
    streaming_quality_score_twin_q,
    streaming_near_dedup_twin_q,
    streaming_near_dedup_verified_twin_q,
)


_SECTION_MODULES = (
    _a_sync, _b_analytics, _c_monitoring, _d_classic,
    _e_text, _e_similarity, _f_streaming,
)


def _all_caches() -> dict:
    """Every module-level ``*_CACHE`` across the section modules —
    discovered, not hand-listed, so a new memo can never silently escape
    ``clear_model_caches()`` (tests/test_cache_invalidation.py guards the
    same invariant from the outside via ``vars(registry)``)."""
    out = {}
    for mod in _SECTION_MODULES:
        for name, obj in vars(mod).items():
            if name.endswith("_CACHE"):
                out[name] = obj
    return out


def clear_model_caches() -> None:
    """Explicit invalidation hook for every cross-query memo (pair tables,
    k-means centroids, BPE merges, DSIR weights) — the embedded-session
    hard-reset API (used by tools/scale_smoke.py) regardless of
    fingerprints."""
    for cache in _all_caches().values():
        values = (
            cache._d.values() if isinstance(cache, _ModelMemo) else cache.values()
        )
        for v in values:
            if hasattr(v, "unpersist"):
                v.unpersist(blocking=False)
        cache.clear()
    from ..catalog import clear_table_cache

    clear_table_cache()


# ---------------------------------------------------------------------------
# Registration order = the driver's correctness window.
#
# The driver's CORRECTNESS gate hash-checks only the FIRST 50 entries of
# ``queries()`` (dict insertion order).  Definition order above is narrative
# (grouped by SURVEY §2 family), so we rebuild QUERIES here with an explicit
# priority order (r8 rotation): changed-this-round queries first (fresh
# hash signal), then the queries whose last driver verdict is OLDEST
# (r5-vintage, then the oldest r6-vintage) — so driver coverage cycles
# through the whole oracle-gated surface across rounds.  Rows-only ops
# (no oracle possible) must never hold a window slot.
#
# Every registered query MUST appear exactly once (asserted below), and the
# window-critical set — every name whose engine code changed this round —
# must sit at index < 50 (asserted below; replaces the stale slot-number
# comments that caused the r4 tfidf_top_terms off-by-one).
# ---------------------------------------------------------------------------

_WINDOW_ORDER = [
    # -- DRIVER WINDOW (first 50): the driver hash-checks only these --
    # r15 rotation: the 11 oracle-gated queries whose engine code path
    # changed this round first (reporting_lag broadcast; the overlap
    # two-pass revert; every consumer of the CC small-graph fast path;
    # the guard-verdict df_cap key consumers), then the r12-vintage
    # longest-unchecked fills the r14 rotation queued up
    # (budget_fallback_allocation onward) to reach slot 50.
    "reporting_lag_analysis",
    "cross_source_ngram_overlap",
    "dedup_provenance_rollup",
    "dedup_clusters",
    "dedup_cluster_size_histogram",
    "dedup_savings_report",
    "dataset_split_assign_cluster_safe",
    "split_leakage_compare",
    "incremental_dedup_check",
    "ngram_jaccard_dups",
    "ngram_containment_dups",
    "budget_fallback_allocation",
    "budget_vs_actual",
    "classifier_gate_funnel",
    "quality_classifier_scores",
    "quality_classifier_report",
    "asof_join_last_purchase",
    "bloom_filtered_entries",
    "cdc_fold_snapshot",
    "client_budget_rollup",
    "data_quality_metrics",
    "decontamination_overlap",
    "dedup_exact",
    "doc_fingerprint",
    "doc_length_histogram",
    "dup_key_audit",
    "embedding_doc_dedup",
    "incremental_sync_window",
    "json_props_profile",
    "key_skew_profile",
    "mad_outlier_profile",
    "merge_upsert",
    "missing_records",
    "multivariate_anomaly",
    "open_orders_by_day",
    "orphaned_records",
    "pack_fill_summary",
    "paginated_extract",
    "paragraph_dedup",
    "priority_sample_docs",
    "repetition_filter",
    "retention_cohorts",
    "robust_value_stats",
    "rolling_revenue_7d",
    "sales_rollup_sets",
    "scd2_status_history",
    "sequence_packing",
    "snapshot_changelog",
    "source_language_mix",
    "source_mix_temperature",
    "span_cut_rollup",
    "substring_dup_spans",
    "incremental_span_check",
    "backfill_progress",
    "boilerplate_phrase_profile",
    "bom_per_case_consumption",
    "char_entropy_score",
    "charlm_perplexity",
    "chunked_backfill_plan",
    "click_attribution",
    "column_value_drift",
    "cross_split_contamination",
    "customer_revenue_deciles",
    "dataset_split_assign",
    "embedding_dup_pairs",
    "error_window_events",
    "event_session_stats",
    "event_sessions",
    "events_windowed_counts",
    "freshness_check",
    "incremental_agg_maintenance",
    "lang_id",
    "monthly_hours_pivot",
    "near_dup_rate_by_source",
    "pii_redaction",
    "q18_large_orders",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "q6_forecast_revenue",
    "quality_filter_funnel",
    "row_count_by_day",
    "row_count_compare",
    "source_mix_weights",
    "stratified_sample_mix",
    "text_quality_score",
    "text_stats",
    "tfidf_top_terms",
    "user_activity_trend",
    "user_running_totals",
    "vocab_top_k",
    "volume_anomaly",
    "volume_anomaly_dow",
    "work_item_enriched",
    "alert_digest",
    "ann_cosine_topk",
    "stale_snapshot_audit",
    "substring_dup_profile",
    "sync_date_dedup",
    "tfidf_doc_similarity",
    "token_count_bpe",
    "view_variance_detection",
    "doc_chunk_windows",
    "zipf_slope_by_source",
    "event_interarrival_profile",
    "dup_pair_similarity_histogram",
    "dedup_latest_record",
    "dedup_token_savings_by_source",
    "distribution_drift_psi",
    "doc_novelty_profile",
    "dsir_importance_weights",
    "dsir_select_topk",
    "embedding_norm_profile",
    "embedding_outlier_topk",
    "event_lateness_profile",
    "full_sync_snapshot",
    "funnel_conversion",
    "gopher_quality_rules",
    "group_percentiles_exact",
    "length_curriculum_buckets",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_shipping",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_bracket_revenue",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_accounts",
    "q4_order_priority",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "shard_assignment_balanced",
    "shard_balance_summary",
    "source_quality_report",
    "status_flap_audit",
    "vocab_coverage_curve",
    "pipeline_alerts",
    "individual_budget_tracking",
    "contributor_utilization_rollup",
    "utilization_rollup",
    "ann_ivf_incremental_topk",
    "ann_ivf_list_drift",
    "ann_ivf_recall_curve",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "bpe_encode_tokens",
    "bpe_merge_table",
    "cluster_quality_report",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "kmeans_doc_clusters",
    "lsh_band_load_profile",
    "lsh_band_tuning_curve",
    "minhash_recall_report",
    "pq_compression_stats",
    "semdedup_prune",
    "simhash_hamming_histogram",
    "sketch_distinct_users",
    "sketch_value_quantiles",
    "streaming_ivf_assign_twin",
    "streaming_near_dedup_twin",
    "streaming_quality_score_twin",
    "streaming_near_dedup_verified_twin",
    "tokenizer_fertility_by_source",
    "unigram_encode_tokens",
    "unigram_vocab_table",
    "vocab_heavy_hitters_sketch",
    "chunk_ann_topk",
]

assert set(_WINDOW_ORDER) == set(QUERIES), (
    "registry window order out of sync: "
    f"missing={sorted(set(QUERIES) - set(_WINDOW_ORDER))} "
    f"stale={sorted(set(_WINDOW_ORDER) - set(QUERIES))}"
)

assert len(_WINDOW_ORDER) == len(set(_WINDOW_ORDER)), "duplicate names"

#: Names whose engine code is new or changed THIS round: each needs a fresh
#: driver hash verdict, so each must sit inside the 50-slot window.  Update
#: this set whenever a round touches a query's plan or oracle.
# r15: the 11 oracle-gated queries whose engine code path changed this
# round — reporting_lag_analysis (broadcast join), cross_source_ngram_
# overlap (two-pass revert), the _dup_clusters_for/_sem_groups_for
# consumers riding the CC small-graph fast path, and the guard-verdict
# consumers whose memo key gained df_cap. All hold window slots 1-11.
_WINDOW_CRITICAL = {
    "reporting_lag_analysis",
    "cross_source_ngram_overlap",
    "dedup_provenance_rollup",
    "dedup_clusters",
    "dedup_cluster_size_histogram",
    "dedup_savings_report",
    "dataset_split_assign_cluster_safe",
    "split_leakage_compare",
    "incremental_dedup_check",
    "ngram_jaccard_dups",
    "ngram_containment_dups",
}

assert all(_WINDOW_ORDER.index(n) < 50 for n in _WINDOW_CRITICAL), (
    "changed-this-round query outside the driver's 50-slot window: "
    f"{[n for n in _WINDOW_CRITICAL if _WINDOW_ORDER.index(n) >= 50]}"
)

# rows-only ops (no oracle) can never produce a hash verdict — keep them out
assert all(
    _WINDOW_ORDER.index(n) >= 50 for n in QUERIES if n not in ORACLES
), "rows-only op occupies a driver window slot"

QUERIES = {name: QUERIES[name] for name in _WINDOW_ORDER}
ORACLES = {name: ORACLES[name] for name in _WINDOW_ORDER if name in ORACLES}

# ---------------------------------------------------------------------------
# Cross-query memo provenance (introspected, not hand-maintained).
#
# bench.py's best-of-N protocol structurally under-counts queries that
# consume the fingerprint memos above: the shared build cost (shingle
# index, tok counts, k-means model, ...) lands in the FIRST rep of the
# FIRST consumer and every recorded best is a warm-memo time. So the
# bench sidecar flags exactly which queries ride which memo — derived
# from each registered function's source at import (transitively: e.g.
# _jaccard_pairs_for itself builds on _shingles_for), so a new consumer
# can never silently escape the flag.
# ---------------------------------------------------------------------------

_MEMO_HELPERS = (
    "_semdedup_for",
    "_spans_for",
    "_span_anchors_for",
    "_shingles_for",
    "_simhash_sigs_for",
    "_guard_stats_for",
    "_jaccard_pairs_for",
    "_dup_clusters_for",
    "_embdoc_pairs_for",
    "_sem_groups_for",
    "_minhash_pairs_for",
    "_minhash_sigs_for",
    "_tok_counts_for",
    "_doc_word_for",
    "_nbq_scores_for",
    "_nbq_model_for",
    "_word_tokens_for",
    "_centroids_for",
    "_chunk_index_for",
    "_assigned_for",
    "_brute_topk_for",
    "_recall_scored_for",
    "_bpe_merges_for",
    "_dsir_weights_for",
    "_unigram_vocab_for",
    "_alerts_for",
    "_budget_rollup_for",
    "_incr_bloom_for",
    "_tfidf_topk_for",
    "_lsh_buckets_for",
    "_pq_model_for",
    "_pq_codes_for",
    "_ivfpq_model_for",
    "_ivfpq_coded_for",
)

def _memo_helpers_called(fn) -> frozenset:
    """Memo helpers a function's CODE actually calls.

    AST-based (ast.Call nodes only), so a helper merely MENTIONED in a
    docstring or comment — e.g. a query documenting why it does NOT ride
    ``_shingles_for(...)`` — is never falsely flagged as a memo consumer
    (a false flag would discount that query's genuine bench wins in
    bench_details' memo accounting)."""
    import ast
    import inspect
    import textwrap

    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    except (OSError, TypeError, SyntaxError):  # pragma: no cover
        return frozenset()
    called = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            f = node.func
            if isinstance(f, ast.Name):
                called.add(f.id)
            elif isinstance(f, ast.Attribute):
                called.add(f.attr)
    return frozenset(h for h in _MEMO_HELPERS if h in called)

_HELPER_DEPS = {
    h: _memo_helpers_called(globals()[h]) - {h} for h in _MEMO_HELPERS
}

def _memo_closure(helpers) -> frozenset:
    out, frontier = set(helpers), list(helpers)
    while frontier:
        for dep in _HELPER_DEPS[frontier.pop()]:
            if dep not in out:
                out.add(dep)
                frontier.append(dep)
    return frozenset(out)

#: query name -> sorted tuple of memo helpers its plan consumes
MEMO_CONSUMERS: dict[str, tuple[str, ...]] = {
    name: tuple(sorted(_memo_closure(_memo_helpers_called(fn))))
    for name, fn in QUERIES.items()
    if _memo_helpers_called(fn)
}
