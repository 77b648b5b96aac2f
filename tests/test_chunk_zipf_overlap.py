"""Semantics tests for the r11 additions: RAG chunk windows, per-source
Zipf fit, the cross-source shingle-overlap matrix, and the native
session_window batch twin's inclusive-gap merge rule.

(The sf0.001 DuckDB hash gate for each lives in test_registry_oracle —
these pin the operator semantics on constructed corpora instead.)
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest

from snowflake_to_bq_pipeline_spark.operators import neardup
from snowflake_to_bq_pipeline_spark.operators import text as text_ops


def _doc(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_chunk_windows_overlap_and_tail(spark):
    words = [f"w{i}" for i in range(50)]
    df = _doc(spark, [(1, " ".join(words), "s")])
    out = {
        r["start_word"]: r
        for r in text_ops.chunk_windows(df, size=32, stride=24).collect()
    }
    assert sorted(out) == [0, 24, 48]
    assert out[0]["n_words"] == 32 and out[24]["n_words"] == 26
    assert out[48]["n_words"] == 2
    assert out[24]["chunk_idx"] == 1
    # content hash is over the joined word window
    exp = hashlib.md5(" ".join(words[24:56]).encode()).hexdigest()
    assert out[24]["chunk_md5"] == exp
    # overlap: consecutive chunks share size - stride = 8 words
    assert words[24 : 24 + 8] == words[24:32]


def test_chunk_windows_short_doc_single_chunk(spark):
    df = _doc(spark, [(7, "a b c", "s")])
    rows = text_ops.chunk_windows(df, size=32, stride=24).collect()
    assert len(rows) == 1
    assert rows[0]["n_words"] == 3 and rows[0]["start_word"] == 0


def test_chunk_windows_rejects_bad_params(spark):
    df = _doc(spark, [(1, "a b", "s")])
    with pytest.raises(ValueError):
        text_ops.chunk_windows(df, size=0)
    with pytest.raises(ValueError):
        text_ops.chunk_windows(df, stride=-1)


def test_zipf_slope_matches_numpy_fit(spark):
    # a source whose token frequencies are exactly zipfian (freq = 600/r)
    # must fit slope ~ -1; verify against the closed form computed in
    # plain Python on the same (rank, freq) points.
    toks = []
    for r in range(1, 31):
        toks.extend([f"t{r:02d}"] * (600 // r))
    df = _doc(spark, [(1, " ".join(toks), "zipfy")])
    row = text_ops.zipf_slope_by_source(df, top_n=30).collect()[0]
    xs = [math.log(r) for r in range(1, 31)]
    ys = [math.log(600 // r) for r in range(1, 31)]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row["n_terms"] == 30 and row["top_freq"] == 600
    assert row["zipf_slope"] == pytest.approx(slope, abs=1e-4)
    assert -1.1 < row["zipf_slope"] < -0.9


def test_source_ngram_overlap_counts_by_hand(spark):
    # sources A and B share exactly the shingles of "x y z w" (2 shingles);
    # A additionally has "p q r" (1), B has "u v t" (1) -> sizes 3/3,
    # shared 2, jaccard 2/(3+3-2) = 0.5
    df = _doc(
        spark,
        [
            (1, "x y z w", "A"),
            (2, "p q r", "A"),
            (3, "x y z w", "B"),
            (4, "u v t", "B"),
        ],
    )
    rows = neardup.source_ngram_overlap(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"]) == ("A", "B")
    assert r["shared_shingles"] == 2
    assert r["size_a"] == 3 and r["size_b"] == 3
    assert r["jaccard"] == pytest.approx(0.5)


def test_source_ngram_overlap_rejects_mismatched_shingle_table(spark):
    df = _doc(spark, [(1, "a b c d", "A")])
    wrong = neardup.hashed_shingles(df, k=5)
    with pytest.raises(ValueError):
        neardup.source_ngram_overlap(df, k=3, sh=wrong)


def test_session_window_gap_is_inclusive(spark):
    # two events exactly GAP apart merge (probed Spark semantics the
    # session_window_stats oracle mirrors); GAP + 1us does not.
    from snowflake_to_bq_pipeline_spark.streaming import sessions

    base = dt.datetime(2026, 1, 1)
    gap = dt.timedelta(minutes=sessions.GAP_MIN)
    ev = spark.createDataFrame(
        [
            (1, base, 1.0),
            (1, base + gap, 1.0),
            (2, base, 1.0),
            (2, base + gap + dt.timedelta(microseconds=1), 1.0),
        ],
        "user_id int, ts timestamp, value double",
    )
    out = sessions.session_stats_batch(ev).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 1 and by_user[1][0]["n_events"] == 2
    assert by_user[1][0]["session_end"] == base + gap + gap
    assert len(by_user[2]) == 2


def test_interarrival_profile_known_gaps(spark):
    from snowflake_to_bq_pipeline_spark.operators import quality

    base = dt.datetime(2026, 1, 1)
    s = dt.timedelta(seconds=1)
    ev = spark.createDataFrame(
        [
            # type a: gaps 10s, 20s (plus a duplicate ts -> 0s gap)
            ("a", base), ("a", base + 10 * s), ("a", base + 10 * s),
            ("a", base + 30 * s),
            # type b: single event -> no gaps, excluded entirely
            ("b", base),
        ],
        "event_type string, ts timestamp",
    )
    rows = {r["event_type"]: r for r in quality.interarrival_profile(ev).collect()}
    assert set(rows) == {"a"}
    r = rows["a"]
    assert r["n_gaps"] == 3
    assert r["min_gap_s"] == 0.0 and r["max_gap_s"] == 20.0
    assert r["mean_gap_s"] == pytest.approx(10.0)
    assert r["p50_gap_s"] == pytest.approx(10.0)


def test_lsh_band_load_profile_accounting(spark):
    from snowflake_to_bq_pipeline_spark.operators.neardup import (
        N_BANDS,
        lsh_band_load_profile,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    df = _doc(
        spark,
        [(i, text, "s") for i in range(4)]  # 4 identical docs
        + [(10, "completely different words here for the second corpus", "s")],
    )
    prof = lsh_band_load_profile(df).collect()
    by_band = {}
    for r in prof:
        by_band.setdefault(r["band"], []).append(r)
    assert set(by_band) == set(range(N_BANDS))
    for band, rows in by_band.items():
        # every doc lands in exactly one bucket per band
        assert sum(r["n_buckets"] * r["bucket_size"] for r in rows) == 5
        # identical docs share identical signatures, hence one 4-doc
        # bucket per band implying C(4,2)=6 candidate pairs
        fat = [r for r in rows if r["bucket_size"] == 4]
        assert len(fat) == 1 and fat[0]["candidate_pairs"] == 6
        for r in rows:
            sz = r["bucket_size"]
            assert r["candidate_pairs"] == r["n_buckets"] * sz * (sz - 1) // 2


def test_cms_heavy_hitters_superset_and_overestimate_only(spark):
    from snowflake_to_bq_pipeline_spark.operators import quality

    # corpus: t1 x 500, t2 x 300, t3 x 40, long tail of 200 singletons;
    # threshold 2% of 1040+200 = 24.8 -> true heavies {t1, t2, t3}
    toks = ["t1"] * 500 + ["t2"] * 300 + ["t3"] * 40 + [
        f"tail{i}" for i in range(200)
    ]
    rows = [(i, t) for i, t in enumerate(toks)]
    tok_counts = spark.createDataFrame(
        [(d, t, 1) for d, t in rows], "doc_id long, token string, term_count long"
    )
    out = {r["token"]: r for r in quality.cms_heavy_hitters(
        tok_counts, threshold_share=0.02
    ).collect()}
    total = len(toks)
    threshold = int(total * 0.02)
    # recall 1.0: every true heavy hitter survives (CMS never underestimates)
    for t, exact in (("t1", 500), ("t2", 300), ("t3", 40)):
        assert t in out, t
        r = out[t]
        assert r["exact_count"] == exact
        assert r["est_count"] >= exact  # overestimate-only
        assert r["is_true_heavy"] is True
        assert r["threshold_count"] == threshold
    # every output row is overestimate-only and correctly adjudicated
    for r in out.values():
        assert r["overestimate"] >= 0
        assert r["is_true_heavy"] == (r["exact_count"] >= threshold)
    # the sketch is 4x1024 over ~204 distinct tokens: collisions are few,
    # so false positives stay a small minority of the output
    fp = [r for r in out.values() if not r["is_true_heavy"]]
    assert len(fp) <= len(out) // 2


def test_cms_heavy_hitters_rejects_bad_params(spark):
    from snowflake_to_bq_pipeline_spark.operators import quality

    tok = spark.createDataFrame(
        [(1, "a", 1)], "doc_id long, token string, term_count long"
    )
    with pytest.raises(ValueError):
        quality.cms_heavy_hitters(tok, depth=0)


def test_pair_similarity_histogram_buckets(spark):
    from snowflake_to_bq_pipeline_spark.operators import neardup as nd

    pairs = spark.createDataFrame(
        [(1, 2, 0.62), (3, 4, 0.64), (5, 6, 0.81), (7, 8, 1.0)],
        "doc_a long, doc_b long, jaccard double",
    )
    rows = {r["bucket_idx"]: r for r in nd.pair_similarity_histogram(pairs).collect()}
    # 0.62/0.64 -> bucket 12, 0.81 -> 16, 1.0 -> 20
    assert {k: rows[k]["n_pairs"] for k in sorted(rows)} == {12: 2, 16: 1, 20: 1}
    assert rows[12]["bucket_lo"] == 0.6
    assert rows[12]["pair_share"] == pytest.approx(0.5)
    assert sum(r["pair_share"] for r in rows.values()) == pytest.approx(1.0)


def test_lsh_band_tuning_curve_nesting_monotone(spark):
    from snowflake_to_bq_pipeline_spark.operators import neardup as nd

    text = "the quick brown fox jumps over the lazy dog again and again"
    df = _doc(
        spark,
        [(i, text, "s") for i in range(3)]
        + [(9, "a wholly different set of words for the control doc", "s")],
    )
    rows = {r["n_bands"]: r for r in nd.lsh_band_tuning_curve(df).collect()}
    assert set(rows) == {4, 8, 16, 32}
    for b, r in rows.items():
        assert r["rows_per_band"] == 32 // b
        expected = (1.0 / b) ** (1.0 / (32 // b))
        assert r["s_curve_threshold"] == pytest.approx(expected, abs=1e-6)
        # 3 identical docs collide on every band: C(3,2)=3 rows per band
        assert r["candidate_pair_rows"] >= 3 * b
    # configs nest (a coarse-band collision implies collisions in all its
    # sub-bands), so candidate rows are nondecreasing in band count
    counts = [rows[b]["candidate_pair_rows"] for b in (4, 8, 16, 32)]
    assert counts == sorted(counts)
    # more bands -> lower S-curve midpoint (easier to become a candidate)
    curve = [rows[b]["s_curve_threshold"] for b in (4, 8, 16, 32)]
    assert curve == sorted(curve, reverse=True)


def test_lsh_band_tuning_curve_rejects_bad_band_count(spark):
    from snowflake_to_bq_pipeline_spark.operators import neardup as nd

    df = _doc(spark, [(1, "a b c d e", "s")])
    with pytest.raises(ValueError):
        nd.lsh_band_tuning_curve(df, band_counts=(5,))


def test_simhash_hamming_histogram_accounting(spark):
    from snowflake_to_bq_pipeline_spark.operators import neardup as nd

    text = "the quick brown fox jumps over the lazy dog again and again"
    df = _doc(
        spark,
        [(1, text, "s"), (2, text, "s"),
         (3, "a wholly different set of words for the control document", "s")],
    )
    rows = sorted(
        nd.simhash_hamming_histogram(df).collect(),
        key=lambda r: r["hamming_distance"],
    )
    # identical docs 1,2 -> distance-0 bucket exists
    assert rows[0]["hamming_distance"] == 0 and rows[0]["n_pairs"] >= 1
    # cumulative columns are monotone and end at share 1.0
    cums = [r["cum_pairs"] for r in rows]
    assert cums == sorted(cums)
    assert rows[-1]["cum_share"] == pytest.approx(1.0)
    assert all(0 <= r["hamming_distance"] <= 64 for r in rows)
    # the pigeonhole-completeness boundary travels WITH the data
    # (advice r11): rows at distance <= SIMHASH_CHUNKS-1 are population-
    # complete, the rest profile band candidates only
    for r in rows:
        assert r["is_complete"] == (
            r["hamming_distance"] <= nd.SIMHASH_CHUNKS - 1
        )


def test_ivf_recall_curve_monotone_and_exact_at_full_probe(spark, sf_dir):
    from pyspark.sql import functions as F

    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    rows = {r["n_probe"]: r for r in similarity.ivf_recall_curve(
        emb, F.col("vec_id") < 10, k=5, n_centroids=8, probes=(1, 2, 4, 8)
    ).collect()}
    assert set(rows) == {1, 2, 4, 8}
    recalls = [rows[p]["recall_at_k"] for p in (1, 2, 4, 8)]
    assert recalls == sorted(recalls)  # more probes never hurt
    full = rows[8]
    assert full["recall_at_k"] == pytest.approx(1.0)  # full probe = brute force
    assert full["hits"] == full["possible"]
    assert rows[1]["lists_scanned_share"] == pytest.approx(1 / 8)
    for r in rows.values():
        assert r["n_queries"] > 0 and r["possible"] == r["n_queries"] * 5


def test_ivf_recall_curve_rejects_bad_probes(spark, sf_dir):
    from pyspark.sql import functions as F

    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError):
        similarity.ivf_recall_curve(
            emb, F.col("vec_id") < 10, n_centroids=8, probes=(0, 8)
        )
    with pytest.raises(ValueError):
        similarity.ivf_recall_curve(
            emb, F.col("vec_id") < 10, n_centroids=8, probes=(16,)
        )


def test_ivf_recall_curve_clamps_overtall_ladder(spark, sf_dir):
    """Advice r11: rungs above the trained list count are clamped away
    (a model that dropped an empty cluster must not hard-fail a standing
    tuning query), with the full-probe rung appended so the recall-1.0
    row survives."""
    from pyspark.sql import functions as F

    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    rows = similarity.ivf_recall_curve(
        emb, F.col("vec_id") < 10, k=5, n_centroids=8, probes=(1, 2, 32)
    ).collect()
    ns = sorted(r["n_probe"] for r in rows)
    assert 32 not in ns and ns[:2] == [1, 2]
    full = max(rows, key=lambda r: r["n_probe"])
    assert full["recall_at_k"] == pytest.approx(1.0)
    assert full["lists_scanned_share"] == pytest.approx(1.0)


def test_cms_heavy_hitters_rejects_unbounded_sketch(spark):
    """Advice r11: depth*width is capped so the driver-side sketch and
    its constant-folded probe literals stay O(model)."""
    from snowflake_to_bq_pipeline_spark.operators import quality

    tok = spark.createDataFrame(
        [(1, "big", 100)], "doc_id long, token string, term_count long"
    )
    with pytest.raises(ValueError, match="CMS_MAX_CELLS"):
        quality.cms_heavy_hitters(tok, depth=4, width=1 << 22)


def test_cms_heavy_hitters_depth_one_works(spark):
    from snowflake_to_bq_pipeline_spark.operators import quality

    tok = spark.createDataFrame(
        [(1, "big", 100), (2, "small", 1)],
        "doc_id long, token string, term_count long",
    )
    out = {r["token"]: r for r in quality.cms_heavy_hitters(
        tok, threshold_share=0.5, depth=1
    ).collect()}
    assert "big" in out and out["big"]["exact_count"] == 100
    assert out["big"]["est_count"] >= 100


def test_minhash_sig_table_provenance_enforced(spark):
    from snowflake_to_bq_pipeline_spark.operators import neardup as nd

    df = _doc(spark, [(1, "a b c d e f", "s"), (2, "a b c d e f", "s")])
    sigs_k5 = nd.minhash_sig_table(nd.hashed_shingles(df, k=5))
    with pytest.raises(ValueError):
        nd.minhash_lsh_pairs(df, 0.6, k=3, sigs=sigs_k5)
    with pytest.raises(ValueError):
        nd.lsh_band_tuning_curve(df, k=3, sigs=sigs_k5)
    # matching provenance passes
    sigs_k3 = nd.minhash_sig_table(nd.hashed_shingles(df, k=3))
    assert nd.minhash_lsh_pairs(df, 0.6, k=3, sigs=sigs_k3).count() >= 1
