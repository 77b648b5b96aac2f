"""Quality gates for the approximate near-dup operators: the LSH candidate
path must recover (almost) everything the exact shingle-join finds."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_precomputed_shingle_table_guard(spark, sf_dir):
    """A precomputed shingle table built with a mismatched k or text
    column must fail LOUDLY in every consumer that accepts one — a
    silent mismatch would return wrong pair/novelty results."""
    import pytest

    docs = load_table(spark, sf_dir, "documents").limit(20)
    sh_k5 = neardup.hashed_shingles(docs, k=5)

    for call in (
        lambda: neardup.ngram_jaccard_pairs(docs, 0.6, k=3, sh=sh_k5),
        lambda: neardup.ngram_containment_pairs(docs, 0.8, k=3, sh=sh_k5),
        lambda: neardup.doc_novelty(docs, k=3, sh=sh_k5),
        lambda: neardup.simhash_pairs(docs, sh=sh_k5),
        lambda: neardup.incremental_neardup_check(
            docs, docs, 0.6, k=3, sh_corpus=sh_k5
        ),
        lambda: neardup.incremental_neardup_check(
            docs, docs, 0.6, k=3, sh_incoming=sh_k5
        ),
    ):
        with pytest.raises(ValueError, match="k=5"):
            call()

    # wrong source column is caught too
    sh_other_col = neardup.hashed_shingles(
        docs.withColumn("other", docs.text), text_col="other"
    )
    with pytest.raises(ValueError, match="text_col"):
        neardup.ngram_jaccard_pairs(docs, 0.6, sh=sh_other_col)

    # shape check: a frame without (doc_id, __h) is rejected outright
    with pytest.raises(ValueError, match="doc_id"):
        neardup.doc_novelty(docs, sh=docs.select("text"))

    # a MATCHING table passes and reproduces the self-built result;
    # metadata survives the filter/select lineage the registry applies
    sh_ok = neardup.hashed_shingles(docs).filter("doc_id >= 0")
    got = _pairs(neardup.ngram_jaccard_pairs(docs, 0.6, sh=sh_ok))
    want = _pairs(neardup.ngram_jaccard_pairs(docs, 0.6))
    assert got == want


def _hot_phrase_docs(spark, sf_dir):
    """sf0.001 documents with a boilerplate stop-phrase appended to half
    the corpus — one shingle's df jumps to ~50% of docs (the hot-shingle
    hazard the df-cap guard exists for)."""
    from pyspark.sql import functions as F

    return load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("text"), F.lit(" zzz stop phrase")),
        ).otherwise(F.col("text")),
    )


def test_df_guard_jaccard_output_identical(spark, sf_dir):
    """The hot-shingle guard must be invisible in the OUTPUT: forcing it
    with a tiny cap (df_cap=2 prunes nearly every shingle from candidate
    generation) reproduces the naive self-join's pairs exactly — the
    exactness-preserving-prune contract."""
    docs = _hot_phrase_docs(spark, sf_dir)
    for tau in (0.4, 0.6):
        naive = {
            (r.doc_a, r.doc_b, r.intersection_size, r.size_a, r.size_b, r.jaccard)
            for r in neardup.ngram_jaccard_pairs(
                docs, tau, df_cap=10**9
            ).collect()
        }
        guarded = {
            (r.doc_a, r.doc_b, r.intersection_size, r.size_a, r.size_b, r.jaccard)
            for r in neardup.ngram_jaccard_pairs(docs, tau, df_cap=2).collect()
        }
        assert guarded == naive
        assert naive, "hot-phrase corpus should still contain true pairs"


def test_df_guard_containment_output_identical(spark, sf_dir):
    docs = _hot_phrase_docs(spark, sf_dir)
    key = lambda r: (
        r.doc_a, r.doc_b, r.intersection_size, r.size_a, r.size_b,
        r.containment_a, r.containment_b,
    )
    naive = {
        key(r)
        for r in neardup.ngram_containment_pairs(
            docs, 0.6, df_cap=10**9
        ).collect()
    }
    guarded = {
        key(r)
        for r in neardup.ngram_containment_pairs(docs, 0.6, df_cap=2).collect()
    }
    assert guarded == naive and naive


def test_df_guard_incremental_output_identical(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = _hot_phrase_docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    key = lambda r: (r.doc_id, r.best_match_id, r.best_jaccard, r.is_duplicate)
    naive = {
        key(r)
        for r in neardup.incremental_neardup_check(
            corpus, incoming, 0.6, df_cap=10**9
        ).collect()
    }
    guarded = {
        key(r)
        for r in neardup.incremental_neardup_check(
            corpus, incoming, 0.6, df_cap=2
        ).collect()
    }
    assert guarded == naive and naive


def test_guard_stats_injected_equals_probed(spark, sf_dir):
    """Injecting the probe_guard_stats verdict (the standing-index memo
    path) must be invisible in the OUTPUT, both when the guard fires
    (hot corpus, tiny cap) and when it stays off (clean corpus): the
    injected branch skips the stats JOB, never changes the plan the
    verdict selects."""
    from pyspark.sql import functions as F

    # firing case: hot corpus + df_cap=2
    docs = _hot_phrase_docs(spark, sf_dir)
    sh = neardup.hashed_shingles(docs)
    verdict = neardup.probe_guard_stats(sh, df_cap=2)
    assert verdict[2] is True  # the hot phrase must trip the guard
    for op, extra_cols in (
        (neardup.ngram_jaccard_pairs, ("jaccard",)),
        (neardup.ngram_containment_pairs, ("containment_a", "containment_b")),
    ):
        key = lambda r: (
            r.doc_a, r.doc_b, r.intersection_size, r.size_a, r.size_b,
        ) + tuple(getattr(r, c) for c in extra_cols)
        probed = {key(r) for r in op(docs, 0.6, df_cap=2).collect()}
        injected = {
            key(r)
            for r in op(docs, 0.6, df_cap=2, guard_stats=verdict).collect()
        }
        assert injected == probed and probed
    # incremental form: verdict probed over the CORPUS-side slice
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    cv = neardup.probe_guard_stats(
        neardup.hashed_shingles(corpus), df_cap=2
    )
    ikey = lambda r: (r.doc_id, r.best_match_id, r.best_jaccard, r.is_duplicate)
    probed = {
        ikey(r)
        for r in neardup.incremental_neardup_check(
            corpus, incoming, 0.6, df_cap=2
        ).collect()
    }
    injected = {
        ikey(r)
        for r in neardup.incremental_neardup_check(
            corpus, incoming, 0.6, df_cap=2, guard_stats=cv
        ).collect()
    }
    assert injected == probed and probed
    # non-firing case: clean corpus at the default cap
    clean = load_table(spark, sf_dir, "documents")
    off = neardup.probe_guard_stats(neardup.hashed_shingles(clean))
    assert off[2] is False
    a = {
        (r.doc_a, r.doc_b)
        for r in neardup.ngram_jaccard_pairs(clean, 0.6).collect()
    }
    b = {
        (r.doc_a, r.doc_b)
        for r in neardup.ngram_jaccard_pairs(
            clean, 0.6, guard_stats=off
        ).collect()
    }
    assert a == b


def test_guard_stats_mismatched_injection_degrades_to_exact(spark, sf_dir):
    """Negative path for the injection contract (r15, ADVICE): a verdict
    whose n_over_thr UNDERCOUNTS the live index's hot set (e.g. probed
    over a different slice) must not silently shrink the exemption and
    drop hot-only pairs — the guard detects len(hot_hashes) > n_over_thr
    and falls back to the exact naive plan, so output stays identical to
    the honest run."""
    docs = _hot_phrase_docs(spark, sf_dir)
    honest = neardup.probe_guard_stats(
        neardup.hashed_shingles(docs), df_cap=2
    )
    assert honest[2] is True and honest[1] >= 1
    # lie: guard fires but "zero" shingles exceed the min cap
    lie = (honest[0], 0, True)
    key = lambda r: (
        r.doc_a, r.doc_b, r.intersection_size, r.size_a, r.size_b, r.jaccard
    )
    truth = {
        key(r)
        for r in neardup.ngram_jaccard_pairs(docs, 0.6, df_cap=2).collect()
    }
    with_lie = {
        key(r)
        for r in neardup.ngram_jaccard_pairs(
            docs, 0.6, df_cap=2, guard_stats=lie
        ).collect()
    }
    assert with_lie == truth and truth


def test_guard_stats_registry_memo(spark, sf_dir):
    """_guard_stats_for memoizes the verdict per (snapshot, slice) and
    clear_model_caches drops it; the memoized verdict equals a direct
    operator-level probe of the same slice."""
    from pyspark.sql import functions as F

    from snowflake_to_bq_pipeline_spark import registry

    registry.clear_model_caches()
    v1 = registry._guard_stats_for(spark, sf_dir)
    assert v1 == registry._guard_stats_for(spark, sf_dir)  # warm hit
    assert len(registry._GUARD_STATS_CACHE) >= 1
    direct = neardup.probe_guard_stats(registry._shingles_for(spark, sf_dir))
    assert v1 == direct
    vc = registry._guard_stats_for(spark, sf_dir, corpus_only=True)
    direct_c = neardup.probe_guard_stats(
        registry._shingles_for(spark, sf_dir).filter(
            F.col("doc_id") % 5 != 0
        )
    )
    assert vc == direct_c
    registry.clear_model_caches()
    assert len(registry._GUARD_STATS_CACHE) == 0


def test_df_guard_tiny_doc_exemption_catches_hot_only_pair(spark):
    """Adversarial case for the exemption rule: two tiny docs whose ONLY
    overlap is the hot shingle itself. Pruning without the size
    exemption would lose the pair; the guard must keep it."""
    rows = [(i, "zzz stop phrase") for i in range(10)]  # identical tiny docs
    rows += [(100 + i, f"unique text number {i} for doc {i} filler") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in neardup.ngram_jaccard_pairs(docs, 0.9, df_cap=2).collect()
    }
    want = {(a, b) for a in range(10) for b in range(10) if a < b}
    assert got == want


def test_df_guard_stays_off_on_clean_and_empty_corpus(spark, sf_dir):
    """The natural corpus (max shingle df 25 at sf0.1, 7 at sf0.01) must
    ride the simple self-join — the guard's collect_set transport is the
    fingerprint of the guarded plan, so its absence proves the fast
    path. An empty corpus takes the fast path too (max_df is NULL)."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        neardup.ngram_jaccard_pairs(docs, 0.6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "collect_set" not in plan
    guarded_plan = (
        neardup.ngram_jaccard_pairs(docs, 0.6, df_cap=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "collect_set" in guarded_plan
    empty = docs.limit(0)
    assert neardup.ngram_jaccard_pairs(empty, 0.6).count() == 0


def test_df_guard_containment_small_side_exemption(spark):
    """Containment's hot-only hazard is ASYMMETRIC: a tiny doc that IS
    the boilerplate phrase is fully contained in every big doc carrying
    the phrase, sharing only the hot shingle. The exemption must keep
    exactly those pairs and nothing else."""
    rows = [(1, "zzz stop phrase")]
    rows += [
        (100 + i, f"alpha{i} beta{i} gamma{i} delta{i} zzz stop phrase")
        for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    key = lambda r: (r.doc_a, r.doc_b, r.intersection_size,
                     r.containment_a, r.containment_b)
    naive = {
        key(r)
        for r in neardup.ngram_containment_pairs(
            docs, 0.9, df_cap=10**9
        ).collect()
    }
    guarded = {
        key(r)
        for r in neardup.ngram_containment_pairs(docs, 0.9, df_cap=2).collect()
    }
    assert guarded == naive
    # the tiny doc pairs with every phrase-carrying big doc, nothing else
    assert {(a, b) for a, b, *_ in guarded} == {(1, 100 + i) for i in range(10)}
    assert all(ca == 1.0 for _a, _b, _i, ca, _cb in guarded)


def test_df_guard_declines_beyond_hot_list_max(spark, sf_dir, monkeypatch):
    """Past _HOT_LIST_MAX distinct hot shingles the guard declines
    (returns the naive plan) rather than shipping an unbounded isin
    list — output must be the plain self-join's, plan must carry no
    collect_set transport."""
    from snowflake_to_bq_pipeline_spark.operators import neardup as nd

    monkeypatch.setattr(nd, "_HOT_LIST_MAX", 0)
    docs = _hot_phrase_docs(spark, sf_dir)
    df = nd.ngram_jaccard_pairs(docs, 0.6, df_cap=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_set" not in plan
    got = _pairs(df)
    monkeypatch.setattr(nd, "_HOT_LIST_MAX", 10_000)
    want = _pairs(nd.ngram_jaccard_pairs(docs, 0.6, df_cap=10**9))
    assert got == want


def test_df_guard_nonpositive_threshold_falls_back_to_naive(spark):
    """threshold<=0 makes the exemption size n_hot/threshold undefined
    (or, for negatives, inverted) — the guard must decline and the naive
    plan, which accepts threshold<=0 without crashing, must serve the
    result even on a hot corpus that would normally fire the guard."""
    rows = [(i, "zzz stop phrase shared by all") for i in range(10)]
    rows += [(100 + i, f"unique text number {i} for doc {i} pad") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for thr in (0.0, -0.5):
        got = _pairs(neardup.ngram_jaccard_pairs(docs, thr, df_cap=2))
        want = _pairs(neardup.ngram_jaccard_pairs(docs, thr, df_cap=10**9))
        assert got == want
        got_c = _pairs(neardup.ngram_containment_pairs(docs, thr, df_cap=2))
        want_c = _pairs(neardup.ngram_containment_pairs(docs, thr, df_cap=10**9))
        assert got_c == want_c
    corpus = docs.filter("doc_id < 100")
    incoming = docs.filter("doc_id >= 100")
    inc = neardup.incremental_neardup_check(corpus, incoming, 0.0, df_cap=2)
    assert inc.count() == 5  # one row per incoming doc, no crash


def test_bloom_prefilter_incremental_output_identical(spark, sf_dir):
    """The corpus Bloom prefilter must be invisible in the OUTPUT on the
    adversarial hot-phrase corpus — no false negatives by construction,
    so the pruned probe join re-scores to exactly the unfiltered plan's
    rows. Checked both with the naive plan and composed with the
    df-cap hot-shingle guard (the two prunes stack), and with a
    deliberately TINY bitmap (high false-positive rate — the prune
    degrades to a no-op, never to a wrong answer)."""
    from pyspark.sql import functions as F

    docs = _hot_phrase_docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    key = lambda r: (r.doc_id, r.best_match_id, r.best_jaccard, r.is_duplicate)
    plain = {
        key(r)
        for r in neardup.incremental_neardup_check(
            corpus, incoming, 0.6
        ).collect()
    }
    assert plain
    for df_cap, bits in ((None, 1 << 20), (2, 1 << 20), (None, 256)):
        got = {
            key(r)
            for r in neardup.incremental_neardup_check(
                corpus, incoming, 0.6, df_cap=df_cap, bloom_bits=bits
            ).collect()
        }
        assert got == plain, (df_cap, bits)


def test_bloom_prefilter_actually_prunes(spark):
    """On disjoint-vocabulary incoming docs the bitmap removes every
    probe row (sanity that the filter is in the plan, not a no-op)."""
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [(5, "uno dos tres cuatro cinco seis")],
        "doc_id long, text string",
    )
    out = neardup.incremental_neardup_check(
        corpus, incoming, 0.1, bloom_bits=1 << 20
    ).collect()
    assert len(out) == 1
    assert out[0].best_match_id is None and not out[0].is_duplicate


def test_simhash_pairs_precomputed_signature_path_identical(spark, sf_dir):
    """The per-snapshot signature memo path (sig=) must return exactly
    the pairs of the self-built path — the memo is the SAME aggregation
    persisted once, so sharing it across the simhash family is exact."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    sh = neardup.hashed_shingles(docs, k=3)
    sig = neardup.simhash_signatures(
        sh.select("doc_id", F.col("__h").alias("th"))
    )

    def key(df):
        return sorted(
            (r["doc_a"], r["doc_b"], r["hamming_distance"])
            for r in df.collect()
        )

    assert key(neardup.simhash_pairs(docs, sig=sig)) == key(
        neardup.simhash_pairs(docs)
    )


def _naive_maximal_spans(texts: dict[int, str], min_len: int) -> set[tuple]:
    """Quadratic per-diagonal reference for substring_dup_spans: for each
    ordered doc pair and each alignment offset, scan maximal runs of
    matching characters; report runs >= min_len with 1-indexed starts."""
    out = set()
    ids = sorted(texts)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ta, tb = texts[a], texts[b]
            for diag in range(-(len(tb) - 1), len(ta)):
                lo = max(0, diag)
                hi = min(len(ta), len(tb) + diag)
                run, start = 0, None
                for i in range(lo, hi):
                    if ta[i] == tb[i - diag]:
                        if run == 0:
                            start = i
                        run += 1
                    else:
                        if run >= min_len:
                            out.add((a, b, start + 1, start - diag + 1, run))
                        run = 0
                if run >= min_len:
                    out.add((a, b, start + 1, start - diag + 1, run))
    return out


def _span_rows(df) -> set[tuple]:
    return {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_len)
        for r in df.collect()
    }


def test_substring_dup_spans_equals_naive_reference(spark):
    """Seed-and-extend must reproduce the quadratic per-diagonal scan
    EXACTLY for spans at/above the winnowing guarantee — including
    repeats NOT aligned to any stride grid (the case the windowed
    profile structurally misses)."""
    import random

    rng = random.Random(13)
    shared1 = "".join(rng.choice("abcdefg ") for _ in range(65))
    shared2 = "".join(rng.choice("hijklmn ") for _ in range(48))
    def noise(n):
        return "".join(rng.choice("opqrstuvwxyz") for _ in range(n))

    texts = {
        # shared1 at misaligned offsets (7 vs 30), shared2 at (88 vs 3)
        1: noise(7) + shared1 + noise(16) + shared2 + noise(12),
        2: noise(30) + shared1 + noise(5),
        3: noise(3) + shared2 + noise(40),
        4: noise(120),                       # no dup content
    }
    texts[5] = texts[2]                      # exact dup of doc 2
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = _span_rows(neardup.substring_dup_spans(docs))
    want = _naive_maximal_spans(texts, neardup.SPAN_MIN_LEN)
    assert want, "test corpus must contain guaranteed-length spans"
    assert got == want
    # the full-length exact-dup span (docs 2-5) must be present
    assert (2, 5, 1, 1, len(texts[2])) in got


def test_substring_dup_spans_random_corpus_equals_naive(spark):
    """Property-style sweep on a seeded random corpus with planted
    substrings at arbitrary offsets and periodic content (the
    multiple-anchors-per-span and same-diagonal-twice cases)."""
    import random

    rng = random.Random(99)
    motifs = [
        "".join(rng.choice("abcd efgh") for _ in range(55)),
        "xy" * 30,  # periodic: many self-similar anchors
    ]
    texts = {}
    for d in range(12):
        t = "".join(rng.choice("qrstuvwz") for _ in range(rng.randint(30, 90)))
        for m in motifs:
            if rng.random() < 0.5:
                cut = rng.randint(0, len(t))
                t = t[:cut] + m + t[cut:]
        texts[d] = t
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = _span_rows(neardup.substring_dup_spans(docs))
    want = _naive_maximal_spans(texts, neardup.SPAN_MIN_LEN)
    assert got == want
    assert want, "planted motifs must produce spans"


def test_substring_dup_spans_star_mode_linear_under_boilerplate(spark):
    """Star mode is the 100 TB shape for corpus-wide boilerplate: output
    O(occurrences) instead of O(pairs²), every carrier detected against
    the canonical first occurrence with a genuine common substring at
    exact boundaries."""
    import random

    rng = random.Random(7)
    boiler = "".join(rng.choice("abcdefgh ") for _ in range(70))

    def noise(n):
        return "".join(rng.choice("stuvwxyz") for _ in range(n))

    n_carriers = 30
    texts = {
        d: noise(10 + d % 7) + boiler + noise(15)
        for d in range(n_carriers)
    }
    texts[100] = noise(80)  # non-carrier
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    pairs_rows = _span_rows(neardup.substring_dup_spans(docs))
    star_rows = _span_rows(neardup.substring_dup_spans(docs, mode="star"))
    # pairwise truth is quadratic in carriers; star is linear (a few
    # boundary-straddling anchors pick doc-specific canonicals, so the
    # bound is a small multiple of occurrences, not C(carriers, 2))
    assert len(pairs_rows) >= n_carriers * (n_carriers - 1) // 2
    assert len(star_rows) <= 4 * n_carriers
    # every carrier is star-detected (as a canonical or against one)
    covered = {r[0] for r in star_rows} | {r[1] for r in star_rows}
    assert covered == set(range(n_carriers))
    # the shared-content canonical dominates: doc 0 anchors most spans
    assert sum(1 for r in star_rows if r[0] == 0) >= n_carriers - 1
    # star spans are genuine common substrings at exact boundaries
    for da, db, sa, sb, ln in star_rows:
        assert texts[da][sa - 1 : sa - 1 + ln] == texts[db][sb - 1 : sb - 1 + ln]
        assert ln >= len(boiler)
    # maximality vs the canonical partner: extending one char breaks
    for da, db, sa, sb, ln in star_rows:
        ta, tb = texts[da], texts[db]
        left_ok = sa == 1 or sb == 1 or ta[sa - 2] != tb[sb - 2]
        right_ok = (
            sa - 1 + ln >= len(ta)
            or sb - 1 + ln >= len(tb)
            or ta[sa - 1 + ln] != tb[sb - 1 + ln]
        )
        assert left_ok and right_ok
    # mode contract
    import pytest

    with pytest.raises(ValueError, match="unknown mode"):
        neardup.substring_dup_spans(docs, mode="clique")


def test_substring_dup_spans_multibyte_and_boundary_lengths(spark):
    """Characters outside ASCII must index identically on the JVM side
    (substr/length over code points) and in the Python extension loop;
    spans exactly AT the guarantee length are found, one char under is
    not reported."""
    L = neardup.SPAN_MIN_LEN
    shared_exact = "é中ß" + "ab çd " * ((L - 3) // 6 + 1)
    shared_exact = shared_exact[:L]
    assert len(shared_exact) == L
    texts = {
        1: "xx1yy " + shared_exact + " qzzz",
        2: "longer-prefix-" + shared_exact + "-suffix0",
        # shares only L-1 chars with doc 4 (the chars on BOTH boundary
        # sides differ too) -> below guarantee, absent
        3: "aa-" + shared_exact[: L - 1] + "k111",
        4: "bb_" + shared_exact[: L - 1] + "m222",
    }
    got = _span_rows(neardup.substring_dup_spans(spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )))
    want = _naive_maximal_spans(texts, L)
    assert got == want
    # the exact-guarantee-length span IS found with multibyte content
    assert any(r[:2] == (1, 2) and r[4] == L for r in got)
    # the L-1 shared block produces nothing
    assert not any(r[:2] == (3, 4) for r in got)


def _naive_span_cut(texts: dict[int, str], min_len: int) -> dict[int, tuple]:
    """Per-position mask reference for span_cut: mark every char of every
    pair's LATER doc covered by a naive maximal span, then read off
    (orig_chars, merged islands, chars removed, kept text) per doc."""
    masks = {d: [False] * len(t) for d, t in texts.items()}
    for _a, b, _sa, sb, ln in _naive_maximal_spans(texts, min_len):
        for p in range(sb - 1, sb - 1 + ln):
            masks[b][p] = True
    out = {}
    for d, t in texts.items():
        m = masks[d]
        islands = sum(
            1 for i, f in enumerate(m) if f and (i == 0 or not m[i - 1])
        )
        out[d] = (
            len(t),
            islands,
            sum(m),
            "".join(c for c, f in zip(t, m) if not f),
        )
    return out


def _cut_rows(df) -> dict[int, tuple]:
    return {
        r.doc_id: (r.orig_chars, r.spans_cut, r.chars_removed, r.cut_text)
        for r in df.collect()
    }


def test_span_cut_overlap_merge_equals_naive_mask(spark):
    """Two spans from DIFFERENT canonical docs overlapping inside one
    victim doc must UNION before cutting (chars counted once, one merged
    island) — pinned against a per-position mask built from the naive
    quadratic span reference. Also: conservation per doc, and canonical
    first occurrences keep their text verbatim."""
    import random

    rng = random.Random(21)
    T = "".join(rng.choice("abcdefg ") for _ in range(100))

    def noise(n):
        return "".join(rng.choice("qrstuvwxyz") for _ in range(n))

    texts = {
        1: noise(9) + T[:70] + noise(11),    # canonical for T[:70]
        2: noise(14) + T[30:] + noise(6),    # canonical for T[30:] vs 3
        3: noise(5) + T + noise(8),          # victim: overlapping cuts
        4: noise(90),                        # untouched
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = _cut_rows(neardup.span_cut(docs))
    want = _naive_span_cut(texts, neardup.SPAN_MIN_LEN)
    assert got == want
    # overlapping intervals really merged: victim doc 3 lost one island
    # covering the whole T occurrence (union of [.. 70) and [30 ..))
    assert got[3][1] == 1 and got[3][2] >= len(T)
    # conservation: kept mass + removed mass == input mass, every doc
    for d, (orig, _isl, removed, kept) in got.items():
        assert len(kept) + removed == orig
    # first occurrence intact: doc 1 is only ever doc_a for T[:70] ...
    assert got[1][3] == texts[1]
    # ... and the untouched doc passes through byte-identical
    assert got[4] == (90, 0, 0, texts[4])


def test_span_cut_random_corpus_equals_naive_mask(spark):
    """Property-style sweep: the planted-motif random corpus (same shape
    as the spans-table sweep) cut-and-reassembled must match the
    per-position mask reference on every doc."""
    import random

    rng = random.Random(99)
    motifs = [
        "".join(rng.choice("abcd efgh") for _ in range(55)),
        "xy" * 30,
    ]
    texts = {}
    for d in range(12):
        t = "".join(
            rng.choice("qrstuvwz") for _ in range(rng.randint(30, 90))
        )
        for m in motifs:
            if rng.random() < 0.5:
                cut = rng.randint(0, len(t))
                t = t[:cut] + m + t[cut:]
        texts[d] = t
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = _cut_rows(neardup.span_cut(docs))
    want = _naive_span_cut(texts, neardup.SPAN_MIN_LEN)
    assert got == want
    assert any(v[2] > 0 for v in want.values()), "motifs must force cuts"


def test_span_cut_star_mode_boilerplate(spark):
    """Star-mode cut is the 100 TB boilerplate form: every non-canonical
    carrier loses the boilerplate block (cut against the canonical first
    occurrence only — linear candidate volume), the canonical carrier
    keeps its text verbatim, and conservation holds throughout."""
    import random

    rng = random.Random(7)
    boiler = "".join(rng.choice("abcdefgh ") for _ in range(70))

    def noise(n):
        return "".join(rng.choice("stuvwxyz") for _ in range(n))

    n_carriers = 20
    texts = {
        d: noise(10 + d % 7) + boiler + noise(15)
        for d in range(n_carriers)
    }
    texts[100] = noise(80)
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = _cut_rows(neardup.span_cut(docs, mode="star"))
    # canonical carrier (doc 0) and the non-carrier are untouched
    assert got[0] == (len(texts[0]), 0, 0, texts[0])
    assert got[100] == (80, 0, 0, texts[100])
    for d in range(1, n_carriers):
        orig, islands, removed, kept = got[d]
        assert removed >= len(boiler), f"doc {d} kept its boilerplate"
        assert len(kept) + removed == orig
        assert boiler not in kept


def test_star_mode_shadow_rate_measured_and_rescued(spark):
    """Quantify the documented star-mode shadowing limit and its rescue.

    Seeded WORST case: every anchor window of a real shared span first
    occurs in an OLDER non-carrier doc with sub-guarantee context (each
    window embedded between junk), so plain star pairs every carrier
    anchor against the old doc, every extension falls below the floor,
    and the true carrier pair is fully shadowed (measured rate 1.0).
    One rescue round re-anchors the failed occurrences against the
    actual canonical carrier and recovers the exact span (rate 0.0).
    On the realistic planted-motif corpus the plain-star rate is
    measured too — with one rescue round coverage matches pairs mode
    exactly (the honest contract: rescue_rounds=1 is the production
    star setting; residual is the same-doc alternate-alignment corner
    documented in the operator)."""
    import random

    rng = random.Random(0)
    w = neardup.SPAN_WINDOW
    S = "".join(rng.choice("abcdefgh ") for _ in range(80))

    def noise(n):
        return "".join(rng.choice("jklmnpqrtuvz") for _ in range(n))

    # shadowing needs each span window to be winnowing-SELECTED somewhere
    # in the old doc (not merely present), so each window is planted in
    # three junk contexts — deterministic seed verified to fully shadow
    shadow_doc = "".join(
        S[k : k + w] + noise(5)
        for _rep in range(3)
        for k in range(len(S) - w + 1)
    )
    texts = {
        1: shadow_doc,                  # oldest: every window, short context
        2: noise(12) + S + noise(9),    # true carriers of the span
        3: noise(7) + S + noise(14),
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )

    def covered(rows):
        return {r[0] for r in rows} | {r[1] for r in rows}

    pairs_cov = covered(_span_rows(neardup.substring_dup_spans(docs)))
    assert pairs_cov == {2, 3}, "seed must make (2,3) the only true pair"
    star0_cov = covered(
        _span_rows(neardup.substring_dup_spans(docs, mode="star"))
    )
    shadow_rate0 = len(pairs_cov - star0_cov) / len(pairs_cov)
    assert shadow_rate0 == 1.0, "seeded corpus must fully shadow plain star"
    star1 = _span_rows(
        neardup.substring_dup_spans(docs, mode="star", rescue_rounds=1)
    )
    shadow_rate1 = len(pairs_cov - covered(star1)) / len(pairs_cov)
    assert shadow_rate1 == 0.0
    # the rescued span is the real one, at exact boundaries
    assert any(
        (da, db) == (2, 3)
        and ln >= len(S)
        and texts[2][sa - 1 : sa - 1 + ln] == texts[3][sb - 1 : sb - 1 + ln]
        for da, db, sa, sb, ln in star1
    )
    # rounds beyond the shadow depth are no-ops
    star2 = _span_rows(
        neardup.substring_dup_spans(docs, mode="star", rescue_rounds=2)
    )
    assert star2 == star1

    # realistic shape: planted motifs (incl. periodic content) — measure
    # plain-star shadowing and pin that ONE rescue round restores full
    # pairs-mode doc coverage
    rng2 = random.Random(99)
    motifs = [
        "".join(rng2.choice("abcd efgh") for _ in range(55)),
        "xy" * 30,
    ]
    mtexts = {}
    for d in range(12):
        t = "".join(
            rng2.choice("qrstuvwz") for _ in range(rng2.randint(30, 90))
        )
        for m in motifs:
            if rng2.random() < 0.5:
                cut = rng2.randint(0, len(t))
                t = t[:cut] + m + t[cut:]
        mtexts[d] = t
    mdocs = spark.createDataFrame(
        [(i, t) for i, t in mtexts.items()], "doc_id long, text string"
    )
    mpairs_cov = covered(_span_rows(neardup.substring_dup_spans(mdocs)))
    mstar0_cov = covered(
        _span_rows(neardup.substring_dup_spans(mdocs, mode="star"))
    )
    mrate0 = len(mpairs_cov - mstar0_cov) / len(mpairs_cov)
    assert 0.0 <= mrate0 <= 0.5, f"unexpected realistic shadow rate {mrate0}"
    mstar1_cov = covered(
        _span_rows(
            neardup.substring_dup_spans(mdocs, mode="star", rescue_rounds=1)
        )
    )
    assert mpairs_cov - mstar1_cov == set()

    import pytest

    with pytest.raises(ValueError, match="rescue_rounds"):
        neardup.substring_dup_spans(docs, mode="star", rescue_rounds=-1)


def test_incremental_span_check_equals_orientated_pairs(spark):
    """The daily-increment span probe must find exactly the pairs-mode
    span set on the union, orientated to (corpus doc_a, incoming doc_b)
    — including pairs where the corpus doc has the LARGER id (the case a
    naive doc_a<doc_b filter would flip), and the memoized-anchor-slice
    path must equal the self-built path (winnowing is per-doc)."""
    import random

    rng = random.Random(11)
    S1 = "".join(rng.choice("abcdefg ") for _ in range(60))
    S2 = "".join(rng.choice("hijklmn ") for _ in range(48))

    def noise(n):
        return "".join(rng.choice("opqrstuvwxyz") for _ in range(n))

    texts = {
        1: noise(7) + S1 + noise(16),          # corpus
        2: noise(30) + S1 + noise(5) + S2,     # incoming (shares with 1, 9)
        3: noise(3) + S2 + noise(40),          # corpus
        4: noise(120),                         # incoming, clean
        9: noise(12) + S2 + noise(4),          # corpus with LARGER id than 2
    }
    inc_ids = {2, 4}
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    corpus = docs.filter(~F.col("doc_id").isin(*inc_ids))
    incoming = docs.filter(F.col("doc_id").isin(*inc_ids))
    got = _span_rows(neardup.incremental_span_check(corpus, incoming))
    want = set()
    for a, b, sa, sb, ln in _naive_maximal_spans(texts, neardup.SPAN_MIN_LEN):
        if a not in inc_ids and b in inc_ids:
            want.add((a, b, sa, sb, ln))
        elif b not in inc_ids and a in inc_ids:
            want.add((b, a, sb, sa, ln))
    assert got == want
    # the larger-id corpus doc's span is present and correctly orientated
    assert any(r[0] == 9 and r[1] == 2 for r in got)
    # pre-sliced anchors from one corpus-wide table give the same result
    all_anchors = neardup.span_anchor_table(docs)
    got2 = _span_rows(
        neardup.incremental_span_check(
            corpus,
            incoming,
            anchors_corpus=all_anchors.filter(
                ~F.col("doc_id").isin(*inc_ids)
            ),
            anchors_incoming=all_anchors.filter(
                F.col("doc_id").isin(*inc_ids)
            ),
        )
    )
    assert got2 == got
