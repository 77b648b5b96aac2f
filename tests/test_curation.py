"""Unit checks for curation operators beyond the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.catalog import load_table
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


def test_repetition_score_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # bigrams: "a b"x3, "b a"x2 -> top 3/5
            (2, "a b c d e f"),      # all grams unique
            (3, "x"),                # too short for any gram
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in curation.repetition_score(docs).collect()}
    assert abs(rows[1].top_bigram_frac - 3 / 5) < 1e-12
    # trigrams of doc1: "a b a","b a b","a b a","b a b" -> all repeated
    assert abs(rows[1].dup_trigram_frac - 1.0) < 1e-12
    assert rows[1].repetitive
    assert rows[2].top_bigram_frac == 1 / 5  # unique bigrams, max cnt 1 of 5
    assert rows[2].dup_trigram_frac == 0.0
    assert not rows[2].repetitive or rows[2].top_bigram_frac > 0.10
    assert rows[3].top_bigram_frac == 0.0 and not rows[3].repetitive


def test_decontamination_overlap_flags_shared_ngrams(spark):
    shared = "one two three four five"
    docs = spark.createDataFrame(
        [
            (1, "eval", f"{shared} tail words here"),
            (2, "train", f"prefix {shared} suffix"),
            (3, "train", "totally different words with no overlap at all"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r.doc_id: r
        for r in curation.decontamination_overlap(docs, "eval").collect()
    }
    assert set(out) == {2, 3}
    assert out[2].contaminated and out[2].n_shared_ngrams >= 1
    assert not out[3].contaminated and out[3].n_shared_ngrams == 0


def test_source_mix_weights_uniform_target(spark):
    docs = spark.createDataFrame(
        [
            (1, "a", "w " * 30),
            (2, "a", "w " * 30),
            (3, "b", "w " * 20),
        ],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in curation.source_mix_weights(docs).collect()}
    # "w " * 30 -> split on space gives 30 'w' tokens + 1 trailing empty
    total = out["a"].n_tokens + out["b"].n_tokens
    assert abs(out["a"].token_share - out["a"].n_tokens / total) < 1e-12
    assert abs(out["a"].target_share - 0.5) < 1e-12
    # source below target share gets upweighted, above gets downweighted
    assert out["b"].sample_weight > 1.0 > out["a"].sample_weight
    assert out["b"].capped_weight <= curation.MIX_WEIGHT_CAP


def test_sequence_packing_scalable_equals_window_form(spark, sf_dir):
    from snowflake_to_bq_pipeline_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    nt = F.array_size(
        F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)
    )
    plain = curation.sequence_packing(docs, nt)
    scalable = curation.sequence_packing_scalable(docs, nt, num_partitions=8)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, scalable.collect()))
    assert a == b
    # Every window in the scalable plan is __pid-partitioned: no
    # single-task-per-stream sort survives.
    plan = scalable._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window [" in line:
            assert "__pid" in line, f"per-group window in plan: {line}"


def test_dsir_importance_weights_ranks_target_like_docs(spark):
    # Target slice speaks "alpha beta gamma"; background speaks "delta
    # epsilon zeta". A raw doc written in target vocabulary must score a
    # higher log-weight than one written in background vocabulary.
    target = [(i, "tgt", "alpha beta gamma alpha beta gamma alpha beta") for i in range(10)]
    background = [(100 + i, "raw", "delta epsilon zeta delta epsilon zeta delta") for i in range(10)]
    probes = [
        (500, "raw", "alpha beta gamma alpha beta gamma"),
        (501, "raw", "delta epsilon zeta delta epsilon zeta"),
    ]
    docs = spark.createDataFrame(
        target + background + probes, ["doc_id", "source", "text"]
    )
    out = {
        r.doc_id: r
        for r in curation.dsir_importance_weights(docs, "tgt").collect()
    }
    assert 0 not in out  # target slice excluded from scoring
    assert out[500].log_weight > out[501].log_weight
    assert out[500].target_leaning
    assert not out[501].target_leaning
    # Sanity: gram counts reflect bigram occurrences (len-1 words).
    assert out[500].n_grams == 5


def test_charlm_perplexity_separates_reference_like_from_garbage(spark):
    from snowflake_to_bq_pipeline_spark.operators import text as text_ops

    ref = [
        (i, "ref", "the quick brown fox jumps over the lazy dog near the river bank")
        for i in range(20)
    ]
    probes = [
        (100, "raw", "the quick brown fox jumps over the lazy dog"),
        (101, "raw", "qzxv wkjp zzqx vvkw xxjz qqpw zkvx wjqz"),
    ]
    docs = spark.createDataFrame(ref + probes, ["doc_id", "source", "text"])
    out = {
        r.doc_id: r
        for r in text_ops.charlm_perplexity(docs, "ref").collect()
    }
    assert set(out) == {100, 101}  # reference slice excluded
    # Reference-like text must score far lower nll than alien char
    # transitions, and the garbage probe lands near ln(ALPHABET).
    assert out[100].avg_nll < out[101].avg_nll - 1.0
    assert out[100].is_fluent
    assert not out[101].is_fluent


def test_cross_split_contamination_flags_planted_leak(spark):
    """A doc duplicated across the split boundary must flag as leaked;
    unique held-out docs must not."""
    from snowflake_to_bq_pipeline_spark.operators import curation

    shared = "the same sentence appears verbatim in train and eval splits here"
    uniq = "completely unrelated held out content with its own private words"
    # find doc ids landing in each split under the deterministic md5 split
    import hashlib

    def split_of(i):
        h = hashlib.md5(str(i).encode()).hexdigest()[:3]
        return "train" if h < "e66" else ("val" if h < "f33" else "test")

    train_id = next(i for i in range(1000) if split_of(i) == "train")
    heldout_leak = next(i for i in range(1000) if split_of(i) != "train")
    heldout_clean = next(
        i for i in range(heldout_leak + 1, 2000) if split_of(i) != "train"
    )
    docs = spark.createDataFrame(
        [(train_id, shared), (heldout_leak, shared), (heldout_clean, uniq)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in curation.cross_split_contamination(docs).collect()}
    assert train_id not in rows  # train side is not reported
    assert rows[heldout_leak].leaked
    assert rows[heldout_leak].n_shared_train_ngrams > 0
    assert not rows[heldout_clean].leaked
    assert rows[heldout_clean].n_shared_train_ngrams == 0


def test_near_dedup_string_doc_ids_short_docs_all_pass_through(spark):
    """Short (shingle-less) docs with STRING doc ids must each keep their
    own pass-through band key: the old cast("long") turned every string
    id into NULL, and the NULL-safe dedup key (-1, NULL) collapsed all
    short docs to one survivor. xxhash64 keys them distinctly."""
    from snowflake_to_bq_pipeline_spark.streaming import curation as scur

    docs = spark.createDataFrame(
        [
            ("doc-a", "one two"),  # < 3 words: no shingles
            ("doc-b", "three four"),
            ("doc-c", "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        "doc_id string, text string",
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000)))
    kept = {
        r["doc_id"]
        for r in scur.near_dedup_docs(docs, watermark=None).collect()
    }
    assert {"doc-a", "doc-b"} <= kept


def test_choose_band_bits_rule_and_auto_sizing(spark):
    from snowflake_to_bq_pipeline_spark.streaming import curation as scur
    import pytest

    # documented step rule, floored at the default width
    assert scur.choose_band_bits(100) == scur.NEAR_DEDUP_BAND_BITS
    assert scur.choose_band_bits(scur.DENSE_HORIZON_DOCS) == 16
    assert scur.choose_band_bits(scur.DENSE_HORIZON_DOCS + 1) == 32

    # watermark parser backing event-time state timeouts
    assert scur._horizon_ms("10 minutes") == 600_000
    assert scur._horizon_ms("30 seconds") == 30_000
    assert scur._horizon_ms("1 hour") == 3_600_000
    assert scur._horizon_ms("500 milliseconds") == 500

    # auto sizing is batch-twin only (a stream cannot be counted)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000)))
    with pytest.raises(ValueError, match="auto"):
        scur.near_dedup_docs(docs, watermark="10 minutes", band_bits="auto")
    # sparse corpus -> floor width; result identical to explicit 16
    kept = {
        r["doc_id"]
        for r in scur.near_dedup_docs(
            docs, watermark=None, band_bits="auto"
        ).collect()
    }
    assert kept == {1}


def test_near_dedup_verified_rejects_unguaranteed_hamming(spark):
    import pytest

    from snowflake_to_bq_pipeline_spark.streaming import curation as scur

    docs = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000)))
    # 4 bands of 16 bits guarantee hamming <= 3 only
    with pytest.raises(ValueError, match="pigeonhole"):
        scur.near_dedup_docs_verified(docs, watermark=None, max_hamming=4)


def test_cluster_safe_split_zero_cross_split_dup_pairs(spark, sf_dir):
    """Verdict r11 ask #3: whole near-dup clusters land in one split, so
    cross-split dup pairs are zero BY CONSTRUCTION — and measurably fewer
    than the per-doc split leaks on the same corpus."""
    from snowflake_to_bq_pipeline_spark.registry import (
        _jaccard_pairs_for,
        dataset_split_assign_cluster_safe_q,
        dataset_split_assign_q,
    )

    pairs = _jaccard_pairs_for(spark, sf_dir).select("doc_a", "doc_b")
    assert pairs.count() > 0, "corpus must contain near-dup pairs"

    def cross_split(split_df):
        s = split_df.select("doc_id", "split")
        return (
            pairs.join(
                s.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("split").alias("split_a"),
                ),
                "doc_a",
            )
            .join(
                s.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("split").alias("split_b"),
                ),
                "doc_b",
            )
            .filter(F.col("split_a") != F.col("split_b"))
            .count()
        )

    safe = dataset_split_assign_cluster_safe_q(spark, sf_dir)
    plain = dataset_split_assign_q(spark, sf_dir)
    leak_safe = cross_split(safe)
    leak_plain = cross_split(plain)
    assert leak_safe == 0
    assert leak_plain > leak_safe, (
        "per-doc split should measurably leak on a corpus with dup pairs"
    )
    # fractions stay sane: every doc is assigned, all three splits exist,
    # and singletons (split_key == doc_id) hash exactly like the per-doc
    # split would
    rows = safe.collect()
    assert len(rows) == plain.count()
    assert {r["split"] for r in rows} == {"train", "val", "test"}
    plain_map = {r["doc_id"]: r["split"] for r in plain.collect()}
    for r in rows:
        if r["split_key"] == r["doc_id"]:
            assert r["split"] == plain_map[r["doc_id"]]


def test_nb_quality_classifier_heldout_separation(spark):
    """Verdict r11 ask #4: a signal-bearing corpus (curated vocabulary vs
    crawl vocabulary) must separate on HELD-OUT docs — scored by a model
    trained only on the train slice."""
    cur_words = "prose essay careful citation archive edit review thesis"
    crawl_words = "click spam free win offer casino pills viagra"

    def doc(i, words, salt):
        toks = (words.split() * 4)[salt % 3:][:14]
        return " ".join(toks[(i + j) % len(toks)] for j in range(12))

    rows = []
    for i in range(60):
        rows.append((i * 2, doc(i, cur_words, i), "cur"))
        rows.append((i * 2 + 1, doc(i, crawl_words, i + 1), "web"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curation.nb_quality_classifier(df, ("cur",)).collect()

    held = [r for r in out if r["is_heldout"]]
    assert held, "holdout slice must be nonempty"
    hc = [r["log_odds"] for r in held if r["label_curated"]]
    hw = [r["log_odds"] for r in held if not r["label_curated"]]
    assert hc and hw
    assert min(hc) > max(hw), (
        "held-out curated docs must outscore held-out crawl docs"
    )
    assert all(r["pred_curated"] for r in held if r["label_curated"])
    assert not any(r["pred_curated"] for r in held if not r["label_curated"])
    # the label/holdout flags are pure functions of (source, doc_id)
    for r in out:
        assert r["label_curated"] == (r["source"] == "cur")
        assert r["is_heldout"] == (r["doc_id"] % curation.NBQ_HOLDOUT_MOD == 0)


def test_nbq_literal_model_scorer_equals_join_classifier(spark, sf_dir):
    """Plan-diverse value equality: the constant-folded LUT fold
    (score_docs_with_model — zero shuffle, the per-record ingest plan)
    must reproduce the join-shaped classifier bit-for-bit, because both
    sum the SAME round-9 decimal terms and decimal addition is
    add-order-independent."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    batch = {
        r["doc_id"]: tuple(r)
        for r in curation.nb_quality_classifier(docs, ("src0", "src1")).collect()
    }
    model = curation.train_nbq_model(docs, ("src0", "src1"))
    assert len(model["llr"]) == curation.DSIR_BUCKETS
    # BOTH scorer executions (the r14 Arrow default and the JVM fold)
    # must reproduce the join-shaped classifier bit-for-bit: all three
    # sum the SAME round-9 terms, in exact arithmetic
    for impl in ("arrow", "fold"):
        lit = {
            r["doc_id"]: tuple(r)
            for r in curation.score_docs_with_model(
                docs, model, impl=impl
            ).collect()
        }
        assert lit == batch, f"impl={impl} diverged from the classifier"


def test_score_docs_with_model_enforces_gram_bound(spark, monkeypatch):
    """The long-nanos exactness contract is ENFORCED, not assumed: a doc
    whose gram count exceeds NBQ_MAX_GRAMS_PER_DOC must raise loudly
    (the bound is where |total| could leave the 2^53 exact-double range)
    instead of silently degrading the plan-diverse equality."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "cur", "a b c d e f g h"), (2, "raw", "a b")],
        "doc_id long, source string, text string",
    )
    model = curation.train_nbq_model(docs, ("cur",), holdout_mod=100)
    # sane inputs score fine under the real bound
    assert curation.score_docs_with_model(docs, model).count() == 2
    monkeypatch.setattr(curation, "NBQ_MAX_GRAMS_PER_DOC", 3)
    with pytest.raises(Exception, match="NBQ_MAX_GRAMS_PER_DOC"):
        curation.score_docs_with_model(docs, model).collect()


def test_score_docs_with_model_rejects_short_lut(spark):
    """A model whose LUT does not cover the full DSIR_BUCKETS space must
    be rejected up front — element_at past the LUT end would silently
    null every log_odds (r12 ADVICE)."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "cur", "a b c")], "doc_id long, source string, text string"
    )
    model = curation.train_nbq_model(docs, ("cur",), holdout_mod=100)
    bad = dict(model, llr=model["llr"][:100])
    # ValueError, not AssertionError: the contract check must survive
    # ``python -O`` (r13 ADVICE)
    with pytest.raises(ValueError, match="DSIR_BUCKETS"):
        curation.score_docs_with_model(docs, bad)


def test_dedup_provenance_conservation_and_precedence(spark, sf_dir):
    """Every doc gets EXACTLY one verdict row and one reason; reasons are
    mutually exclusive by precedence (exact beats lexical beats
    semantic), and keep <=> reason == 'kept'."""
    from snowflake_to_bq_pipeline_spark.operators import neardup
    from snowflake_to_bq_pipeline_spark.registry import (
        section_e_similarity as S,
    )

    full = load_table(spark, sf_dir, "documents")
    docs = full.select("doc_id", "source")
    exact = neardup.exact_dedup(full)
    per = curation.dedup_provenance(
        docs,
        exact,
        S._dup_clusters_for(spark, sf_dir),
        S._sem_groups_for(spark, sf_dir),
    )
    rows = per.collect()
    n_docs = docs.count()
    assert len(rows) == n_docs, "verdict table must conserve doc count"
    assert len({r.doc_id for r in rows}) == n_docs, "one row per doc"
    assert all(r.reason in curation.DEDUP_REASONS for r in rows)
    assert all(r.keep == (r.reason == "kept") for r in rows)
    by_doc = {r.doc_id: r.reason for r in rows}
    ex = {r.doc_id for r in exact.collect() if r.is_duplicate}
    assert all(by_doc[d] == "exact_dup" for d in ex), (
        "exact precedence: exact-hash dups must never be attributed to a "
        "weaker family"
    )
    nd = {
        r.doc_id
        for r in S._dup_clusters_for(spark, sf_dir).collect()
        if not r.is_canonical
    }
    assert nd - ex, "corpus contains non-exact lexical near-dups"
    assert all(by_doc[d] in ("exact_dup", "near_dup") for d in nd)
    sem = {
        r.doc_id
        for r in S._sem_groups_for(spark, sf_dir).collect()
        if not r.is_canonical
    }
    assert all(
        by_doc[d] in ("exact_dup", "near_dup", "semantic_dup") for d in sem
    )
    # everything NOT flagged by any family is kept
    flagged = ex | nd | sem
    assert all(
        by_doc[d] == "kept"
        for d in by_doc
        if d not in flagged
    )


def test_dedup_provenance_precedence_on_overlapping_verdicts(spark):
    """A doc flagged by SEVERAL families carries the strongest reason
    only — crafted corpus where one doc is simultaneously an exact dup,
    a lexical cluster member, and a semantic group member."""
    docs = spark.createDataFrame(
        [(1, "s"), (2, "s"), (3, "s"), (4, "s"), (5, "s")],
        "doc_id long, source string",
    )
    exact = spark.createDataFrame(
        # doc 2 = exact copy of 1; others unique
        [(1, False), (2, True), (3, False), (4, False), (5, False)],
        "doc_id long, is_duplicate boolean",
    )
    clusters = spark.createDataFrame(
        # lexical cluster {1, 2, 3}: canonical 1 — doc 2 overlaps exact
        [(1, True), (2, False), (3, False)],
        "doc_id long, is_canonical boolean",
    )
    semantic = spark.createDataFrame(
        # semantic group {1, 2, 3, 4}: doc 4 only reachable semantically
        [(1, True), (2, False), (3, False), (4, False)],
        "doc_id long, is_canonical boolean",
    )
    out = {
        r.doc_id: (r.reason, r.keep)
        for r in curation.dedup_provenance(
            docs, exact, clusters, semantic
        ).collect()
    }
    assert out == {
        1: ("kept", True),
        2: ("exact_dup", False),      # beats near_dup AND semantic_dup
        3: ("near_dup", False),       # beats semantic_dup
        4: ("semantic_dup", False),
        5: ("kept", True),
    }


def test_dedup_provenance_accepts_semdedup_verdicts(spark, sf_dir):
    """The kmeans-scoped SemDeDup verdict table (semdedup_prune) plugs
    into the same combiner: vec_id -> doc_id, keep -> is_canonical —
    so a pipeline can ship provenance under either semantic rule."""
    from pyspark.sql import functions as F
    from snowflake_to_bq_pipeline_spark.operators import neardup
    from snowflake_to_bq_pipeline_spark.registry import (
        section_e_similarity as S,
    )

    full = load_table(spark, sf_dir, "documents")
    docs = full.select("doc_id", "source")
    sem = S._semdedup_for(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        F.col("keep").alias("is_canonical"),
    )
    per = curation.dedup_provenance(
        docs,
        neardup.exact_dedup(full),
        S._dup_clusters_for(spark, sf_dir),
        sem,
    )
    rows = per.collect()
    assert len(rows) == docs.count()
    dropped = {r["doc_id"] for r in sem.collect() if not r["is_canonical"]}
    assert dropped, "semdedup drops something on the test corpus"
    by_doc = {r.doc_id: r.reason for r in rows}
    assert all(
        by_doc[d] in ("exact_dup", "near_dup", "semantic_dup")
        for d in dropped
    )


def test_classifier_gate_funnel_agrees_with_scores(spark, sf_dir):
    """The funnel's nb_classifier stage must agree ROW-FOR-ROW with
    quality_classifier_scores.pred_curated: recompute the four heuristic
    gates per doc in Python, intersect with the scores view's verdicts,
    and the stage-5 counts must match exactly."""
    import re

    from snowflake_to_bq_pipeline_spark.registry import QUERIES

    funnel = {
        r.gate_name: r
        for r in QUERIES["classifier_gate_funnel"](spark, sf_dir).collect()
    }
    pred = {
        r.doc_id: r.pred_curated
        for r in QUERIES["quality_classifier_scores"](
            spark, sf_dir
        ).collect()
    }
    docs = load_table(spark, sf_dir, "documents").collect()
    assert set(pred) == {d.doc_id for d in docs}

    def heuristic_survivor(d) -> bool:
        ts = re.findall(r"[a-z0-9]+", d.text)
        return (
            20 <= len(ts) <= 90
            and len(set(ts)) / len(ts) >= 0.5
            and d.lang == "en"
        )

    surv4 = [d.doc_id for d in docs if heuristic_survivor(d)]
    assert funnel["nb_classifier"].docs_in == len(surv4)
    assert funnel["nb_classifier"].docs_kept == sum(
        1 for d in surv4 if pred[d]
    )
    # the heuristic prefix must be exactly quality_filter_funnel's
    base = {
        r.gate_name: (r.docs_in, r.docs_kept)
        for r in QUERIES["quality_filter_funnel"](spark, sf_dir).collect()
    }
    for g in ("min_tokens", "max_tokens", "diversity", "lang_en"):
        assert (funnel[g].docs_in, funnel[g].docs_kept) == base[g]


def test_score_docs_with_model_enforces_llr_magnitude_premise(spark):
    """The 2^53 exactness argument needs BOTH the gram cap and the
    per-gram magnitude bound; a pathologically skewed model whose worst
    LLR breaks worst*cap+prior < 2^53 must be rejected up front."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "cur", "a b c")], "doc_id long, source string, text string"
    )
    model = curation.train_nbq_model(docs, ("cur",), holdout_mod=100)
    bad = dict(model, llr=["30.0"] + model["llr"][1:])  # 3e10 nanos/gram
    # ValueError, not AssertionError: survives ``python -O`` (r13 ADVICE)
    with pytest.raises(ValueError, match="long-nanos exactness"):
        curation.score_docs_with_model(docs, bad)


def test_score_docs_with_model_null_text_scores_zero_grams(spark):
    """NULL text must score as zero grams on BOTH scorer executions (the
    JVM fold's when/otherwise verdict and the Arrow path's guard) — an
    ingest stream can always carry an empty record."""
    docs = spark.createDataFrame(
        [(1, "cur", "a b c"), (2, "raw", None)],
        "doc_id long, source string, text string",
    )
    model = curation.train_nbq_model(
        docs.filter(F.col("text").isNotNull()), ("cur",), holdout_mod=100
    )
    from decimal import Decimal

    prior_only = round(float(Decimal(model["prior"])), 6)
    for impl in ("arrow", "fold"):
        rows = {
            r.doc_id: r
            for r in curation.score_docs_with_model(
                docs, model, impl=impl
            ).collect()
        }
        assert rows[2].n_grams == 0
        assert rows[2].log_odds == prior_only  # prior-only score
    a = {tuple(r) for r in curation.score_docs_with_model(docs, model, impl="arrow").collect()}
    f = {tuple(r) for r in curation.score_docs_with_model(docs, model, impl="fold").collect()}
    assert a == f
