"""Property-based tests (hypothesis) for the r11-continuation curation
operators: random inputs against pure-Python references and algebraic
invariants (coverage, reconstruction, multiset determinism, sketch
guarantees). Example counts are capped low — each example runs real
Spark jobs — but every run explores fresh corners.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings, strategies as st

from snowflake_to_bq_pipeline_spark.operators import neardup, quality
from snowflake_to_bq_pipeline_spark.operators import text as text_ops

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

@given(
    nw=st.integers(min_value=1, max_value=90),
    size=st.integers(min_value=1, max_value=40),
    stride=st.integers(min_value=1, max_value=40),
)
@settings(**_SETTINGS)
def test_chunk_windows_matches_python_reference(spark, nw, size, stride):
    words = [f"w{i}" for i in range(nw)]
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    got = {
        r["start_word"]: r
        for r in text_ops.chunk_windows(df, size=size, stride=stride).collect()
    }
    starts = list(range(0, nw, stride))
    assert sorted(got) == starts
    for s in starts:
        chunk = words[s : s + size]
        r = got[s]
        assert r["n_words"] == len(chunk)
        assert r["chunk_idx"] == s // stride
        exp = hashlib.md5(" ".join(chunk).encode()).hexdigest()
        assert r["chunk_md5"] == exp
    # coverage invariant: with stride <= size every word index is in
    # at least one chunk window
    if stride <= size:
        covered = set()
        for s in starts:
            covered.update(range(s, min(s + size, nw)))
        assert covered == set(range(nw))


@given(
    freqs=st.lists(
        st.integers(min_value=1, max_value=40), min_size=2, max_size=25
    )
)
@settings(**_SETTINGS)
def test_zipf_slope_matches_python_closed_form(spark, freqs):
    toks = []
    for i, f in enumerate(freqs):
        toks.extend([f"t{i:03d}"] * f)
    df = spark.createDataFrame(
        [(1, " ".join(toks), "s")], "doc_id long, text string, source string"
    )
    row = text_ops.zipf_slope_by_source(df, top_n=len(freqs)).collect()[0]
    ranked = sorted(
        ((f, f"t{i:03d}") for i, f in enumerate(freqs)),
        key=lambda t: (-t[0], t[1]),
    )
    xs = [math.log(r) for r in range(1, len(ranked) + 1)]
    ys = [math.log(f) for f, _ in ranked]
    n = float(len(xs))
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    denom = n * sxx - sx * sx
    assert row["n_terms"] == len(freqs)
    assert row["top_freq"] == max(freqs)
    if denom != 0:
        slope = (n * sxy - sx * sy) / denom
        assert row["zipf_slope"] == round(slope, 4) or abs(
            row["zipf_slope"] - slope
        ) < 1.5e-4


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.lists(
                st.sampled_from("abcdefg"), min_size=3, max_size=8
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_source_ngram_overlap_matches_python_reference(spark, docs):
    rows = [
        (i, " ".join(words), src) for i, (src, words) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    got = {
        (r["source_a"], r["source_b"]): r
        for r in neardup.source_ngram_overlap(df).collect()
    }
    # python reference: distinct 3-gram shingles per source
    per_src: dict[str, set] = {}
    for _i, (src, words) in enumerate(docs):
        sset = per_src.setdefault(src, set())
        for j in range(len(words) - 2):
            sset.add(" ".join(words[j : j + 3]))
    srcs = sorted(s for s in per_src if per_src[s])
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(per_src[a] & per_src[b])
            if shared:
                expect[(a, b)] = (
                    shared,
                    len(per_src[a]),
                    len(per_src[b]),
                    shared / len(per_src[a] | per_src[b]),
                )
    assert set(got) == set(expect)
    for key, (shared, sa, sb, jac) in expect.items():
        r = got[key]
        assert r["shared_shingles"] == shared
        assert (r["size_a"], r["size_b"]) == (sa, sb)
        assert abs(r["jaccard"] - jac) < 1e-6


@given(
    ts_lists=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=3,
    )
)
@settings(**_SETTINGS)
def test_interarrival_profile_matches_sorted_diffs(spark, ts_lists):
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    rows = []
    for t, ts in enumerate(ts_lists):
        for v in ts:
            rows.append((f"type{t}", base + dt.timedelta(seconds=v)))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        r["event_type"]: r
        for r in quality.interarrival_profile(ev).collect()
    }
    for t, ts in enumerate(ts_lists):
        name = f"type{t}"
        s = sorted(ts)
        gaps = [b - a for a, b in zip(s, s[1:])]
        if not gaps:
            assert name not in got
            continue
        r = got[name]
        assert r["n_gaps"] == len(gaps)
        assert r["min_gap_s"] == float(min(gaps))
        assert r["max_gap_s"] == float(max(gaps))
        assert abs(r["mean_gap_s"] - sum(gaps) / len(gaps)) < 1e-6


@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=200), min_size=1, max_size=30
    ),
    share=st.sampled_from([0.01, 0.05, 0.1]),
)
@settings(**_SETTINGS)
def test_cms_heavy_hitters_guarantees(spark, counts, share):
    rows = []
    doc = 0
    for i, c in enumerate(counts):
        rows.append((doc, f"tok{i:03d}", c))
        doc += 1
    tok = spark.createDataFrame(
        rows, "doc_id long, token string, term_count long"
    )
    out = {
        r["token"]: r
        for r in quality.cms_heavy_hitters(
            tok, threshold_share=share
        ).collect()
    }
    total = sum(counts)
    threshold = max(1, int(total * share))
    for i, c in enumerate(counts):
        name = f"tok{i:03d}"
        if c >= threshold:  # recall 1.0: every true heavy survives
            assert name in out
        if name in out:
            r = out[name]
            assert r["exact_count"] == c
            assert r["est_count"] >= c  # overestimate-only
            assert r["is_true_heavy"] == (c >= threshold)


@given(
    # an edge list over doc ids 0..n-1: random near-dup pair structure
    n=st.integers(min_value=2, max_value=30),
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=29),
            st.integers(min_value=0, max_value=29),
        ),
        min_size=0,
        max_size=25,
    ),
)
@settings(**_SETTINGS)
def test_cluster_safe_split_zero_leak_on_random_graphs(spark, n, edges):
    """For ANY pair structure: every dup pair lands in one split, the
    split is a pure function of (doc_id, cluster structure), and
    singleton docs keep the per-doc assignment exactly."""
    from snowflake_to_bq_pipeline_spark.operators import curation, graph
    from pyspark.sql import functions as F

    pairs = [
        (min(a % n, b % n), max(a % n, b % n))
        for a, b in edges
        if a % n != b % n
    ]
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(n)], "doc_id long, source string"
    )
    if pairs:
        pdf = spark.createDataFrame(
            sorted(set(pairs)), "doc_a long, doc_b long"
        )
        clusters = graph.dup_clusters(pdf)
    else:
        clusters = spark.createDataFrame(
            [],
            "doc_id long, canonical_id long, cluster_size long, "
            "is_canonical boolean",
        )
    out = {
        r["doc_id"]: r
        for r in curation.dataset_split_cluster_safe(docs, clusters).collect()
    }
    assert set(out) == set(range(n))
    # zero cross-split dup pairs, by construction
    for a, b in pairs:
        assert out[a]["split"] == out[b]["split"], (a, b)
    # cluster members share the canonical split key; singletons keep
    # their own id and therefore the per-doc assignment
    plain = {
        r["doc_id"]: r["split"]
        for r in curation.dataset_split(docs, "doc_id").collect()
    }
    clustered = {d for p in pairs for d in p}
    for i in range(n):
        if i not in clustered:
            assert out[i]["split_key"] == i
            assert out[i]["split"] == plain[i]


@given(
    docs=st.lists(
        st.tuples(
            st.text(
                alphabet="ab cdef ", min_size=0, max_size=60
            ),
            st.sampled_from(["cur", "web", "other"]),
        ),
        min_size=2,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_nbq_literal_scorer_equals_join_classifier_on_random_text(
    spark, docs
):
    """Plan-diverse equality holds for ANY corpus, not just testdata:
    the long-nanos broadcast-LUT fold reproduces the join-shaped
    classifier bit-for-bit (same round-9 terms, order-free sums)."""
    from snowflake_to_bq_pipeline_spark.operators import curation

    rows = [(i, t, s) for i, (t, s) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    batch = {
        r["doc_id"]: tuple(r)
        for r in curation.nb_quality_classifier(df, ("cur",)).collect()
    }
    model = curation.train_nbq_model(df, ("cur",))
    lit = {
        r["doc_id"]: tuple(r)
        for r in curation.score_docs_with_model(df, model).collect()
    }
    assert lit == batch
