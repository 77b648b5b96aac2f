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
