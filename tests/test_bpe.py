"""BPE merge induction vs a pure-Python reference implementation."""

from __future__ import annotations

import re
from collections import Counter

from snowflake_to_bq_pipeline_spark.catalog import load_table
from snowflake_to_bq_pipeline_spark.operators import bpe


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    vocab = [(list(w), f) for w, f in word_freqs.items()]
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, f in vocab:
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] += f
        if not counts:
            break
        best_n = max(counts.values())
        if best_n < 2:
            break
        left, right = min(p for p, c in counts.items() if c == best_n)
        merges.append((rank, left, right, left + right, best_n))
        new_vocab = []
        for syms, f in vocab:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((out, f))
        vocab = new_vocab
    return merges


def test_bpe_merges_match_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    freqs: Counter = Counter()
    for t in texts:
        freqs.update(re.findall(bpe.WORD_RE, t.lower()))
    expected = _ref_bpe(dict(freqs), 10)
    got = [
        tuple(r)
        for r in bpe.bpe_merges(docs, n_merges=10)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expected
    # Ranks are dense 1..n. (Counts need NOT be monotone: a merge can
    # create a new pair hotter than anything before it.)
    ranks = [g[0] for g in got]
    assert ranks == list(range(1, len(got) + 1))


def _ref_encode_count(word: str, merges) -> int:
    # Mirrors the engine's padded-sentinel str.replace semantics (the
    # learner's documented merge-application rule), which Python's
    # str.replace shares with Java's.
    seq = " " + " ".join(word) + " "
    for _, left, right, merged, *_ in merges:
        seq = seq.replace(f" {left} {right} ", f" {merged} ")
    return len(seq.split())


def test_bpe_encode_matches_reference_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    merges_df = bpe.bpe_merges(docs, n_merges=10)
    merges = [
        tuple(r) for r in merges_df.orderBy("merge_rank").collect()
    ]
    assert merges, "corpus should induce at least one merge"
    out = {
        r.doc_id: r
        for r in bpe.bpe_encode_stats(docs, merges_df).collect()
    }
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    checked = 0
    for doc_id, text in sorted(texts.items())[:50]:
        words = re.findall(bpe.WORD_RE, text.lower())
        if not words:
            assert doc_id not in out
            continue
        exp_tokens = sum(_ref_encode_count(w, merges) for w in words)
        r = out[doc_id]
        assert r.n_words == len(words)
        assert r.n_bpe_tokens == exp_tokens, doc_id
        checked += 1
    assert checked >= 40
    # Merges strictly compress: fewer tokens than characters, at least
    # as many as words.
    for r in out.values():
        assert r.n_words <= r.n_bpe_tokens


def test_bpe_vocab_cap_semantics(spark, monkeypatch):
    """Above VOCAB_CAP the induction is defined as reference BPE over the
    top-cap-by-(freq, word) dictionary — exercised here by shrinking the
    cap so the tail's aggregate pair mass WOULD flip the first merge."""
    monkeypatch.setattr(bpe, "VOCAB_CAP", 5)
    head = [f"abq{i}" for i in range(1, 6)]  # freq 10 each: pair (a,b) = 50
    tail = [f"cdw{i:02d}" for i in range(20)]  # freq 3 each: pair (c,d) = 60
    text = " ".join(head * 10 + tail * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")

    freqs = Counter(re.findall(bpe.WORD_RE, text.lower()))
    capped = dict(
        sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    )
    assert set(capped) == set(head)  # the Zipf head is exactly the cap set

    got = [
        tuple(r)
        for r in bpe.bpe_merges(docs, n_merges=3).orderBy("merge_rank").collect()
    ]
    assert got == _ref_bpe(capped, 3)
    # and the cap genuinely bites: the uncapped corpus would merge (c, d)
    # first on the tail's aggregate mass
    uncapped = _ref_bpe(dict(freqs), 3)
    assert uncapped[0][1:3] == ("c", "d")
    assert got[0][1:3] == ("a", "b")
    assert got != uncapped


def test_tokenizer_fertility_report_consistency(spark, sf_dir):
    """The per-source fertility report must re-derive exactly from the
    two per-doc encode tables it composes (integer sums, 6dp ratios),
    and both fertilities must be >= 1 (a word is never fewer than one
    token under either tokenizer)."""
    from snowflake_to_bq_pipeline_spark import registry

    rows = registry.QUERIES["tokenizer_fertility_by_source"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r["n_words"] > 0
        assert r["fertility_bpe"] >= 1.0
        assert r["fertility_unigram"] >= 1.0
        assert r["fertility_bpe"] == round(
            r["n_bpe_tokens"] / r["n_words"], 6
        )
        assert r["fertility_unigram"] == round(
            r["n_unigram_tokens"] / r["n_words"], 6
        )
        assert r["unigram_vs_bpe"] == round(
            r["n_unigram_tokens"] / r["n_bpe_tokens"], 6
        )


def test_encode_precomputed_doc_word_path_identical(spark, sf_dir):
    """Both encoders must return identical per-doc stats whether they
    build the (doc_id, word, n_occ) table themselves or consume a
    precomputed doc_word_counts table (the registry's shared memo)."""
    from snowflake_to_bq_pipeline_spark.operators import unigram

    docs = load_table(spark, sf_dir, "documents")
    dw = bpe.doc_word_counts(docs)
    merges = bpe.bpe_merges(docs, n_merges=10)
    vocab = unigram.unigram_vocab(docs, vocab_size=400)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(bpe.bpe_encode_stats(docs, merges, doc_word=dw)) == rows(
        bpe.bpe_encode_stats(docs, merges)
    )
    assert rows(
        unigram.unigram_encode_stats(docs, vocab, doc_word=dw)
    ) == rows(unigram.unigram_encode_stats(docs, vocab))


def test_encode_doc_word_guard_rejects_mismatches(spark, sf_dir):
    import pytest

    from snowflake_to_bq_pipeline_spark.operators import unigram

    docs = load_table(spark, sf_dir, "documents").limit(5)
    merges = bpe.bpe_merges(docs, n_merges=3)
    vocab = unigram.unigram_vocab(docs, vocab_size=100)

    # wrong source column is caught
    other = bpe.doc_word_counts(
        docs.withColumn("other", docs.text), text_col="other"
    )
    with pytest.raises(ValueError, match="text_col"):
        bpe.bpe_encode_stats(docs, merges, doc_word=other)
    with pytest.raises(ValueError, match="text_col"):
        unigram.unigram_encode_stats(docs, vocab, doc_word=other)

    # shape check: a frame without the contract columns is rejected
    with pytest.raises(ValueError, match="missing columns"):
        bpe.bpe_encode_stats(docs, merges, doc_word=docs.select("text"))
