"""Unigram-LM induction (operators/unigram.py) vs an independent
pure-Python reference implementing the documented semantics:

- seed = freq-weighted substring counts, top (count DESC, piece ASC)
  capped, all single chars kept;
- Viterbi-EM (ties: earliest start wins), integer counts, chars floored
  to 1;
- prune lowest (count ASC, piece ASC) multi-char pieces, at most
  PRUNE_FRAC per round;
- log p = log(count) − log(total) on the exact integers.

The learned model must be BIT-IDENTICAL (pieces, integer freqs, float
log-probs), and the distributed encoder's per-doc token counts must
match reference segmentation word-by-word.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.catalog import load_table
from snowflake_to_bq_pipeline_spark.operators import unigram


def _ref_viterbi(word, lp, max_len):
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            piece = word[i:j]
            if piece in lp:
                s = best[i] + lp[piece]
            elif j - i == 1:
                s = best[i] + unigram.UNK_CHAR_LOGP
            else:
                continue
            if s > best[j]:
                best[j], back[j] = s, i
    segs = []
    j = n
    while j > 0:
        segs.append(word[back[j] : j])
        j = back[j]
    return segs[::-1]


def _ref_train(word_freqs, vocab_size=400, max_piece=6, em_iters=2,
               prune_frac=0.25):
    seed_cap = 8 * vocab_size
    seed, chars = {}, set()
    for w, f in word_freqs:
        chars.update(w)
        for i in range(len(w)):
            for ln in range(1, min(max_piece, len(w) - i) + 1):
                p = w[i : i + ln]
                seed[p] = seed.get(p, 0) + f
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, seed_cap - len(chars))]
    counts = dict(multi)
    counts.update({ch: seed.get(ch, 1) for ch in chars})

    def logp(cs):
        lt = math.log(sum(cs.values()))
        return {p: math.log(c) - lt for p, c in cs.items()}

    while True:
        lp = logp(counts)
        for _ in range(em_iters):
            em = {}
            for w, f in word_freqs:
                for p in _ref_viterbi(w, lp, max_piece):
                    em[p] = em.get(p, 0) + f
            counts = {p: c for p, c in em.items() if c > 0 and len(p) > 1}
            counts.update({ch: max(em.get(ch, 0), 1) for ch in chars})
            lp = logp(counts)
        n_over = len(counts) - vocab_size
        if n_over <= 0:
            break
        droppable = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (pc[1], pc[0]),
        )
        n_drop = min(n_over, max(1, int(len(counts) * prune_frac)),
                     len(droppable))
        for p, _ in droppable[:n_drop]:
            del counts[p]
        if not droppable[n_drop:] and len(counts) > vocab_size:
            break
    lp = logp(counts)
    return sorted(
        ((p, c, lp[p], len(p) == 1) for p, c in counts.items()),
        key=lambda r: (-r[1], r[0]),
    )


def _word_freqs(ddb):
    rows = ddb.execute(
        """
        SELECT word, COUNT(*) AS freq FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
          FROM documents
        ) GROUP BY word ORDER BY freq DESC, word
        """
    ).fetchall()
    return [(w, int(f)) for w, f in rows]


def test_unigram_model_matches_pure_python_reference(spark, sf_dir, ddb):
    got = unigram.unigram_vocab_rows(
        load_table(spark, sf_dir, "documents"), vocab_size=400
    )
    expect = _ref_train(_word_freqs(ddb), vocab_size=400)
    assert len(got) <= 400 + len({c for p, *_ in expect for c in p})
    assert got == expect  # pieces, integer freqs, float log-probs, flags


def test_unigram_encode_matches_reference_segmentation(spark, sf_dir, ddb):
    docs = load_table(spark, sf_dir, "documents")
    vocab = unigram.unigram_vocab(docs, vocab_size=400)
    lp = {r["piece"]: r["log_prob"] for r in vocab.collect()}

    got = {
        r["doc_id"]: (r["n_words"], r["n_unigram_tokens"])
        for r in unigram.unigram_encode_stats(docs, vocab).collect()
    }
    ref_rows = ddb.execute(
        """
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+')
        FROM documents
        """
    ).fetchall()
    for doc_id, words in ref_rows:
        if not words:
            assert doc_id not in got
            continue
        n_tok = sum(
            len(_ref_viterbi(w, lp, unigram.MAX_PIECE_LEN)) for w in words
        )
        assert got[doc_id] == (len(words), n_tok), doc_id


def test_unigram_oov_chars_segment_as_single_char_pieces():
    """A word containing a char absent from the trained vocabulary must
    segment around it — the OOV char alone as one piece, the known spans
    segmented normally — instead of collapsing into one whole-word
    pseudo-piece (the dead -inf fallback's failure mode: -inf + x never
    beat -inf, so back[j] stayed 0 and the backtrace emitted word[0:n])."""
    lp = {"a": -1.0, "b": -1.5, "ab": -0.5}
    # 'q' is OOV: best split is ab | q | ab (2 real pieces + 1 unknown),
    # not the whole word 'abqab'.
    assert unigram._viterbi_segment("abqab", lp, 6) == ["ab", "q", "ab"]
    # every OOV char stands alone, even consecutively
    assert unigram._viterbi_segment("qq", lp, 6) == ["q", "q"]
    # all-known words are untouched by the fallback
    assert unigram._viterbi_segment("abab", lp, 6) == ["ab", "ab"]
    # the reference DP in this file agrees (bit-identity guard)
    for w in ("abqab", "qq", "abab", "qabq"):
        assert _ref_viterbi(w, lp, unigram.MAX_PIECE_LEN) == (
            unigram._viterbi_segment(w, lp, unigram.MAX_PIECE_LEN)
        ), w


def test_unigram_vocab_invariants(spark, sf_dir):
    rows = unigram.unigram_vocab_rows(
        load_table(spark, sf_dir, "documents"), vocab_size=400
    )
    pieces = [r[0] for r in rows]
    assert len(pieces) == len(set(pieces))
    chars = {p for p in pieces if len(p) == 1}
    # every char of every piece is itself in the vocab (segmentability)
    assert all(c in chars for p in pieces for c in p)
    # log-probs normalize: sum of exp(log_prob) == 1 (counts/total)
    assert abs(sum(math.exp(r[2]) for r in rows) - 1.0) < 1e-9
    assert all(r[1] >= 1 for r in rows)
