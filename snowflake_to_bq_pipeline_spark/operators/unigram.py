"""Unigram-LM (SentencePiece-style) tokenizer induction.

Completes the tokenizer-induction family next to BPE (operators/bpe.py):
where BPE greedily MERGES from characters upward, the unigram model of
Kudo (ACL 2018) starts from a large seed vocabulary of candidate pieces
and EM-prunes it down — the construction SentencePiece uses for most
modern LLM vocabularies.

Distributed shape — identical to the BPE learner's: ONE corpus-sized
pass collapses the text into a word-frequency dictionary (groupBy over
tokens, capped at the top ``VOCAB_CAP`` words by (freq DESC, word) —
exact below the cap, Zipf-approximate above it), and everything after is
driver-side model induction over that bounded dictionary: O(seed-vocab)
state, never O(corpus). Real trainers (SentencePiece itself) learn from
exactly such a bounded word-count dictionary.

Algorithm (deliberately simplified but PRECISELY specified, so a pure
pure-Python reference can assert bit-identical models —
tests/test_unigram.py):

1. Seed: every substring of every dictionary word up to
   ``MAX_PIECE_LEN`` chars, counted weighted by word frequency; keep the
   top ``seed_cap`` by (count DESC, piece ASC), plus every single
   character (chars are never pruned — they guarantee every word stays
   segmentable).
2. Viterbi-EM: E-step segments each dictionary word with the
   Viterbi-best split under current piece log-probs (DP over end
   positions; on score ties the EARLIEST start — i.e. the longest final
   piece — wins), counting piece usages weighted by word freq. M-step
   re-estimates log p(piece) = log(count) − log(total). Zero-count
   multi-char pieces drop; zero-count single chars are floored to
   count 1.
3. Prune: while the vocabulary exceeds ``vocab_size``, drop the
   lowest-(count ASC, piece ASC) multi-char pieces, at most
   ``PRUNE_FRAC`` of the vocabulary per round, then re-run EM.

Determinism: counts are exact integers; log-probs are
``math.log(count) − math.log(total)`` on those integers; every
tie-break is total (piece lexicographic). The model is a pure function
of the word dictionary on any engine or partitioning.

Encoding applies the SAME Viterbi (same tie-breaks) per DISTINCT word —
the Zipf-small vocabulary, not the word stream — via an Arrow-batched
pandas UDF with the O(vocab) piece table broadcast, then broadcast-joins
the per-word token counts back and sums per doc (the bpe_encode_stats
shape; the DP is genuinely iterative per word, which is exactly the
sanctioned Pandas-UDF boundary).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import VOCAB_CAP, _word_vocab

MAX_PIECE_LEN = 6
PRUNE_FRAC = 0.25
EM_ITERS = 2

VOCAB_SCHEMA = (
    "piece string, piece_freq long, log_prob double, is_char boolean"
)

#: Score for a single char absent from the trained vocabulary: a large
#: FINITE penalty, not -inf. With -inf the fallback was dead code —
#: s = best[i] + (-inf) = -inf never beats best[j] (also -inf), so
#: back[j] stayed 0 and any word containing an out-of-vocab char
#: collapsed into ONE whole-word pseudo-piece that is not in the
#: vocabulary. Finite keeps the DP totally ordered: unknown chars
#: genuinely segment as single-char pieces, each costing more than any
#: chain of real pieces (corpus log-probs are > -40), so known spans
#: still segment optimally around them. Training never hits this branch
#: (the trainer seeds every char of every dictionary word), but encoding
#: runs over ALL distinct corpus words — tail words beyond the
#: VOCAB_CAP dictionary can carry chars the model never saw.
UNK_CHAR_LOGP = -1.0e12


def _viterbi_segment(
    word: str, log_probs: dict[str, float], max_len: int
) -> list[str]:
    """Viterbi-best segmentation; on score ties the earliest start (=
    longest final piece) wins. Assumes every single char is in the model
    (the trainer guarantees it); unknown chars fall back to themselves
    with the finite UNK_CHAR_LOGP penalty so encoding never fails on
    foreign input and OOV chars segment as single-char pieces."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            lp = log_probs.get(word[i:j])
            if lp is None:
                if j - i == 1:
                    lp = UNK_CHAR_LOGP  # unknown char: worst real score
                else:
                    continue
            s = best[i] + lp
            if s > best[j]:
                best[j] = s
                back[j] = i
    out = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    return out[::-1]


def _em_counts(
    word_freqs: list[tuple[str, int]],
    log_probs: dict[str, float],
    max_len: int,
) -> dict[str, int]:
    counts: dict[str, int] = {}
    for word, freq in word_freqs:
        for piece in _viterbi_segment(word, log_probs, max_len):
            counts[piece] = counts.get(piece, 0) + freq
    return counts


def _log_probs_from_counts(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    lt = math.log(total)
    return {p: math.log(c) - lt for p, c in counts.items()}


def unigram_vocab_rows(
    documents: DataFrame,
    vocab_size: int = 400,
    text_col: str = "text",
    max_piece_len: int = MAX_PIECE_LEN,
    em_iters: int = EM_ITERS,
    seed_cap: int | None = None,
) -> list[tuple[str, int, float, bool]]:
    """Driver-side model rows backing :func:`unigram_vocab` — exposed so
    the registry can memoize the once-per-corpus induction (the
    bpe_merge_rows pattern). Returns ``(piece, piece_freq, log_prob,
    is_char)`` sorted by (piece_freq DESC, piece ASC)."""
    word_rows = (
        _word_vocab(documents, text_col)
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(VOCAB_CAP)
        .collect()
    )
    word_freqs = [(r["word"], int(r["freq"])) for r in word_rows]
    if seed_cap is None:
        seed_cap = 8 * vocab_size

    # 1. Seed counts: frequency-weighted substring occurrences.
    seed: dict[str, int] = {}
    chars: set[str] = set()
    for word, freq in word_freqs:
        n = len(word)
        chars.update(word)
        for i in range(n):
            for ln in range(1, min(max_piece_len, n - i) + 1):
                p = word[i : i + ln]
                seed[p] = seed.get(p, 0) + freq
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, seed_cap - len(chars))]
    counts = {p: c for p, c in multi}
    counts.update({ch: seed.get(ch, 1) for ch in chars})

    # 2/3. Viterbi-EM with pruning rounds.
    while True:
        log_probs = _log_probs_from_counts(counts)
        for _ in range(em_iters):
            em = _em_counts(word_freqs, log_probs, max_piece_len)
            counts = {
                p: c for p, c in em.items() if c > 0 and len(p) > 1
            }
            counts.update({ch: max(em.get(ch, 0), 1) for ch in chars})
            log_probs = _log_probs_from_counts(counts)
        n_over = len(counts) - vocab_size
        if n_over <= 0:
            break
        droppable = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (pc[1], pc[0]),
        )
        n_drop = min(
            n_over, max(1, int(len(counts) * PRUNE_FRAC)), len(droppable)
        )
        for p, _c in droppable[:n_drop]:
            del counts[p]
        if not droppable[n_drop:] and len(counts) > vocab_size:
            break  # only chars left: can't shrink further

    log_probs = _log_probs_from_counts(counts)
    return sorted(
        (
            (p, int(c), log_probs[p], len(p) == 1)
            for p, c in counts.items()
        ),
        key=lambda r: (-r[1], r[0]),
    )


def unigram_vocab(
    documents: DataFrame,
    vocab_size: int = 400,
    text_col: str = "text",
) -> DataFrame:
    """Learn the unigram-LM piece vocabulary; returns the model table
    ``(piece, piece_freq, log_prob, is_char)`` — driver-materialized
    model state (O(vocab_size) rows) parallelized back for uniform
    registry shape."""
    return documents.sparkSession.createDataFrame(
        unigram_vocab_rows(documents, vocab_size, text_col), VOCAB_SCHEMA
    )


def unigram_word_tokens(
    words: DataFrame, vocab: DataFrame, max_piece_len: int = MAX_PIECE_LEN
) -> DataFrame:
    """Viterbi-encode a DISTINCT-word frame under a learned unigram
    vocabulary → (word, word_tokens). Factored out of the per-doc stats
    so the result memoizes per (snapshot, model): the O(vocab) model
    broadcasts into an Arrow-batched pandas UDF (the per-word DP is the
    sanctioned Python boundary), and the encoded vocabulary is standing
    model-application state every consumer shares."""
    model = {r["piece"]: float(r["log_prob"]) for r in vocab.collect()}
    bc = words.sparkSession.sparkContext.broadcast(model)

    def _encode_batches(batches):
        lp = bc.value
        for pdf in batches:
            pdf["word_tokens"] = pdf["word"].map(
                lambda w: len(_viterbi_segment(w, lp, max_piece_len))
            )
            yield pdf

    return words.mapInPandas(
        _encode_batches, "word string, word_tokens int"
    )


def unigram_encode_stats(
    documents: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    max_piece_len: int = MAX_PIECE_LEN,
    doc_word: DataFrame | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """Apply a learned unigram vocabulary; per-doc token counts
    ``(doc_id, n_words, n_unigram_tokens, tokens_per_word)``.

    Same distributed shape as bpe_encode_stats: ONE regexp/explode pass
    into a (doc_id, word, n_occ) partial aggregate, Viterbi encoding over
    the DISTINCT vocabulary only (Zipf-small vs the corpus) with the
    O(vocab) model broadcast into an Arrow-batched pandas UDF (the DP is
    per-word iterative — the sanctioned Python boundary), broadcast-join
    back, and an ``n_occ``-weighted per-doc sum. Pass ``doc_word``
    (a bpe.doc_word_counts table — both tokenizers apply over the SAME
    lowercased WORD_RE word grain, e.g. the registry's per-snapshot
    memo) to skip the corpus scan, and ``encoded`` (a
    :func:`unigram_word_tokens` table for the SAME model, e.g. the
    registry's per-(snapshot, tokenizer) memo) to skip the Viterbi pass.
    """
    if doc_word is None:
        from ._cache import swap_cache
        from .bpe import doc_word_counts

        doc_word = swap_cache(
            "unigram.doc_word", doc_word_counts(documents, text_col)
        )
    else:
        from .bpe import _require_doc_word

        _require_doc_word(doc_word, text_col, "unigram_encode_stats")
    if encoded is None:
        encoded = unigram_word_tokens(
            doc_word.select("word").distinct(), vocab, max_piece_len
        )
    return (
        doc_word.join(F.broadcast(encoded), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").alias("n_words"),
            F.sum(F.col("n_occ") * F.col("word_tokens")).alias(
                "n_unigram_tokens"
            ),
        )
        .select(
            "doc_id",
            "n_words",
            "n_unigram_tokens",
            F.round(
                F.col("n_unigram_tokens").cast("double")
                / F.col("n_words").cast("double"),
                6,
            ).alias("tokens_per_word"),
        )
    )
