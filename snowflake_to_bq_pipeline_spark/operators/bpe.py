"""BPE merge induction: learn tokenizer merges from the corpus.

The token-counting ops (text.bpe_token_stats) APPLY a pretokenizer;
this learns one — the byte-pair-encoding merge table of Sennrich et al.
(ACL 2016), the standard subword vocabulary construction for LLM
training corpora.

Distributed shape: the corpus collapses once into a word-frequency
vocabulary (one groupBy over tokens — the only corpus-sized pass),
capped at the top ``VOCAB_CAP`` words by frequency. The capped vocab
is bounded MODEL-TRAINING state (like the IVF centroids): real
tokenizer trainers (HuggingFace ``tokenizers``, SentencePiece) learn
merges from exactly such a bounded word-count dictionary. Above the
cap the induction is deliberately APPROXIMATE: the Zipf head carries
the dominant pair mass, but the truncated tail's aggregate mass can in
principle flip a near-tie merge decision and the reported pair counts
shrink by the tail's contribution — the exact capped semantics
(merges ≡ reference BPE over the top-``VOCAB_CAP``-by-(freq, word)
dictionary) are pinned by a pytest. The merge loop then
runs driver-side over that dictionary: 10 merges over <=256k words is
millions of integer adds, not a distributed job, and replacing 10
(shuffle + sort + collect) Spark rounds with one collect removes the
per-iteration scheduling cost entirely at ANY corpus scale.

Determinism: pair counts are exact integer sums; ties break on the
lexicographically smallest pair, so the merge table is a pure function
of the corpus on any engine or partitioning. Merge application is
left-to-right non-overlapping (str.replace semantics) — the pytest
cross-checks the whole table against a pure-Python reference BPE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._cache import swap_cache

#: Token pattern shared with the text ops: lowercase alnum runs.
WORD_RE = "[a-z0-9]+"

#: Bounded word-frequency dictionary size for merge learning: makes the
#: driver-side model state O(1) in corpus size (collected rows, not corpus
#: rows). Below the cap the induction is exact; above it, approximate —
#: the Zipf head carries the dominant pair mass, but tail truncation can
#: flip near-tie merges and shrinks reported pair counts.
VOCAB_CAP = 1 << 18


def fan_out_docs(documents: DataFrame, text_col: str) -> DataFrame:
    """Parallelize the CPU-heavy regexp/explode scan (catalog.fan_out)."""
    from ..catalog import fan_out

    return fan_out(documents.select("doc_id", F.col(text_col)))


def _word_vocab(documents: DataFrame, text_col: str) -> DataFrame:
    from ..catalog import fan_out

    words = fan_out(documents.select(F.col(text_col))).select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


MERGES_SCHEMA = (
    "merge_rank int, left_sym string, right_sym string, "
    "merged_sym string, pair_count long"
)


def bpe_merges(
    documents: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the ordered merge table
    ``(merge_rank, left_sym, right_sym, merged_sym, pair_count)``.

    Stops early when no pair occurs at least twice (further merges would
    be noise). The returned DataFrame is driver-materialized model state
    (O(n_merges) rows), parallelized back for uniform registry shape.
    """
    return documents.sparkSession.createDataFrame(
        bpe_merge_rows(documents, n_merges, text_col), MERGES_SCHEMA
    )


def bpe_merge_rows(
    documents: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> list[tuple[int, str, str, str, int]]:
    """Driver-side merge list backing :func:`bpe_merges` — the raw model
    state, exposed so callers (registry) can memoize the once-per-corpus
    induction instead of re-learning it in every query that applies it.

    One distributed pass builds the word-frequency dictionary (capped at
    the top ``VOCAB_CAP`` words by ``(freq DESC, word)`` — deterministic;
    exact below the cap, approximate above it per the module docstring);
    the merge loop itself runs driver-side over that bounded
    dictionary with the SAME semantics the previous distributed learner
    had: exact integer pair counts, lexicographically-smallest tie-break
    on the ``"left right"`` key, stop when the best pair count drops
    below 2, and padded-sentinel ``str.replace`` merge application.
    """
    vocab_rows = (
        _word_vocab(documents, text_col)
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(VOCAB_CAP)
        .collect()
    )
    # " c h a r s " — sentinel spaces so every symbol occurrence,
    # including first/last, matches the padded " a b " search key.
    vocab = [
        (" " + " ".join(r["word"]) + " ", int(r["freq"])) for r in vocab_rows
    ]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for seq, freq in vocab:
            syms = seq.split()
            for x, y in zip(syms, syms[1:]):
                key = (x, y)
                counts[key] = counts.get(key, 0) + freq
        if not counts:
            break
        best_n = max(counts.values())
        if best_n < 2:
            break
        # Space-joined string order equals (left, right) tuple order when
        # symbols are space-free (0x20 sorts below every alnum char), so
        # min() here reproduces the old ORDER BY n DESC, pair ASC.
        left, right = min(p for p, c in counts.items() if c == best_n)
        merged = left + right
        merges.append((rank, left, right, merged, best_n))
        vocab = [
            (seq.replace(f" {left} {right} ", f" {merged} "), freq)
            for seq, freq in vocab
        ]
    return merges


def doc_word_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, word, n_occ)`` — the tokenizer-application input table:
    one regexp/explode pass into a partially-aggregated word-count grain
    (map-side combine collapses repeated words before the shuffle),
    lowercased ``WORD_RE`` words, exactly the tokenization both the BPE
    and unigram learners trained on. Both encoders (and any fertility
    comparison over them) consume this same table, so the registry
    memoizes it per corpus snapshot (``_doc_word_for``) — the standing
    word-frequency asset a production tokenizer pipeline persists."""
    counted = (
        fan_out_docs(documents, text_col)
        .select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_RE), 0
                )
            ).alias("word"),
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    # carry the source column as metadata so consumers that accept a
    # precomputed table can verify it (same contract device as
    # neardup.hashed_shingles' shingle_k/text_col metadata)
    return counted.select(
        "doc_id",
        F.col("word").alias("word", metadata={"word_text_col": text_col}),
        "n_occ",
    )


def _require_doc_word(doc_word: DataFrame, text_col: str, caller: str) -> None:
    """Fail LOUDLY when a precomputed doc_word table doesn't match the
    encoder's contract — a silent grain/column mismatch would return
    wrong token counts (the hashed-shingles guard's rationale, applied
    to the tokenizer-application input)."""
    missing = {"doc_id", "word", "n_occ"} - set(doc_word.columns)
    if missing:
        raise ValueError(
            f"{caller}: doc_word table missing columns {sorted(missing)}"
        )
    meta = doc_word.schema["word"].metadata or {}
    built_col = meta.get("word_text_col")
    if built_col is not None and built_col != text_col:
        raise ValueError(
            f"{caller}: doc_word table was built from text_col="
            f"{built_col!r} but the encoder was asked to apply over "
            f"text_col={text_col!r}"
        )


def bpe_word_tokens(words: DataFrame, merges: DataFrame) -> DataFrame:
    """Apply a learned merge table to a DISTINCT-word frame →
    (word, word_tokens). The model-application half factored out so its
    result can be memoized per (snapshot, model): merges are O(n_merges)
    driver state replayed as a fixed chain of JVM ``F.replace`` calls —
    no Python in the hot path, no shuffle (per-row projection)."""
    ordered = sorted(
        (
            (int(r["merge_rank"]), r["left_sym"], r["right_sym"], r["merged_sym"])
            for r in merges.collect()
        ),
    )
    seq = F.concat(
        F.lit(" "),
        F.concat_ws(" ", F.split(F.col("word"), "")),
        F.lit(" "),
    )
    for _, left, right, merged in ordered:
        seq = F.replace(seq, F.lit(f" {left} {right} "), F.lit(f" {merged} "))
    return words.select(
        "word",
        F.array_size(F.split(F.trim(seq), " ")).alias("word_tokens"),
    )


def bpe_encode_stats(
    documents: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    doc_word: DataFrame | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """Apply a learned merge table; per-doc BPE token counts.

    The tokenizer-application half of :func:`bpe_merges` (which learns
    the table): every word starts as characters and the merges replay in
    rank order with the SAME padded-sentinel string-replace semantics the
    learner used, so learn->encode round-trips bit-identically.

    Distributed shape: merges are O(n_merges) driver-state (collected
    once — they ARE the model); the corpus regexp/explode pass runs ONCE
    into a ``(doc_id, word, n_occ)`` partial aggregate (map-side combine
    collapses repeated words before the shuffle) held in the managed
    persist, because BOTH consumers — the distinct-word vocabulary and
    the per-doc rollup — hang off it and Spark does not reuse exchanges
    across consumers (see operators/_cache.py). Encoding runs over the
    DISTINCT vocabulary (Zipf-small vs the corpus), broadcast-joins back,
    and the final per-doc aggregation sums pre-counted occurrences
    (``n_occ``-weighted), so the post-persist shuffles move per-doc
    distinct words, not the raw word stream. Per-word token counts stay
    JVM-side end to end — the merge replay is a fixed chain of
    ``F.replace`` calls, no Python in the hot path.

    Output: (doc_id, n_words, n_bpe_tokens, tokens_per_word).

    Pass ``doc_word`` (a :func:`doc_word_counts` table, e.g. the
    registry's per-snapshot memo shared with the unigram encoder) to
    skip the corpus scan — it is expected to arrive already persisted.
    Pass ``encoded`` (a :func:`bpe_word_tokens` table for the SAME
    model, e.g. the registry's per-(snapshot, tokenizer) memo) to skip
    the merge replay entirely — the encoded vocabulary is standing
    model-application state shared by every consumer of this tokenizer.
    """
    if doc_word is None:
        doc_word = swap_cache(
            "bpe.doc_word", doc_word_counts(documents, text_col)
        )
    else:
        _require_doc_word(doc_word, text_col, "bpe_encode_stats")
    if encoded is None:
        encoded = bpe_word_tokens(doc_word.select("word").distinct(), merges)
    return (
        doc_word.join(F.broadcast(encoded), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").alias("n_words"),
            F.sum(F.col("n_occ") * F.col("word_tokens")).alias(
                "n_bpe_tokens"
            ),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_tokens",
            F.round(
                F.col("n_bpe_tokens").cast("double")
                / F.col("n_words").cast("double"),
                6,
            ).alias("tokens_per_word"),
        )
    )
