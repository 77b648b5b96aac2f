"""Text-analysis operators for LLM-training-data pipelines.

Not present in the reference (its documents are structured business rows);
these extend the engine per SURVEY.md §2-E: token statistics, heuristic
quality scoring, language ID, and content fingerprinting over the
``documents`` table.

All metrics are pure built-in column expressions (regexp/length/hash) —
JVM codegen, no Python UDFs — and every float derives from exact integer
counts through a fixed expression, so results are engine-reproducible.

Scale: the per-doc metrics are embarrassingly parallel row transforms
with no shuffle at all; the corpus-level ops (vocab, TF-IDF, coverage)
shuffle only reduced aggregates — token counts partial-combine map-side,
TF-IDF stacks its per-doc totals/norms as windows on the rank exchange,
and global rankings use the two-phase row number (no single-partition
sorts anywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"
STOPWORD_RE = r"\b(the|a|is|and|of|to|in)\b"


def _tokens(col: Column) -> Column:
    # idx=0 → whole-match extraction (Spark defaults to group 1).
    return F.regexp_extract_all(col, F.lit(TOKEN_RE), 0)


def text_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document size/token statistics."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_chars = F.length(t)
    n_tokens = F.array_size(toks)
    n_alpha = F.length(F.regexp_replace(t, "[^a-z]", ""))
    n_spaces = n_chars - F.length(F.regexp_replace(t, " ", ""))
    return documents.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.array_size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        n_alpha.alias("n_alpha_chars"),
        F.when(
            n_tokens > 0, F.round(n_alpha.cast("double") / n_tokens, 4)
        ).alias("avg_token_len"),
        F.when(
            n_chars > 0, F.round(n_spaces.cast("double") / n_chars, 4)
        ).alias("whitespace_ratio"),
    )


def quality_score_cols(t: Column) -> tuple[Column, Column, Column]:
    """(n_tokens, score, bucket) expression triple for ``t`` — shared by
    the per-doc view and any rollup so every consumer scores identically
    (row-local; composes into a single scan)."""
    toks = _tokens(t)
    n_tokens = F.array_size(toks)
    stop_hits = F.array_size(F.regexp_extract_all(t, F.lit(STOPWORD_RE), 0))
    len_score = F.least(n_tokens.cast("double") / F.lit(50.0), F.lit(1.0))
    stop_ratio = F.when(
        n_tokens > 0, stop_hits.cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    diversity = F.when(
        n_tokens > 0,
        F.array_size(F.array_distinct(toks)).cast("double") / n_tokens,
    ).otherwise(F.lit(0.0))
    score = F.round(
        F.lit(0.4) * len_score
        + F.lit(0.3) * (F.lit(1.0) - F.least(stop_ratio * F.lit(2.0), F.lit(1.0)))
        + F.lit(0.3) * diversity,
        4,
    )
    bucket = (
        F.when(score >= 0.75, F.lit("high"))
        .when(score >= 0.5, F.lit("medium"))
        .otherwise(F.lit("low"))
    )
    return n_tokens, score, bucket


def quality_score(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score + bucket (length / stopword / diversity mix),
    the composition style of C4/Gopher-class quality filters."""
    n_tokens, score, bucket = quality_score_cols(F.col(text_col))
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        score.alias("quality_score"),
        bucket.alias("quality_bucket"),
    )


def lang_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language heuristic (n-gram LID in miniature).

    Real pipelines plug fastText/CLD3 in as a Pandas UDF here; the
    heuristic keeps the operator dependency-free and oracle-checkable.
    """
    t = F.col(text_col)
    n_tokens = F.array_size(_tokens(t))
    en_hits = F.array_size(F.regexp_extract_all(t, F.lit(STOPWORD_RE), 0))
    return documents.select(
        "doc_id",
        F.col("lang"),
        F.when((n_tokens > 0) & (en_hits * 5 >= n_tokens), F.lit("en"))
        .otherwise(F.lit("unknown"))
        .alias("predicted_lang"),
        F.when(
            n_tokens > 0, F.round(en_hits.cast("double") / n_tokens, 4)
        ).alias("en_hit_ratio"),
    )


#: BPE-style pretokenizer, simplified from the GPT-2 pattern: contraction
#: suffixes, space-prefixed letter runs, space-prefixed digit runs,
#: space-prefixed punctuation runs, residual whitespace. The original's
#: trailing-whitespace lookahead is dropped deliberately — lookaround is
#: not RE2-expressible, and this must evaluate identically under Java
#: regex (Spark) and RE2 (the DuckDB oracle).
BPE_RE = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"


def bpe_token_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counts under the BPE-ish pretokenizer vs plain whitespace.

    Training-data budgeting needs token counts under the model's
    tokenizer family, not word counts — the pretokenizer segment count is
    the standard cheap proxy (each segment maps to >= 1 BPE merge-table
    token, and the ratio to whitespace words calibrates corpus token
    budgets). One scan, all JVM-side regexp — no shuffle, no Python.
    """
    t = F.col(text_col)
    n_bpe = F.array_size(F.regexp_extract_all(t, F.lit(BPE_RE), 0))
    n_ws = F.array_size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0))
    return documents.select(
        "doc_id",
        n_bpe.alias("n_bpe_tokens"),
        n_ws.alias("n_ws_tokens"),
        F.when(
            n_ws > 0, F.round(n_bpe.cast("double") / n_ws, 4)
        ).otherwise(F.lit(0.0)).alias("bpe_per_word"),
    )


def fingerprint(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """md5 fingerprint of whitespace-normalized lowercased text."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "[ \\t\\n\\r]+", " ")
    )
    return documents.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("fingerprint"),
        F.length(norm).alias("n_chars_norm"),
    )


def vocab_top_k(
    documents: DataFrame,
    k: int = 20,
    text_col: str = "text",
    tok_counts: DataFrame | None = None,
) -> DataFrame:
    """Corpus-wide token heavy hitters (vocabulary building).

    Explode→count is partial-aggregated map-side, so the shuffle carries
    one row per (partition, token), not per occurrence; top-k is a single
    ordered take of the (tiny) aggregate. With a shared ``tok_counts``
    (unigram_tok_counts), occurrences are the exact-integer re-sum of the
    per-doc counts — identical values, one less corpus scan per session.
    """
    if tok_counts is None:
        counts = (
            documents.select(F.explode(_tokens(F.col(text_col))).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("occurrences"))
        )
    else:
        counts = tok_counts.groupBy("token").agg(
            F.sum("term_count").alias("occurrences")
        )
    return (
        counts.orderBy(F.col("occurrences").desc(), F.col("token"))
        .limit(k)
    )


def length_histogram(
    documents: DataFrame, bucket_width: int = 10, text_col: str = "text"
) -> DataFrame:
    """Token-length histogram (corpus length distribution for filtering).

    Bucketing uses explicit floor — engines disagree on double→int cast
    rounding.
    """
    n_tokens = F.array_size(_tokens(F.col(text_col)))
    bucket = F.floor(n_tokens / F.lit(float(bucket_width)))
    return (
        documents.select(bucket.alias("bucket_id"))
        .groupBy("bucket_id")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .select(
            "bucket_id",
            (F.col("bucket_id") * bucket_width).cast("long").alias("bucket_lo"),
            ((F.col("bucket_id") + 1) * bucket_width).cast("long").alias("bucket_hi"),
            "doc_count",
        )
    )


def unigram_tok_counts(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-(doc, token) unigram term counts — the shared first stage of
    ``tfidf_top_terms`` / ``vocab_top_k`` / ``vocab_coverage_curve``.

    All three queries start from the same regex tokenizer and the same
    explode + groupBy(doc_id, token) aggregation; the registry memoizes
    this table per corpus fingerprint (registry._tok_counts_for) so a
    session running several of them pays the tokenize+count scan once.
    (tfidf_doc_similarity does NOT share it: its term space is word
    3-GRAMS by design — unigram inverted-index buckets are hot, see its
    docstring — so its chain is disjoint and persisted internally.)
    """
    from ..catalog import fan_out

    toks = fan_out(documents.select("doc_id", F.col(text_col))).select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("token")
    )
    return toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("term_count")
    )


def tfidf_top_terms(
    documents: DataFrame,
    k: int = 5,
    text_col: str = "text",
    tok_counts: DataFrame | None = None,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    tf = term count / doc length, idf = ln(N / df) — every factor derives
    from exact integer counts, so scores are engine-reproducible. Corpus
    stats (N, df) are aggregates joined back; the per-doc top-k is one
    window over the (doc, token) partition.

    Scale: token counts partial-aggregate on (doc_id, token); df is a
    second partial aggregate of that (already-reduced) output; N is a
    1-row broadcast. Nothing touches the driver. Pass a precomputed
    ``tok_counts`` (unigram_tok_counts output, e.g. the registry's
    fingerprint memo) to share the tokenize+count stage with the vocab
    queries.
    """
    from pyspark.sql import Window

    if tok_counts is None:
        tok_counts = unigram_tok_counts(documents, text_col)
    n_docs = documents.agg(F.count(F.lit(1)).alias("__n_docs"))

    # Both corpus statistics ride frame-less windows (token partition,
    # then the doc partition the rank needs anyway) — replaces two
    # groupBy+join rounds with two stacked exchanges, exact counts.
    doc_freq = F.count(F.lit(1)).over(Window.partitionBy("token"))
    doc_tokens = F.sum("term_count").over(Window.partitionBy("doc_id"))
    tf = F.col("term_count").cast("double") / F.col("__dt").cast("double")
    idf = F.log(F.col("__n_docs").cast("double") / F.col("doc_freq").cast("double"))
    scored = (
        tok_counts.crossJoin(F.broadcast(n_docs))
        .withColumn("doc_freq", doc_freq.cast("long"))
        .withColumn("__dt", doc_tokens)
        .select(
            "doc_id",
            "token",
            "term_count",
            "doc_freq",
            F.round(tf * idf, 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


#: Wide decimal for similarity dot products: tfidf weights sit near zero,
#: so 6 fractional digits would round products like 0.004*0.003 into the
#: tie-breaking zone; 12 digits keeps the exact-sum trick safely above it.
SIM_DEC = "decimal(28,12)"


#: Max-df guard for the tfidf self-join: a top-k token held by more
#: documents than this is a hot inverted-index bucket (its join cell is
#: df² pairs) and is excluded from CANDIDATE GENERATION — never from the
#: dot product, so results are exact (see tfidf_doc_similarity).
TFIDF_MAX_DF = 1024


def tfidf_topk_table(
    documents: DataFrame,
    k: int = 10,
    text_col: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """The ``(doc_id, token, w, nrm)`` top-k TF-IDF table behind
    :func:`tfidf_doc_similarity` — returned UNpersisted; callers own
    materialization (the similarity op routes it through swap_cache when
    building its own; the registry memoizes ONE persisted handle per
    corpus snapshot, because profiling showed the per-call rebuild of
    this chain during the guard's stats collect was the whole
    steady-state cost of the query: ~4s construct vs 0.4s execute at
    sf0.1). Deterministic given the corpus (exact integer counts,
    fixed-expression weights), so snapshot-keyed reuse is exact."""
    from pyspark.sql import Window

    w = F.split(F.col(text_col), " ")
    idx = F.when(
        F.array_size(w) >= ngram,
        F.sequence(F.lit(1), F.array_size(w) - (ngram - 1)),
    ).otherwise(F.array().cast("array<int>"))
    parts = [F.element_at(F.col("__w"), F.col("i") + j) for j in range(ngram)]
    grams = documents.select(
        "doc_id", w.alias("__w"), F.explode(idx).alias("i")
    ).select("doc_id", F.concat_ws(" ", *parts).alias("token"))

    from ._cache import swap_cache

    tok_counts = swap_cache(
        "tfidf_sim_tok_counts",
        grams.groupBy("doc_id", "token").agg(
            F.count(F.lit(1)).alias("term_count")
        ),
    )
    n_docs = documents.agg(F.count(F.lit(1)).alias("__n_docs"))
    # BOTH corpus statistics ride windows instead of groupBy+join: the
    # document frequency is a frame-less count over the token partition,
    # per-doc token totals a frame-less sum over the doc partition the
    # rank window needs anyway. Two exchanges total (token, then doc) and
    # no join — exact integer counts, so w is unchanged.
    doc_freq = F.count(F.lit(1)).over(Window.partitionBy("token"))
    doc_tokens = F.sum("term_count").over(Window.partitionBy("doc_id"))
    tf = F.col("term_count").cast("double") / F.col("__dt").cast("double")
    idf = F.log(
        F.col("__n_docs").cast("double") / F.col("__df").cast("double")
    )
    scored = (
        tok_counts.crossJoin(F.broadcast(n_docs))
        .withColumn("__df", doc_freq)
        .withColumn("__dt", doc_tokens)
        .select("doc_id", "token", F.round(tf * idf, 6).alias("w"))
    )
    rank_w = Window.partitionBy("doc_id").orderBy(
        F.col("w").desc(), F.col("token")
    )
    # The per-doc norm rides the SAME doc_id partition as the rank: a
    # stacked frame-less window sums w^2 over the rows that survived the
    # rank filter (exact decimals, add-order-free), so each top-k row
    # carries its document's norm into the self-join — no norms groupBy
    # and no per-side pair joins afterwards (three shuffles gone).
    norm_w = Window.partitionBy("doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .withColumn(
            "nrm",
            F.sqrt(
                F.sum((F.col("w") * F.col("w")).cast(SIM_DEC))
                .over(norm_w)
                .cast("double")
            ),
        )
        .select("doc_id", "token", "w", "nrm")
    )


def tfidf_doc_similarity(
    documents: DataFrame,
    threshold: float = 0.7,
    k: int = 10,
    text_col: str = "text",
    ngram: int = 3,
    max_df: int = TFIDF_MAX_DF,
    topk: DataFrame | None = None,
) -> DataFrame:
    """Doc-doc cosine similarity on top-k TF-IDF terms (sparse vectors).

    The classic inverted-index plan: keeping only each document's k most
    characteristic terms bounds the per-doc vector, and using word
    ``ngram``-grams as terms keeps the per-term join bucket sparse — the
    term space grows as vocab^n, so document frequencies collapse and the
    term self-join stays far from quadratic. (Unigram terms measured 30×
    slower on this corpus: a small vocabulary makes every inverted-index
    bucket a sizable fraction of the corpus — the hot-key join in
    disguise.) Dot products and norms sum exact decimals
    (add-order-independent); cosine divides the resulting doubles with a
    textually fixed expression, so the oracle hash-matches.

    Scale: shuffle on term (sparse buckets), then one shuffle on the pair
    key. Residual hot n-grams (corpus-wide boilerplate that still makes
    many top-k lists) are handled by the max-df guard: tokens with top-k
    document frequency > ``max_df`` are excluded from CANDIDATE
    GENERATION, and candidate pairs are then exactly rescored over their
    FULL top-k vectors — so the guard changes which join buckets exist,
    never the output. Completeness bound (why no pair is lost at high τ):
    a pair can only be missed if every shared token is high-df and at
    least one endpoint doc d is non-exempt, i.e. has high-token squared
    norm mass hm(d) = Σ_{t hot} (w_t/‖d‖)² < τ²·0.98; Cauchy-Schwarz over
    the shared tokens then caps the pair's cosine at √hm(d)·1 < τ. Docs
    violating the mass bound are exempt (their rows stay join-eligible),
    so the argument holds unconditionally. The guard activates only when
    a hot token exists — detected with one bounded aggregate over the
    persisted top-k table (max df is O(1) driver state); on clean corpora
    the plan is the plain single self-join. The check's price is one
    small job that happens to fill the top-k persist before the join
    instead of inside it (~0.5s at sf0.1, flat in corpus size relative
    to the join it guards).
    """
    from pyspark.sql import Window

    if topk is None:
        # Persisted: both self-join sides AND the guard-stats collect
        # consume the chain (explode -> counts -> idf -> stacked
        # windows), and the executed plan does not reuse the exchange
        # across them. k rows per doc. Callers that run the query
        # repeatedly on one corpus snapshot should pass a memoized
        # ``topk`` instead — the per-call rebuild of this persist during
        # the stats collect is the dominant steady-state cost (profiled
        # ~4s of a ~4.4s call at sf0.1; see tfidf_topk_table).
        from ._cache import swap_cache

        topk = swap_cache(
            "tfidf_topk", tfidf_topk_table(documents, k, text_col, ngram)
        )
    a = topk.select(
        F.col("doc_id").alias("doc_a"),
        "token",
        F.col("w").alias("wa"),
        F.col("nrm").alias("__na"),
    )
    b = topk.select(
        F.col("doc_id").alias("doc_b"),
        "token",
        F.col("w").alias("wb"),
        F.col("nrm").alias("__nb"),
    )

    # Max-df guard activation check: one bounded aggregate over the
    # persisted top-k table (the persist fills here if cold — every later
    # consumer reuses it). O(1) rows to the driver.
    hottest = topk.groupBy("token").agg(
        F.count(F.lit(1)).alias("__df2")
    ).agg(F.max("__df2").alias("m")).collect()[0]["m"]

    if hottest is not None and hottest > max_df:
        # Hot regime: candidates come from non-hot tokens (plus all rows
        # of exempt docs — see docstring bound), then every candidate
        # pair is rescored over its FULL top-k vectors, so values and the
        # surviving pair set are identical to the unguarded plan.
        tdf = topk.groupBy("token").agg(F.count(F.lit(1)).alias("__df2"))
        nw = F.col("w") / F.col("nrm")
        hm = F.sum(
            F.when(F.col("__df2") > max_df, nw * nw).otherwise(F.lit(0.0))
        ).over(Window.partitionBy("doc_id"))
        elig = (
            topk.join(tdf, "token")
            .withColumn("__hm", hm)
            .filter(
                (F.col("__df2") <= max_df)
                | (F.col("__hm") >= F.lit(threshold * threshold * 0.98))
            )
            .select("doc_id", "token")
        )
        cand = (
            elig.select(F.col("doc_id").alias("doc_a"), "token")
            .join(elig.select(F.col("doc_id").alias("doc_b"), "token"), "token")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .dropDuplicates()
        )
        dots = (
            cand.join(a, "doc_a")
            .join(b, ["token", "doc_b"])
            .groupBy("doc_a", "doc_b", "__na", "__nb")
            .agg(
                F.sum((F.col("wa") * F.col("wb")).cast(SIM_DEC))
                .cast("double")
                .alias("__dot")
            )
        )
    else:
        dots = (
            a.join(b, "token")
            .filter(F.col("doc_a") < F.col("doc_b"))
            # __na/__nb are functions of the doc ids, so adding them to the
            # grouping key changes no groups — it just carries them through.
            .groupBy("doc_a", "doc_b", "__na", "__nb")
            .agg(
                F.sum((F.col("wa") * F.col("wb")).cast(SIM_DEC))
                .cast("double")
                .alias("__dot")
            )
        )
    return dots.select(
        "doc_a",
        "doc_b",
        F.round(F.col("__dot") / (F.col("__na") * F.col("__nb")), 6).alias(
            "cosine"
        ),
    ).filter(F.col("cosine") >= threshold)


#: Add-one smoothing mass for the char-LM: a fixed pseudo-alphabet size
#: shared by engine and oracle (the corpus alphabet is lowercase alnum +
#: punctuation, comfortably under this).
CHARLM_ALPHABET = 64
#: Fluency cutoff on average negative log-prob (nats/char-trigram):
#: reference-slice text scores ~uniform-in-model; garbage scores near
#: ln(alphabet) ≈ 4.16.
CHARLM_NLL_CUTOFF = 4.0


def charlm_perplexity(
    documents: DataFrame,
    ref_source: str,
    text_col: str = "text",
) -> DataFrame:
    """Char-trigram LM quality scoring (the CCNet recipe, exact).

    CCNet (Wenzek et al. 2020) filters web text by perplexity under a LM
    trained on a trusted reference corpus; this is the same signal with a
    char-trigram model so it is exactly computable on any engine: train
    p(c | c1 c2) = (count3(c1 c2 c) + 1) / (count2(c1 c2) + ALPHABET) by
    counting the reference slice (rows with ``source == ref_source``),
    then score every other doc by its average negative log-probability
    per trigram occurrence. Low nll ⇒ reference-like text; near
    ln(ALPHABET) ⇒ the model has never seen those transitions.

    Engine-reproducible like the DSIR op: probabilities are exact count
    ratios, each trigram's log rounds to 9 decimals and sums as
    DECIMAL(28,12) (add-order-independent), the average divides once at
    the end.

    Scale posture: the trigram/bigram count model is bounded by the
    alphabet cube — broadcast tables; the corpus-sized trigram stream
    never shuffles for the lookups, only for the final per-doc partial
    aggregation.
    """
    t = F.col(text_col)
    # Build each row's trigram array row-locally, THEN explode: the
    # Generate input is the compact gram array, so generated rows carry
    # 3 chars each — exploding a position sequence instead would drag the
    # full text column through every generated row (measured 2.5× slower
    # at sf0.1 on this corpus).
    from ..catalog import fan_out

    tri = fan_out(documents.select("doc_id", "source", t)).select(
        "doc_id",
        "source",
        F.explode(
            F.when(
                F.length(t) >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - 2),
                    lambda i: t.substr(i, F.lit(3)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g3"),
    ).select(
        "doc_id",
        "source",
        "g3",
        F.substring(F.col("g3"), 1, 2).alias("g2"),
    )
    is_ref = F.col("source") == ref_source
    from ._cache import swap_cache

    # The trigram model table is alphabet-bounded (tiny) and consumed
    # twice — by the score join and by the bigram rollup below; persist
    # it so the reference slice is exploded/counted exactly once.
    c3 = swap_cache(
        "charlm.c3",
        tri.filter(is_ref)
        .groupBy("g3")
        .agg(F.count(F.lit(1)).alias("c3")),
    )
    # count2(b) == Σ_c count3(b·c) exactly: trigrams and their prefix
    # bigrams are enumerated at the same positions (1..len-2), so the
    # bigram model is a rollup of the (tiny) trigram model table — no
    # second corpus-sized pass over the reference slice.
    c2 = (
        c3.groupBy(F.substring(F.col("g3"), 1, 2).alias("g2"))
        .agg(F.sum("c3").alias("c2"))
    )
    logp = F.log(
        (F.coalesce(F.col("c3"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("c2"), F.lit(0)) + CHARLM_ALPHABET).cast("double")
    )
    scored = (
        tri.filter(~is_ref)
        .join(F.broadcast(c3), "g3", "left")
        .join(F.broadcast(c2), "g2", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum(F.round(-logp, 9).cast("decimal(28,12)")).alias("__nll"),
        )
        .select(
            "doc_id",
            "n_trigrams",
            F.round(
                F.col("__nll").cast("double")
                / F.col("n_trigrams").cast("double"),
                6,
            ).alias("avg_nll"),
        )
    )
    return (
        documents.filter(~is_ref)
        .select("doc_id", "source")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("n_trigrams"), F.lit(0).cast("long")).alias(
                "n_trigrams"
            ),
            F.coalesce(F.col("avg_nll"), F.lit(0.0)).alias("avg_nll"),
            (
                F.coalesce(F.col("avg_nll"), F.lit(0.0)) < CHARLM_NLL_CUTOFF
            ).alias("is_fluent"),
        )
    )


#: Vocabulary-size checkpoints for the coverage curve.
COVERAGE_KS = (5, 10, 20, 50, 100)


def vocab_coverage_curve(
    documents: DataFrame,
    ks: tuple[int, ...] = COVERAGE_KS,
    text_col: str = "text",
    tok_counts: DataFrame | None = None,
) -> DataFrame:
    """Zipf coverage curve: what share of all token OCCURRENCES the top-k
    vocabulary entries cover, for each checkpoint k — the number that
    sizes a tokenizer vocabulary (coverage_share at the knee) and
    predicts the OOV rate (1 − coverage_share).

    Scale: token counts partial-aggregate per token; ranking uses the
    two-phase global row number (no single-partition window over a
    possibly-billion-row vocabulary); the curve itself is ONE aggregate
    row of conditional sums exploded to a row per checkpoint — exact
    integer arithmetic end to end, shares divide once at the end.
    """
    from .sync import global_row_number

    if tok_counts is None:
        counts = (
            documents.select(
                F.explode(_tokens(F.col(text_col))).alias("token")
            )
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("occ"))
        )
    else:
        # shared memoized per-doc counts: exact-integer re-sum, identical
        # values, one less tokenize+explode scan per session
        counts = tok_counts.groupBy("token").agg(
            F.sum("term_count").alias("occ")
        )
    counts = counts.withColumn("__negocc", -F.col("occ"))
    ranked = global_row_number(counts, ["__negocc", "token"], row_col="rk")
    aggs = [F.sum("occ").alias("__tot"), F.count(F.lit(1)).alias("__vocab")]
    for k in ks:
        aggs.append(
            F.sum(F.when(F.col("rk") <= k, F.col("occ"))).alias(f"__c{k}")
        )
        aggs.append(
            F.count(F.when(F.col("rk") <= k, F.lit(1))).alias(f"__n{k}")
        )
    one = ranked.agg(*aggs)
    per_k = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).cast("long").alias("k"),
                    F.col(f"__n{k}").alias("tokens_in_vocab"),
                    F.coalesce(F.col(f"__c{k}"), F.lit(0).cast("long")).alias(
                        "occurrences_covered"
                    ),
                )
                for k in ks
            ]
        )
    ).alias("s")
    return one.select(per_k, "__tot").select(
        F.col("s.k").alias("k"),
        F.col("s.tokens_in_vocab").alias("tokens_in_vocab"),
        F.col("s.occurrences_covered").alias("occurrences_covered"),
        F.round(
            F.col("s.occurrences_covered").cast("double")
            / F.col("__tot").cast("double"),
            6,
        ).alias("coverage_share"),
    )


def char_entropy_score(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-document character-distribution entropy (nats) — the classic
    cheap gibberish detector: natural text sits in a band, key-mash /
    binary-pasted text spikes high, single-character spam collapses to 0.

    Exactness discipline: H = ln N − (Σ n_c·ln n_c)/N, where every term
    depends only on an INTEGER count — each n·ln n rounds to 9 decimals
    and sums as exact DECIMAL (add-order-free), so both engines fold the
    identical values regardless of partitioning (the charlm precedent).

    Scale: explode → two partial aggregations ((doc, char) then doc);
    the alphabet bounds distinct rows per doc, so the shuffle carries
    ~|alphabet| rows per document, not characters.
    """
    chars = documents.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.col(text_col), ""), lambda c: c != F.lit("")
            )
        ).alias("ch"),
    )
    rc = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("n"))
    n = F.col("n").cast("double")
    term = F.round(n * F.log(n), 9).cast(SIM_DEC)
    agg = rc.groupBy("doc_id").agg(
        F.sum("n").alias("n_chars_used"),
        F.count(F.lit(1)).alias("distinct_chars"),
        F.sum(term).alias("__s"),
    )
    big_n = F.col("n_chars_used").cast("double")
    return agg.select(
        "doc_id",
        "n_chars_used",
        "distinct_chars",
        F.round(
            F.log(big_n) - F.col("__s").cast("double") / big_n, 6
        ).alias("char_entropy"),
    )


def chunk_windows(
    documents: DataFrame,
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
    with_text: bool = False,
) -> DataFrame:
    """Overlapping word-window passages (RAG / context chunking).

    Splits each document's whitespace words into windows of ``size``
    words starting every ``stride`` words (``size > stride`` ⇒ tail
    overlap, the standard retrieval-chunking shape), emitting one row
    per chunk with its ordinal, word offset, width and content hash.

    Scale posture: one projection + one ``explode`` of an arithmetic
    ``sequence`` — no shuffle at all, no Python; the fan-out factor is
    n_words/stride per doc, so output stays proportional to corpus
    size. On a cluster the chunk rows inherit the scan's partitioning
    (map-only), exactly what a 100-TB chunking pass needs. Reference
    parity: the reference pipeline ships whole rows (no chunker); this
    belongs to the mandated LLM-data operator family.
    """
    if size <= 0 or stride <= 0:
        raise ValueError(f"size/stride must be positive, got {size}/{stride}")
    w = F.split(F.col(text_col), " ")
    base = documents.select(
        "doc_id", w.alias("__w"), F.array_size(w).alias("__nw")
    ).where(F.col("__nw") > 0)
    start = F.col("start_word")
    cols = [
        "doc_id",
        (start / stride).cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_word"),
        F.least(F.lit(size), F.col("__nw") - start)
        .cast("long")
        .alias("n_words"),
        F.md5(
            F.array_join(F.slice("__w", start + 1, size), " ")
        ).alias("chunk_md5"),
    ]
    if with_text:
        # the retrieval/embedding consumers (chunk_vectors) need the
        # chunk content itself; default stays hash-only so the chunking
        # report never ships corpus text it does not use
        cols.append(
            F.array_join(F.slice("__w", start + 1, size), " ").alias(
                "chunk_text"
            )
        )
    return (
        base.select(
            "doc_id",
            "__w",
            "__nw",
            F.explode(
                F.sequence(F.lit(0), F.col("__nw") - 1, F.lit(stride))
            ).alias("start_word"),
        )
        .select(*cols)
    )


#: vec_id packing for chunk-grain vectors: vec_id = doc_id * BASE +
#: chunk_idx — invertible (doc_id = vec_id // BASE, chunk_idx = vec_id %
#: BASE) so ANN results map straight back to (doc, passage). 2^20 chunks
#: per doc is ~25M words at the default stride; the guard raises loudly
#: rather than aliasing two chunks to one id.
CHUNK_VEC_BASE = 1 << 20


def _default_chunk_encoder(content: bytes, dims: int) -> list[float]:
    """Deterministic stand-in text encoder (the multimodal stub-encoder
    seam, multimodal/media._fake_embed, applied to chunk text): folded
    byte histogram, l2-normalized — near-identical passages land at
    cosine ~1, unrelated ones decorrelate. Production swaps this ONE
    function for a real sentence encoder; every downstream ANN plan
    (train/assign/probe, streaming maintenance) is unchanged."""
    hist = [0.0] * dims
    for b in content:
        hist[b % dims] += 1.0
    norm = sum(x * x for x in hist) ** 0.5
    if norm == 0:
        # empty chunk content (whitespace-only doc): a fixed UNIT vector,
        # never the zero vector — a zero norm makes every cosine against
        # it 0/0=NaN, and Spark's descending rank orders NaN first, so
        # one empty chunk would displace a true neighbor in every list
        # it shares. All empties collapse to one deterministic point.
        hist[0] = 1.0
        return hist
    return [x / norm for x in hist]


def chunk_vectors(
    documents: DataFrame,
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
    dims: int = 64,
    encoder=None,
) -> DataFrame:
    """Retrieval-chunk embedding table: ``chunk_windows`` passages
    embedded through an injectable encoder into the similarity stack's
    standard (vec_id, embedding) contract — the chunk→index→search path
    a RAG-serving pipeline feeds, riding the SAME standing-index family
    (operators/similarity.train_centroids/_assign/ivf_topk, incl. the
    streaming maintenance twin streaming/ann.maintain_ivf_index) as
    document and media embeddings instead of a bespoke chunk-only index.

    ``encoder`` is a ``bytes -> list[float]`` callable (the
    multimodal/media.embed_media seam); the default is the deterministic
    stub histogram. Scale posture: chunking is a map-only explode, the
    encoder runs in ONE Arrow-batched mapInPandas over chunk rows (no
    per-row UDF, no shuffle) — output rows ~ n_words/stride per doc.
    """
    from typing import Iterator

    enc = encoder or _default_chunk_encoder
    base = CHUNK_VEC_BASE
    ch = chunk_windows(documents, text_col, size, stride, with_text=True)
    packed = ch.select(
        F.when(
            F.col("chunk_idx") < base,
            F.col("doc_id") * base + F.col("chunk_idx"),
        )
        .otherwise(
            F.raise_error(
                F.format_string(
                    "chunk_vectors: doc %s has chunk_idx %s past "
                    f"CHUNK_VEC_BASE={base} — vec_id packing would alias",
                    F.col("doc_id").cast("string"),
                    F.col("chunk_idx").cast("string"),
                )
            ).cast("long")
        )
        .alias("vec_id"),
        "chunk_text",
    )

    if encoder is None:
        # Default-encoder fast path (r15, guide §4.2): the stub encoder
        # loops over every BYTE of every chunk in interpreted Python —
        # O(corpus bytes) of pure-Python adds per encode pass, and the
        # IVF train/assign family runs several passes over this table.
        # One numpy bincount over the batch's concatenated bytes
        # (row_idx * dims + byte % dims) computes every histogram at
        # once. Bitwise-identical to the per-row path: counts are exact
        # small integers, the norm is a sum of exact integer squares
        # (order-independent below 2^53), and the final divide/sqrt are
        # the same IEEE ops — pinned by
        # tests/test_chunk_ann.py::test_default_encoder_batch_equals_scalar.
        def run(batches: Iterator) -> Iterator:
            import numpy as np
            import pandas as pd

            for pdf in batches:
                n = len(pdf)
                if not n:
                    continue
                ebytes = [t.encode("utf-8") for t in pdf["chunk_text"]]
                lens = np.fromiter(
                    (len(b) for b in ebytes), dtype=np.int64, count=n
                )
                hist = np.zeros((n, dims), dtype=np.float64)
                if lens.sum():
                    row = np.repeat(np.arange(n, dtype=np.int64), lens)
                    allb = np.frombuffer(
                        b"".join(ebytes), dtype=np.uint8
                    ).astype(np.int64)
                    hist = np.bincount(
                        row * dims + (allb % dims), minlength=n * dims
                    ).astype(np.float64).reshape(n, dims)
                norms = np.sqrt((hist * hist).sum(axis=1))
                empty = norms == 0.0
                hist[empty, 0] = 1.0  # the _default_chunk_encoder empty rule
                norms[empty] = 1.0
                out = hist / norms[:, None]
                yield pd.DataFrame(
                    {"vec_id": pdf["vec_id"], "embedding": list(out)}
                )

    else:

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "embedding": [
                            enc(t.encode("utf-8"), dims)
                            for t in pdf["chunk_text"]
                        ],
                    }
                )

    return packed.mapInPandas(
        run, schema="vec_id long, embedding array<double>"
    )


def zipf_slope_by_source(
    documents: DataFrame,
    tok_counts: DataFrame | None = None,
    top_n: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Per-source Zipf fit: OLS slope of ln(freq) ~ ln(rank) over the
    top-``top_n`` tokens — natural text tracks ≈ −1; templated or
    machine-generated sources flatten toward 0, so the slope is a cheap
    source-quality fingerprint alongside the entropy/coverage views.

    Rides the shared per-(doc, token) count memo when provided
    (registry._tok_counts_for) and re-aggregates it by source: the wide
    explode+count scan is paid once across the vocab/tfidf/zipf family.
    The ranked top-N per source is a window over the (source, token)
    aggregate — |sources| × vocab rows, never corpus-sized — and the
    final fit is a five-sum closed form, one row per source. Rank ties
    break (freq DESC, token ASC): deterministic across engines.
    """
    from pyspark.sql import Window

    if tok_counts is None:
        tok_counts = unigram_tok_counts(documents, text_col)
    src = documents.select("doc_id", "source")
    freq = (
        tok_counts.join(src, "doc_id")
        .groupBy("source", "token")
        .agg(F.sum("term_count").alias("freq"))
    )
    rk = Window.partitionBy("source").orderBy(
        F.col("freq").desc(), F.col("token")
    )
    top = freq.withColumn("rnk", F.row_number().over(rk)).where(
        F.col("rnk") <= top_n
    )
    x = F.log(F.col("rnk").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    s = top.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.max("freq").alias("top_freq"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )
    n, sx, sy = F.col("__n"), F.col("__sx"), F.col("__sy")
    denom = n * F.col("__sxx") - sx * sx
    slope = F.try_divide(n * F.col("__sxy") - sx * sy, denom)
    return s.select(
        "source",
        F.col("__n").cast("long").alias("n_terms"),
        "top_freq",
        F.round(slope, 4).alias("zipf_slope"),
        F.round(F.try_divide(sy - slope * sx, n), 4).alias("zipf_intercept"),
    )
