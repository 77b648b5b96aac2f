"""SURVEY §2-E — LLM-data text ops: stats, quality, language, tokenizers, sampling, packing, shards, mixes.

Split from the monolithic registry.py (r9); every query body is
unchanged — registration still flows through registry._core.query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..catalog import load_table
from ..operators import bpe, curation, quality, ranges, text as text_ops, unigram
from ._core import _ModelMemo, _corpus_fingerprint, query


@query(
    "text_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             CAST(LENGTH(text) AS BIGINT) AS n_chars,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(regexp_extract_all(text, '[a-z0-9]+')))
                  AS BIGINT) AS n_distinct_tokens,
             CAST(LENGTH(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
               AS n_alpha_chars,
             CAST(LENGTH(text) - LENGTH(regexp_replace(text, ' ', '', 'g'))
                  AS BIGINT) AS n_spaces
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens, n_distinct_tokens, n_alpha_chars,
           CASE WHEN n_tokens > 0
                THEN ROUND(CAST(n_alpha_chars AS DOUBLE) / n_tokens, 4)
           END AS avg_token_len,
           CASE WHEN n_chars > 0
                THEN ROUND(CAST(n_spaces AS DOUBLE) / n_chars, 4)
           END AS whitespace_ratio
    FROM t
    """,
)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/size statistics."""
    return text_ops.text_stats(load_table(spark, sf_dir, "documents"))


@query(
    "token_count_bpe",
    # The pretokenizer pattern embeds a single quote (contractions) —
    # doubled for the SQL literal.
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{text_ops.BPE_RE.replace("'", "''")}')) AS BIGINT)
               AS n_bpe_tokens,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
               AS n_ws_tokens
      FROM documents
    )
    SELECT doc_id, n_bpe_tokens, n_ws_tokens,
           CASE WHEN n_ws_tokens > 0
                THEN ROUND(CAST(n_bpe_tokens AS DOUBLE) / n_ws_tokens, 4)
                ELSE 0.0
           END AS bpe_per_word
    FROM t
    """,
)
def token_count_bpe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts under a BPE-ish pretokenizer (GPT-2-style segments,
    lookahead-free) vs whitespace words — the token-budget calibration
    view a training-data pipeline runs before sampling."""
    return text_ops.bpe_token_stats(load_table(spark, sf_dir, "documents"))


@query(
    "text_quality_score",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(regexp_extract_all(text, '[a-z0-9]+')))
                  AS BIGINT) AS n_distinct,
             CAST(len(regexp_extract_all(text, '\b(the|a|is|and|of|to|in)\b'))
                  AS BIGINT) AS stop_hits
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_tokens,
             ROUND(
               0.4 * LEAST(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
               + 0.3 * (1.0 - LEAST(
                   (CASE WHEN n_tokens > 0
                         THEN CAST(stop_hits AS DOUBLE) / n_tokens
                         ELSE 0.0 END) * 2.0, 1.0))
               + 0.3 * (CASE WHEN n_tokens > 0
                             THEN CAST(n_distinct AS DOUBLE) / n_tokens
                             ELSE 0.0 END),
               4) AS quality_score
      FROM t
    )
    SELECT doc_id, n_tokens, quality_score,
           CASE WHEN quality_score >= 0.75 THEN 'high'
                WHEN quality_score >= 0.5 THEN 'medium'
                ELSE 'low' END AS quality_bucket
    FROM s
    """,
)
def text_quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (C4/Gopher-style filter composition)."""
    return text_ops.quality_score(load_table(spark, sf_dir, "documents"))


@query(
    "lang_id",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(text, '\b(the|a|is|and|of|to|in)\b'))
                  AS BIGINT) AS en_hits
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN n_tokens > 0 AND en_hits * 5 >= n_tokens THEN 'en'
                ELSE 'unknown' END AS predicted_lang,
           CASE WHEN n_tokens > 0
                THEN ROUND(CAST(en_hits AS DOUBLE) / n_tokens, 4)
           END AS en_hit_ratio
    FROM t
    """,
)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language heuristic."""
    return text_ops.lang_id(load_table(spark, sf_dir, "documents"))


#: Shared unigram (doc_id, token, term_count) table — the common first
#: stage of tfidf_top_terms / vocab_top_k / vocab_coverage_curve (same
#: tokenizer, same explode+groupBy). Materialized once per corpus
#: snapshot, same single-live-handle lifecycle as _DSIR_W_CACHE.
_TOK_COUNTS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _tok_counts_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (sf_dir, _corpus_fingerprint(sf_dir, "documents"))
    df = _TOK_COUNTS_CACHE.get(key)
    if df is None:
        for old in _TOK_COUNTS_CACHE.values():
            old.unpersist(blocking=False)
        _TOK_COUNTS_CACHE.clear()
        from pyspark.storagelevel import StorageLevel

        df = text_ops.unigram_tok_counts(
            load_table(spark, sf_dir, "documents")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _TOK_COUNTS_CACHE[key] = df
    return df


@query(
    "vocab_top_k",
    oracle="""
    SELECT token, COUNT(*) AS occurrences FROM (
      SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token
      FROM documents
    ) GROUP BY token
    ORDER BY occurrences DESC, token
    LIMIT 20
    """,
)
def vocab_top_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters (top-20 tokens); exact-integer
    re-sum of the shared memoized unigram counts."""
    return text_ops.vocab_top_k(
        load_table(spark, sf_dir, "documents"),
        k=20,
        tok_counts=_tok_counts_for(spark, sf_dir),
    )


@query(
    "char_entropy_score",
    oracle="""
    WITH c AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ),
    rc AS (
      SELECT doc_id, ch, COUNT(*) AS n FROM c WHERE ch != ''
      GROUP BY doc_id, ch
    ),
    a AS (
      SELECT doc_id,
             CAST(SUM(n) AS BIGINT) AS n_chars_used,
             COUNT(*) AS distinct_chars,
             SUM(CAST(ROUND(n * LN(n), 9) AS DECIMAL(28,12))) AS s
      FROM rc GROUP BY doc_id
    )
    SELECT doc_id, n_chars_used, distinct_chars,
           ROUND(LN(n_chars_used) - CAST(s AS DOUBLE) / n_chars_used, 6)
             AS char_entropy
    FROM a
    """,
)
def char_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution entropy per doc (gibberish detector);
    every term derives from integer counts via round-9 + exact decimal
    sums, so both engines agree bit-for-bit."""
    return text_ops.char_entropy_score(
        load_table(spark, sf_dir, "documents")
    )


@query(
    "vocab_coverage_curve",
    oracle=f"""
    WITH c AS (
      SELECT token, COUNT(*) AS occ FROM (
        SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token
        FROM documents
      ) GROUP BY token
    ),
    r AS (
      SELECT occ, ROW_NUMBER() OVER (ORDER BY occ DESC, token) AS rk
      FROM c
    ),
    t AS (SELECT CAST(SUM(occ) AS BIGINT) AS tot FROM c),
    ks(k) AS (VALUES {", ".join(f"({k})" for k in text_ops.COVERAGE_KS)})
    SELECT CAST(ks.k AS BIGINT) AS k,
           COUNT(r.rk) AS tokens_in_vocab,
           CAST(COALESCE(SUM(r.occ), 0) AS BIGINT) AS occurrences_covered,
           ROUND(CAST(COALESCE(SUM(r.occ), 0) AS DOUBLE) / t.tot, 6)
             AS coverage_share
    FROM ks
    LEFT JOIN r ON r.rk <= ks.k
    CROSS JOIN t
    GROUP BY ks.k, t.tot
    """,
)
def vocab_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf vocabulary coverage at checkpoint sizes (tokenizer sizing /
    OOV-rate curve); two-phase global rank, one conditional aggregate,
    fed by the shared memoized unigram counts."""
    return text_ops.vocab_coverage_curve(
        load_table(spark, sf_dir, "documents"),
        tok_counts=_tok_counts_for(spark, sf_dir),
    )


@query(
    "doc_length_histogram",
    oracle="""
    WITH b AS (
      SELECT CAST(FLOOR(len(regexp_extract_all(text, '[a-z0-9]+')) / 10.0)
                  AS BIGINT) AS bucket_id
      FROM documents
    )
    SELECT bucket_id,
           CAST(bucket_id * 10 AS BIGINT) AS bucket_lo,
           CAST((bucket_id + 1) * 10 AS BIGINT) AS bucket_hi,
           COUNT(*) AS doc_count
    FROM b GROUP BY bucket_id
    """,
)
def doc_length_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count histogram of the corpus (length-filter calibration)."""
    return text_ops.length_histogram(
        load_table(spark, sf_dir, "documents"), bucket_width=10
    )


@query("sketch_distinct_users")  # rows-only: HLL estimate is engine-specific
def sketch_distinct_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx distinct users per event type (HLL) with exact alongside."""
    return quality.sketch_distinct_counts(
        load_table(spark, sf_dir, "events"), "user_id", "event_type"
    )


@query("sketch_value_quantiles")  # rows-only: GK sketch is engine-specific
def sketch_value_quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of order value per status (GK sketch)."""
    return quality.sketch_quantiles(
        load_table(spark, sf_dir, "orders"), "o_totalprice", "o_orderstatus"
    )


# The synthetic corpus contains no identifier-shaped strings, so the PII
# fixture deterministically appends synthetic contact details (same
# expression in both engines) — the operator is exercised with nonzero
# counts while staying oracle-checkable on read-only testdata.
_PII_AUG_SPARK = lambda: F.concat(  # noqa: E731
    F.col("text"),
    F.lit(" contact user"),
    F.col("doc_id").cast("string"),
    F.lit("@mail.example.com or 555-010-"),
    F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
    F.lit(" from 10.0."),
    F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
    F.lit(".1 ref "),
    F.lpad((F.col("doc_id") + F.lit(100000000)).cast("string"), 9, "0"),
)


_PII_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com or 555-010-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 ref '"
    " || lpad(CAST(doc_id + 100000000 AS VARCHAR), 9, '0')"
)


@query(
    "pii_redaction",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
             '{curation.PII_PATTERNS[0][1]}', '<EMAIL>', 'g'),
             '{curation.PII_PATTERNS[1][1]}', '<PHONE>', 'g'),
             '{curation.PII_PATTERNS[2][1]}', '<IP>', 'g'),
             '{curation.PII_PATTERNS[3][1]}', '<ID>', 'g') AS redacted_text,
           len(regexp_extract_all(t, '{curation.PII_PATTERNS[0][1]}'))
             AS n_email,
           len(regexp_extract_all(t, '{curation.PII_PATTERNS[1][1]}'))
             AS n_phone,
           len(regexp_extract_all(t, '{curation.PII_PATTERNS[2][1]}')) AS n_ip,
           len(regexp_extract_all(t, '{curation.PII_PATTERNS[3][1]}'))
             AS n_id_number,
           len(regexp_extract_all(t, '{curation.PII_PATTERNS[0][1]}'))
             + len(regexp_extract_all(t, '{curation.PII_PATTERNS[1][1]}'))
             + len(regexp_extract_all(t, '{curation.PII_PATTERNS[2][1]}'))
             + len(regexp_extract_all(t, '{curation.PII_PATTERNS[3][1]}'))
             AS total_redactions
    FROM aug
    """,
)
def pii_redaction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the corpus (chained JVM regexp_replace)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _PII_AUG_SPARK().alias("text")
    )
    return curation.pii_redact(docs)


_FUNNEL_TOKEN_RE = "[a-z0-9]+"


@query(
    "quality_filter_funnel",
    oracle=f"""
    WITH t AS (
      SELECT len(regexp_extract_all(text, '{_FUNNEL_TOKEN_RE}')) AS nt,
             len(list_distinct(regexp_extract_all(text, '{_FUNNEL_TOKEN_RE}')))
               AS nd,
             lang
      FROM documents
    ),
    a AS (
      SELECT COUNT(*) AS total,
             COUNT(CASE WHEN nt >= 20 THEN 1 END) AS s1,
             COUNT(CASE WHEN nt >= 20 AND nt <= 90 THEN 1 END) AS s2,
             COUNT(CASE WHEN nt >= 20 AND nt <= 90
                        AND CAST(nd AS DOUBLE) / nt >= 0.5 THEN 1 END) AS s3,
             COUNT(CASE WHEN nt >= 20 AND nt <= 90
                        AND CAST(nd AS DOUBLE) / nt >= 0.5
                        AND lang = 'en' THEN 1 END) AS s4
      FROM t
    ),
    staged AS (
      SELECT CAST(1 AS BIGINT) AS stage, 'min_tokens' AS gate_name,
             total AS docs_in, s1 AS docs_kept FROM a
      UNION ALL SELECT 2, 'max_tokens', s1, s2 FROM a
      UNION ALL SELECT 3, 'diversity', s2, s3 FROM a
      UNION ALL SELECT 4, 'lang_en', s3, s4 FROM a
    )
    SELECT stage, gate_name, docs_in, docs_kept,
           docs_in - docs_kept AS docs_dropped,
           CASE WHEN docs_in > 0
                THEN ROUND(CAST(docs_in - docs_kept AS DOUBLE)
                           / CAST(docs_in AS DOUBLE), 4)
                ELSE 0.0 END AS drop_rate
    FROM staged
    """,
)
def quality_filter_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel: per-gate survivor counts in one aggregate pass."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_FUNNEL_TOKEN_RE), 0)
    nt = F.array_size(toks)
    nd = F.array_size(F.array_distinct(toks))
    flagged = docs.select(
        nt.alias("__nt"), nd.alias("__nd"), F.col("lang")
    )
    gates = [
        ("min_tokens", F.col("__nt") >= 20),
        ("max_tokens", F.col("__nt") <= 90),
        (
            "diversity",
            (F.col("__nd").cast("double") / F.col("__nt").cast("double"))
            >= 0.5,
        ),
        ("lang_en", F.col("lang") == "en"),
    ]
    return curation.quality_funnel(flagged, gates)


_MIX_RATES = {"en": 1.0, "zh": 0.5, "fr": 0.25, "es": 0.1, "de": 0.05}


@query(
    "stratified_sample_mix",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE CASE lang
            WHEN 'en' THEN TRUE
            WHEN 'zh' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < '800'
            WHEN 'fr' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < '400'
            WHEN 'es' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < '199'
            WHEN 'de' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < '0cc'
            ELSE TRUE END
    """,
)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix downsampling: deterministic md5-bucket sampling so the
    selected training mix is reproducible on any engine/partitioning."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    return curation.stratified_sample(docs, "doc_id", "lang", _MIX_RATES)


@query(
    "dataset_split_assign",
    # Cumulative cutoffs for (train .90, val .05): .90 -> e66, .95 -> f33.
    oracle="""
    SELECT doc_id, source,
           CASE
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < 'e66'
               THEN 'train'
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < 'f33'
               THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    """,
)
def dataset_split_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by key hash: a document's split
    is a pure function of its id, so eval membership survives corpus
    regeneration and cluster-size changes — no seed, no shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return curation.dataset_split(docs, "doc_id")


@query(
    "sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS nt
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, nt,
             SUM(nt) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - nt AS start
      FROM t
    )
    SELECT doc_id, source, nt AS n_tokens,
           CAST(start // {curation.PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(start % {curation.PACK_BUDGET} AS BIGINT) AS offset_in_pack
    FROM c
    """,
)
def sequence_packing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk pack assignment per source stream."""
    docs = load_table(spark, sf_dir, "documents")
    nt = F.array_size(
        F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)
    )
    return curation.sequence_packing(docs, nt)


_SHARD_RANK_SQL = f"""
    t AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_tokens,
             ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
      FROM t
    ),
    a AS (
      SELECT doc_id, n_tokens,
             CAST((rn - 1) % {curation.N_SHARDS} AS BIGINT) AS shard_id
      FROM r
    )
"""


@query(
    "shard_assignment_balanced",
    oracle=f"WITH {_SHARD_RANK_SQL} SELECT doc_id, n_tokens, shard_id FROM a",
)
def shard_assignment_balanced_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced output-shard assignment (rank-round-robin over the
    descending token order — the distributed stand-in for sequential
    first-fit-decreasing; two-phase global rank, no one-task sort)."""
    docs = load_table(spark, sf_dir, "documents")
    nt = F.array_size(
        F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)
    )
    return curation.shard_assignment(docs, nt)


@query(
    "shard_balance_summary",
    oracle=f"""
    WITH {_SHARD_RANK_SQL},
    per AS (
      SELECT shard_id, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens_total
      FROM a GROUP BY shard_id
    ),
    tot AS (SELECT CAST(SUM(tokens_total) AS BIGINT) AS corpus FROM per)
    SELECT shard_id, n_docs, tokens_total,
           ROUND(CAST(tokens_total AS DOUBLE) / corpus, 6) AS token_share,
           ROUND(CAST(tokens_total AS DOUBLE) * {curation.N_SHARDS} / corpus,
                 6) AS balance_ratio
    FROM per, tot
    """,
)
def shard_balance_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard token-mass balance over the shard assignment — the
    straggler bound a training job actually watches (max/min
    balance_ratio)."""
    return curation.shard_balance(
        shard_assignment_balanced_q(spark, sf_dir)
    )


@query(
    "error_window_events",
    oracle="""
    WITH err AS (
      SELECT event_id AS window_id, ts AS window_start,
             ts + INTERVAL 5 MINUTE AS wend
      FROM events WHERE event_type = 'error'
    ),
    pts AS (SELECT ts, event_type, value FROM events
            WHERE event_type <> 'error'),
    j AS (
      SELECT e.window_id, e.window_start, p.event_type, p.value
      FROM err e JOIN pts p ON p.ts >= e.window_start AND p.ts < e.wend
    )
    SELECT window_id, window_start, COUNT(*) AS n_events,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
             AS total_value
    FROM j GROUP BY window_id, window_start
    """,
)
def error_window_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity inside the 5 minutes after each error — a keyless
    point-in-interval join, planned as a binned equi-join (no nested-loop;
    see operators/ranges.py)."""
    events = load_table(spark, sf_dir, "events")
    err = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("window_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("__wend"),
    )
    pts = events.filter(F.col("event_type") != "error").select(
        F.col("ts").alias("__pts"), "event_type", "value"
    )
    joined = ranges.interval_join(
        pts, err, "__pts", "window_start", "__wend", bin_seconds=300
    )
    return joined.groupBy("window_id", "window_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", F.lit(1))).alias(
            "n_purchases"
        ),
        F.count(F.when(F.col("event_type") == "click", F.lit(1))).alias(
            "n_clicks"
        ),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("total_value"),
    )


@query(
    "pack_fill_summary",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS nt
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, nt,
             SUM(nt) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - nt AS start
      FROM t
    ),
    packed AS (
      SELECT source, CAST(start // {curation.PACK_BUDGET} AS BIGINT) AS pack_id,
             nt FROM c
    )
    SELECT source, pack_id, COUNT(*) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS tokens_started,
           ROUND(CAST(SUM(nt) AS DOUBLE) / {curation.PACK_BUDGET}, 4)
             AS fill_ratio
    FROM packed GROUP BY source, pack_id
    """,
)
def pack_fill_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack-level fill statistics over sequence_packing assignments: how
    many docs START in each pack and the token mass they contribute —
    the calibration view for choosing the pack budget (fill_ratio ≈ 1
    means clean chunking; >> 1 means long docs straddle many windows)."""
    packed = sequence_packing_q(spark, sf_dir)
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_started"),
        F.round(
            F.sum("n_tokens").cast("double") / F.lit(float(curation.PACK_BUDGET)),
            4,
        ).alias("fill_ratio"),
    )


@query(
    "source_language_mix",
    oracle="""
    WITH c AS (
      SELECT source, lang, COUNT(*) AS n_docs,
             CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars_total
      FROM documents GROUP BY source, lang
    ),
    t AS (SELECT source, SUM(n_docs) AS src_docs FROM c GROUP BY source),
    p AS (
      SELECT c.source, c.lang, c.n_docs, c.chars_total, t.src_docs,
             CAST(c.n_docs AS DOUBLE) / CAST(t.src_docs AS DOUBLE) AS frac
      FROM c JOIN t USING (source)
    ),
    h AS (
      SELECT source,
             ROUND(-SUM(frac * LN(frac)), 6) AS lang_entropy
      FROM p GROUP BY source
    )
    SELECT p.source, p.lang, p.n_docs, p.chars_total,
           ROUND(p.frac, 6) AS doc_share, h.lang_entropy
    FROM p JOIN h USING (source)
    """,
)
def source_language_mix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language composition with per-source entropy — the
    training-mix monitoring view (are sources drifting monolingual?).
    Entropy derives from exact integer counts through a fixed expression;
    the per-source entropy is a second partial aggregate of the first
    (already tiny) rollup joined back, never a window over raw docs."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("long")).alias("chars_total"),
    )
    t = c.groupBy("source").agg(F.sum("n_docs").alias("src_docs"))
    frac = F.col("n_docs").cast("double") / F.col("src_docs").cast("double")
    p = c.join(t, "source").select(
        "source", "lang", "n_docs", "chars_total", frac.alias("__frac")
    )
    h = p.groupBy("source").agg(
        F.round(
            -F.sum(
                (F.col("__frac") * F.log(F.col("__frac"))).cast(
                    "decimal(28,12)"
                )
            ).cast("double"),
            6,
        ).alias("lang_entropy")
    )
    return p.join(h, "source").select(
        "source",
        "lang",
        "n_docs",
        "chars_total",
        F.round(F.col("__frac"), 6).alias("doc_share"),
        "lang_entropy",
    )


@query(
    "repetition_filter",
    oracle="""
    WITH sp AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id, k, gram FROM (
        SELECT doc_id, 2 AS k,
               unnest(list_transform(range(1, greatest(len(w), 1)),
                      i -> w[i] || ' ' || w[i+1])) AS gram
        FROM sp WHERE len(w) >= 2
        UNION ALL
        SELECT doc_id, 3 AS k,
               unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        FROM sp WHERE len(w) >= 3
      )
    ),
    c AS (
      SELECT doc_id, k, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, k, gram
    ),
    s AS (
      SELECT doc_id,
             MAX(CASE WHEN k = 2 THEN cnt END) AS m2,
             SUM(CASE WHEN k = 2 THEN cnt END) AS t2,
             SUM(CASE WHEN k = 3 AND cnt > 1 THEN cnt END) AS d3,
             SUM(CASE WHEN k = 3 THEN cnt END) AS t3
      FROM c GROUP BY doc_id
    ),
    r AS (
      SELECT d.doc_id,
             COALESCE(CASE WHEN s.t2 > 0
               THEN CAST(s.m2 AS DOUBLE) / CAST(s.t2 AS DOUBLE) END, 0.0)
               AS top_bigram_frac,
             COALESCE(CASE WHEN s.t3 > 0
               THEN CAST(COALESCE(s.d3, 0) AS DOUBLE)
                    / CAST(s.t3 AS DOUBLE) END, 0.0) AS dup_trigram_frac
      FROM documents d LEFT JOIN s USING (doc_id)
    )
    SELECT doc_id, top_bigram_frac, dup_trigram_frac,
           top_bigram_frac > 0.10 OR dup_trigram_frac > 0.50 AS repetitive
    FROM r
    """,
)
def repetition_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics (top-bigram / duplicate-trigram
    shares) per document — curation gate for boilerplate-heavy docs."""
    return curation.repetition_score(load_table(spark, sf_dir, "documents"))


@query(
    "source_mix_weights",
    oracle="""
    WITH s AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    t AS (
      SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total_tokens,
             COUNT(*) AS n_sources
      FROM s
    )
    SELECT source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / total_tokens AS token_share,
           CAST(1 AS DOUBLE) / n_sources AS target_share,
           (CAST(1 AS DOUBLE) / n_sources)
             / (CAST(n_tokens AS DOUBLE) / total_tokens) AS sample_weight,
           LEAST((CAST(1 AS DOUBLE) / n_sources)
             / (CAST(n_tokens AS DOUBLE) / total_tokens), 5.0)
             AS capped_weight
    FROM s CROSS JOIN t
    """,
)
def source_mix_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token shares and capped sampling weights for a uniform
    training mix — the reweighting plan a data pipeline feeds its
    sampler."""
    return curation.source_mix_weights(load_table(spark, sf_dir, "documents"))


@query(
    "source_mix_temperature",
    oracle=f"""
    WITH s AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tot FROM s),
    w AS (
      SELECT source, n_docs, n_tokens,
             CAST(n_tokens AS DOUBLE) / tot AS share,
             POW(CAST(n_tokens AS DOUBLE) / tot, {curation.MIX_ALPHA})
               AS pa
      FROM s CROSS JOIN t
    ),
    z AS (SELECT SUM(pa) AS z FROM w)
    SELECT source, n_docs, n_tokens,
           ROUND(share, 6) AS token_share,
           ROUND(pa / z, 6) AS smoothed_share,
           ROUND(pa / z / share, 6) AS sample_weight
    FROM w CROSS JOIN z
    """,
)
def source_mix_temperature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed source mix (p^alpha renormalized — the
    mT5/XLM-R multilingual sampling rule, alpha=0.3): upweights tail
    sources without flattening the head like the uniform target does."""
    return curation.source_mix_temperature(
        load_table(spark, sf_dir, "documents")
    )


@query(
    "priority_sample_docs",
    oracle="""
    WITH p AS (
      SELECT source, doc_id, n_chars AS weight,
             CAST(n_chars AS DOUBLE) * 4503599627370496.0
               / CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)
                           AS BIGINT) + 1 AS DOUBLE) AS pri
      FROM documents
    ),
    r AS (
      SELECT source, doc_id, weight,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY pri DESC, doc_id) AS sample_rank
      FROM p
    )
    SELECT source, doc_id, weight, CAST(sample_rank AS INT) AS sample_rank
    FROM r WHERE sample_rank <= 25
    """,
)
def priority_sample_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (length-proportional) deterministic document sample per
    source via priority sampling — seedless, engine-reproducible
    training-mix subsampling."""
    return curation.priority_sample(
        load_table(spark, sf_dir, "documents"),
        key_col="doc_id",
        weight_col="n_chars",
        stratum_col="source",
        k=25,
    )


@query(
    "group_percentiles_exact",
    oracle="""
    SELECT event_type, COUNT(value) AS n,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def group_percentiles_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-event-type value percentiles — the exact twin that
    validates sketch_value_quantiles (GK) and serves grouped data."""
    return quality.group_percentiles_exact(
        load_table(spark, sf_dir, "events"), "event_type", "value"
    )


#: Once-per-corpus tokenizer model cache: BPE merge induction is model
#: TRAINING (10 driver-coordinated vocab passes); every query that applies
#: the tokenizer shares the induced table rather than re-learning it, the
#: same driver-resident-model posture as the IVF centroids. Keyed by
#: (corpus dir, snapshot fingerprint); deterministic (exact counts,
#: lexicographic tie-break), so a cache hit is bit-identical to a re-run.
#: LRU-bounded + superseded-fingerprint eviction via _ModelMemo.
_BPE_MERGE_CACHE = _ModelMemo()


def _bpe_merges_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (sf_dir, _corpus_fingerprint(sf_dir, "documents"))
    rows = _BPE_MERGE_CACHE.get(key)
    if rows is None:
        rows = bpe.bpe_merge_rows(
            load_table(spark, sf_dir, "documents"), n_merges=10
        )
        _BPE_MERGE_CACHE.put(key, rows)
    return spark.createDataFrame(rows, bpe.MERGES_SCHEMA)


@query("bpe_merge_table")  # rows-only: iterative model induction, no SQL twin
def bpe_merge_table_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table over the document corpus (Sennrich BPE;
    exact integer pair counts, lexicographic tie-break — engine- and
    partitioning-deterministic; cross-checked against a pure-Python
    reference implementation in tests/test_bpe.py)."""
    return _bpe_merges_for(spark, sf_dir)


#: Shared (doc_id, word, n_occ) word-count table — the tokenizer-
#: application input both encoders (BPE replay, unigram Viterbi) consume
#: over the SAME lowercased WORD_RE grain; one corpus regexp/explode
#: pass per snapshot instead of one per encoder per call. Same
#: single-live-handle lifecycle as the shingle memo.
_DOC_WORD_CACHE: dict[tuple[str, str], DataFrame] = {}


def _doc_word_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (sf_dir, _corpus_fingerprint(sf_dir, "documents"))
    df = _DOC_WORD_CACHE.get(key)
    if df is None:
        for old in _DOC_WORD_CACHE.values():
            old.unpersist(blocking=False)
        _DOC_WORD_CACHE.clear()
        from pyspark.storagelevel import StorageLevel

        df = bpe.doc_word_counts(
            load_table(spark, sf_dir, "documents")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _DOC_WORD_CACHE[key] = df
    return df


#: Per-(snapshot, tokenizer) encoded vocabulary (word, word_tokens):
#: the model-application pass — BPE merge replay / unigram Viterbi over
#: the distinct word vocab — is standing state THREE queries per
#: tokenizer consume (the encode view, the fertility report's side),
#: so it materializes once per model instead of once per call.
_WORD_TOKENS_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _word_tokens_for(
    spark: SparkSession, sf_dir: str, kind: str
) -> DataFrame:
    fp = _corpus_fingerprint(sf_dir, "documents")
    key = (sf_dir, fp, kind)
    df = _WORD_TOKENS_CACHE.get(key)
    if df is None:
        # Single-live-SNAPSHOT lifecycle: both tokenizers of the CURRENT
        # (sf_dir, fingerprint) stay live together, but superseded
        # fingerprints AND other snapshot directories are evicted — a
        # multi-sf_dir session (scale/skew smokes) stays bounded.
        for old_key in [
            o for o in _WORD_TOKENS_CACHE if (o[0], o[1]) != (sf_dir, fp)
        ]:
            _WORD_TOKENS_CACHE.pop(old_key).unpersist(blocking=False)
        from pyspark.storagelevel import StorageLevel

        words = _doc_word_for(spark, sf_dir).select("word").distinct()
        if kind == "bpe":
            df = bpe.bpe_word_tokens(words, _bpe_merges_for(spark, sf_dir))
        elif kind == "unigram":
            df = unigram.unigram_word_tokens(
                words, _unigram_vocab_for(spark, sf_dir)
            )
        else:  # pragma: no cover - caller bug
            raise ValueError(f"unknown tokenizer kind: {kind}")
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        _WORD_TOKENS_CACHE[key] = df
    return df


@query("bpe_encode_tokens")  # rows-only: applies the learned (non-SQL) model
def bpe_encode_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BPE token counts from applying the learned merge table —
    the corpus token-budget view a tokenizer change actually produces
    (learn once per corpus via the shared model cache, then encode:
    merges replay over the distinct word vocab and broadcast-join back;
    tests/test_bpe.py cross-checks against pure-Python BPE). Rides the
    shared word-count memo AND the per-(snapshot, tokenizer) encoded
    vocabulary memo."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe.bpe_encode_stats(
        docs,
        _bpe_merges_for(spark, sf_dir),
        doc_word=_doc_word_for(spark, sf_dir),
        encoded=_word_tokens_for(spark, sf_dir, "bpe"),
    )


#: Once-per-corpus unigram-LM vocabulary (SentencePiece-style Viterbi-EM
#: prune, operators/unigram.py) — the same driver-resident-model posture
#: and _ModelMemo lifecycle as _BPE_MERGE_CACHE.
_UNIGRAM_VOCAB_CACHE = _ModelMemo()


def _unigram_vocab_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (sf_dir, _corpus_fingerprint(sf_dir, "documents"))
    rows = _UNIGRAM_VOCAB_CACHE.get(key)
    if rows is None:
        rows = unigram.unigram_vocab_rows(
            load_table(spark, sf_dir, "documents"), vocab_size=400
        )
        _UNIGRAM_VOCAB_CACHE.put(key, rows)
    return spark.createDataFrame(rows, unigram.VOCAB_SCHEMA)


@query("unigram_vocab_table")  # rows-only: iterative EM induction, no SQL twin
def unigram_vocab_table_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned unigram-LM (SentencePiece-style) piece vocabulary over the
    document corpus — Viterbi-EM over the capped word dictionary with
    deterministic integer counts and lexicographic tie-breaks;
    cross-checked against a pure-Python reference implementation in
    tests/test_unigram.py."""
    return _unigram_vocab_for(spark, sf_dir)


@query("unigram_encode_tokens")  # rows-only: applies the learned model
def unigram_encode_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc unigram-LM token counts from applying the learned
    vocabulary (learn once per corpus via the shared model cache; Viterbi
    encode over the distinct word vocab in an Arrow-batched pandas UDF,
    broadcast-join back; tests/test_unigram.py cross-checks the
    segmentation against the pure-Python reference). Rides the encoded
    vocabulary memo — the Viterbi pass runs once per (snapshot, model),
    not per consumer."""
    docs = load_table(spark, sf_dir, "documents")
    return unigram.unigram_encode_stats(
        docs,
        _unigram_vocab_for(spark, sf_dir),
        doc_word=_doc_word_for(spark, sf_dir),
        encoded=_word_tokens_for(spark, sf_dir, "unigram"),
    )


@query("tokenizer_fertility_by_source")  # rows-only: applies both models
def tokenizer_fertility_by_source_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer-selection report: per-source fertility (tokens per
    word) under the learned BPE merges vs the learned unigram-LM vocab,
    plus their ratio — the side-by-side a team reads before fixing a
    tokenizer for a corpus (fertility is the standard cross-tokenizer
    comparison metric). Both encodes reuse the per-corpus model memos;
    aggregation is exact integer sums, divisions rounded 6dp at the
    end."""
    docs = load_table(spark, sf_dir, "documents")
    dw = _doc_word_for(spark, sf_dir)
    b = bpe.bpe_encode_stats(
        docs,
        _bpe_merges_for(spark, sf_dir),
        doc_word=dw,
        encoded=_word_tokens_for(spark, sf_dir, "bpe"),
    ).select("doc_id", "n_words", "n_bpe_tokens")
    u = unigram.unigram_encode_stats(
        docs,
        _unigram_vocab_for(spark, sf_dir),
        doc_word=dw,
        encoded=_word_tokens_for(spark, sf_dir, "unigram"),
    ).select("doc_id", "n_unigram_tokens")
    joined = (
        docs.select("doc_id", "source").join(b, "doc_id").join(u, "doc_id")
    )
    words = F.sum("n_words")
    bpe_t = F.sum("n_bpe_tokens")
    uni_t = F.sum("n_unigram_tokens")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        words.alias("n_words"),
        bpe_t.alias("n_bpe_tokens"),
        uni_t.alias("n_unigram_tokens"),
        F.round(
            bpe_t.cast("double") / words.cast("double"), 6
        ).alias("fertility_bpe"),
        F.round(
            uni_t.cast("double") / words.cast("double"), 6
        ).alias("fertility_unigram"),
        F.round(
            uni_t.cast("double") / bpe_t.cast("double"), 6
        ).alias("unigram_vs_bpe"),
    )


_CHARLM_REF = "src1"


@query(
    "charlm_perplexity",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, text, length(text) AS len FROM documents
    ),
    tri AS (
      SELECT doc_id, source,
             substr(text, CAST(i AS INTEGER), 3) AS g3,
             substr(text, CAST(i AS INTEGER), 2) AS g2
      FROM (
        SELECT doc_id, source, text, unnest(range(1, len - 1)) AS i
        FROM d WHERE len >= 3
      )
    ),
    c3 AS (SELECT g3, COUNT(*) AS c3 FROM tri
           WHERE source = '{_CHARLM_REF}' GROUP BY g3),
    c2 AS (SELECT g2, COUNT(*) AS c2 FROM tri
           WHERE source = '{_CHARLM_REF}' GROUP BY g2),
    scored AS (
      SELECT tri.doc_id, COUNT(*) AS n_trigrams,
             SUM(CAST(round(-ln(
               CAST(COALESCE(c3.c3, 0) + 1 AS DOUBLE)
               / CAST(COALESCE(c2.c2, 0) + {text_ops.CHARLM_ALPHABET}
                      AS DOUBLE)
             ), 9) AS DECIMAL(28,12))) AS nll
      FROM tri LEFT JOIN c3 USING (g3) LEFT JOIN c2 USING (g2)
      WHERE tri.source <> '{_CHARLM_REF}'
      GROUP BY tri.doc_id
    ),
    per AS (
      SELECT doc_id, n_trigrams,
             ROUND(CAST(nll AS DOUBLE) / CAST(n_trigrams AS DOUBLE), 6)
               AS avg_nll
      FROM scored
    )
    SELECT d.doc_id, d.source,
           COALESCE(p.n_trigrams, 0) AS n_trigrams,
           COALESCE(p.avg_nll, 0.0) AS avg_nll,
           COALESCE(p.avg_nll, 0.0) < {text_ops.CHARLM_NLL_CUTOFF}
             AS is_fluent
    FROM d LEFT JOIN per p USING (doc_id)
    WHERE d.source <> '{_CHARLM_REF}'
    """,
)
def charlm_perplexity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality scoring: char-trigram LM trained on a
    reference slice; per-doc average negative log-probability (exact
    count ratios, decimal-summed rounded logs — engine-reproducible)."""
    return text_ops.charlm_perplexity(
        load_table(spark, sf_dir, "documents"), _CHARLM_REF
    )


_DSIR_TARGET = "src0"


_DSIR_W_SQL = f"""
    sp AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, source,
             substr(md5(w[i] || ' ' || w[i+1]), 1, 3) AS bucket
      FROM (
        SELECT doc_id, source, w, unnest(range(1, len(w))) AS i
        FROM sp WHERE len(w) >= 2
      )
    ),
    tc AS (SELECT bucket, COUNT(*) AS ct FROM g
           WHERE source = '{_DSIR_TARGET}' GROUP BY bucket),
    rc AS (SELECT bucket, COUNT(*) AS cr FROM g
           WHERE source <> '{_DSIR_TARGET}' GROUP BY bucket),
    nt AS (SELECT COUNT(*) AS nt FROM g WHERE source = '{_DSIR_TARGET}'),
    nr AS (SELECT COUNT(*) AS nr FROM g WHERE source <> '{_DSIR_TARGET}'),
    scored AS (
      SELECT g.doc_id, COUNT(*) AS n_grams,
             SUM(CAST(round(ln(
               (CAST(COALESCE(tc.ct, 0) + 1 AS DOUBLE)
                * CAST(nr.nr + {curation.DSIR_BUCKETS} AS DOUBLE))
               / (CAST(COALESCE(rc.cr, 0) + 1 AS DOUBLE)
                  * CAST(nt.nt + {curation.DSIR_BUCKETS} AS DOUBLE))
             ), 9) AS DECIMAL(28,12))) AS lw
      FROM g
      LEFT JOIN tc USING (bucket)
      LEFT JOIN rc USING (bucket)
      CROSS JOIN nt CROSS JOIN nr
      WHERE g.source <> '{_DSIR_TARGET}'
      GROUP BY g.doc_id
    ),
    w AS (
      SELECT d.doc_id, d.source,
             COALESCE(s.n_grams, 0) AS n_grams,
             ROUND(CAST(COALESCE(s.lw, 0) AS DOUBLE), 6) AS log_weight,
             COALESCE(s.lw, 0) > 0 AS target_leaning
      FROM documents d LEFT JOIN scored s USING (doc_id)
      WHERE d.source <> '{_DSIR_TARGET}'
    )
"""


#: Selected fraction for DSIR hard top-k selection.
_DSIR_SELECT_FRAC = 0.2


#: The weight table feeds both the weight view and the selection pass —
#: materialized once per corpus (same shared-intermediate posture as the
#: Jaccard pair cache above).
_DSIR_W_CACHE: dict[tuple[str, str], DataFrame] = {}


def _dsir_weights_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (sf_dir, _corpus_fingerprint(sf_dir, "documents"))
    df = _DSIR_W_CACHE.get(key)
    if df is None:
        for old in _DSIR_W_CACHE.values():
            old.unpersist(blocking=False)
        _DSIR_W_CACHE.clear()
        from pyspark.storagelevel import StorageLevel

        df = curation.dsir_importance_weights(
            load_table(spark, sf_dir, "documents"), _DSIR_TARGET
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _DSIR_W_CACHE[key] = df
    return df


@query(
    "dsir_importance_weights",
    oracle=f"WITH {_DSIR_W_SQL} SELECT * FROM w",
)
def dsir_importance_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed-bigram bucket
    models of the target slice vs the raw corpus; per-doc summed
    log-likelihood ratio with add-one smoothing. The domain-targeting
    twin of stratified_sample_mix — weights feed a resampling pass."""
    return _dsir_weights_for(spark, sf_dir)


@query(
    "dsir_select_topk",
    oracle=f"""
    WITH {_DSIR_W_SQL},
    r AS (
      SELECT doc_id, source, log_weight,
             ROW_NUMBER() OVER (ORDER BY log_weight DESC, doc_id) AS rn,
             COUNT(*) OVER () AS cnt
      FROM w
    )
    SELECT doc_id, source, log_weight,
           CAST(rn AS BIGINT) AS selection_rank
    FROM r WHERE rn <= CAST(ceil({_DSIR_SELECT_FRAC} * cnt) AS BIGINT)
    """,
)
def dsir_select_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selection pass DSIR weights exist for: keep the top fraction
    of background docs by importance weight (hard top-k selection, the
    deterministic variant used when the resampling temperature is 0).
    Rank is the two-phase global numbering — no one-task sort; ties
    break on doc_id so the selected set is engine-identical."""
    return curation.dsir_select_topk(
        _dsir_weights_for(spark, sf_dir), _DSIR_SELECT_FRAC
    )


#: Weak positive labels for the trained quality classifier: treat these
#: sources as "curated" and everything else as crawl.
_NBQ_CURATED = ("src0", "src1")
_NBQ_CUR_SQL = "('src0', 'src1')"


#: Shared oracle CTE chain for the trained NB classifier: ends in a
#: ``docscores`` CTE with one row per document (doc_id, source,
#: label_curated, is_heldout, n_grams, log_odds, pred_curated) — the
#: scores view SELECTs it verbatim, the calibration report and the
#: classifier-gated funnel aggregate it. One definition so the three
#: oracles can never drift from each other.
_NBQ_DOCSCORES_CTES = f"""sp AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, source,
             substr(md5(w[i] || ' ' || w[i+1]), 1, 3) AS bucket
      FROM (
        SELECT doc_id, source, w, unnest(range(1, len(w))) AS i
        FROM sp WHERE len(w) >= 2
      )
    ),
    tg AS (SELECT * FROM g
           WHERE doc_id % {{holdout}} != 0),
    tc AS (SELECT bucket, COUNT(*) AS ct FROM tg
           WHERE source IN {{cur}} GROUP BY bucket),
    cc AS (SELECT bucket, COUNT(*) AS cr FROM tg
           WHERE source NOT IN {{cur}} GROUP BY bucket),
    nt AS (SELECT COUNT(*) AS nt FROM tg WHERE source IN {{cur}}),
    nc AS (SELECT COUNT(*) AS nc FROM tg
           WHERE source NOT IN {{cur}}),
    pr AS (
      SELECT COUNT(*) FILTER (WHERE source IN {{cur}}) AS dcur,
             COUNT(*) FILTER (WHERE source NOT IN {{cur}}) AS dcr
      FROM documents WHERE doc_id % {{holdout}} != 0
    ),
    scored AS (
      SELECT g.doc_id, COUNT(*) AS n_grams,
             SUM(CAST(round(ln(
               (CAST(COALESCE(tc.ct, 0) + 1 AS DOUBLE)
                * CAST(nc.nc + {curation.DSIR_BUCKETS} AS DOUBLE))
               / (CAST(COALESCE(cc.cr, 0) + 1 AS DOUBLE)
                  * CAST(nt.nt + {curation.DSIR_BUCKETS} AS DOUBLE))
             ), 9) AS DECIMAL(28,12))) AS lw
      FROM g
      LEFT JOIN tc USING (bucket)
      LEFT JOIN cc USING (bucket)
      CROSS JOIN nt CROSS JOIN nc
      GROUP BY g.doc_id
    ),
    docscores AS (
      SELECT d.doc_id, d.source,
             d.source IN {{cur}} AS label_curated,
             d.doc_id % {{holdout}} = 0 AS is_heldout,
             COALESCE(s.n_grams, 0) AS n_grams,
             ROUND(CAST(
               CAST(round(ln((CAST(pr.dcur AS DOUBLE) + 1)
                             / (CAST(pr.dcr AS DOUBLE) + 1)), 9)
                    AS DECIMAL(28,12))
               + COALESCE(s.lw, 0) AS DOUBLE), 6) AS log_odds,
             (CAST(round(ln((CAST(pr.dcur AS DOUBLE) + 1)
                            / (CAST(pr.dcr AS DOUBLE) + 1)), 9)
                   AS DECIMAL(28,12))
              + COALESCE(s.lw, 0)) > 0 AS pred_curated
      FROM documents d
      LEFT JOIN scored s USING (doc_id)
      CROSS JOIN pr
    )""".format(holdout=curation.NBQ_HOLDOUT_MOD, cur=_NBQ_CUR_SQL)


#: Per-snapshot NB classifier score table: the scores view and the
#: per-source calibration report consume the same per-doc verdicts, so
#: the gram-stream aggregation runs once per corpus (same
#: shared-intermediate posture as _DSIR_W_CACHE).
_NBQ_SCORES_CACHE: dict[tuple[str, str], DataFrame] = {}


#: Driver-resident NB model (4096 LLR strings + prior) — the standing
#: model the streaming scorer ships as a constant-folded literal; same
#: LRU/superseded-fingerprint lifecycle as the other _ModelMemo models.
_NBQ_MODEL_CACHE = _ModelMemo()


def _nbq_model_for(spark: SparkSession, sf_dir: str) -> dict:
    fp = _corpus_fingerprint(sf_dir, "documents")
    model = _NBQ_MODEL_CACHE.get((sf_dir, fp))
    if model is None:
        model = curation.train_nbq_model(
            load_table(spark, sf_dir, "documents"), _NBQ_CURATED
        )
        _NBQ_MODEL_CACHE.put((sf_dir, fp), model)
    return model


def _nbq_scores_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (sf_dir, _corpus_fingerprint(sf_dir, "documents"))
    df = _NBQ_SCORES_CACHE.get(key)
    if df is None:
        for old in _NBQ_SCORES_CACHE.values():
            old.unpersist(blocking=False)
        _NBQ_SCORES_CACHE.clear()
        from pyspark.storagelevel import StorageLevel

        df = curation.nb_quality_classifier(
            load_table(spark, sf_dir, "documents"), _NBQ_CURATED
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _NBQ_SCORES_CACHE[key] = df
    return df


@query(
    "quality_classifier_scores",
    oracle=f"""
    WITH {_NBQ_DOCSCORES_CTES}
    SELECT doc_id, source, label_curated, is_heldout, n_grams,
           log_odds, pred_curated
    FROM docscores
    """,
)
def quality_classifier_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained (supervised) quality classifier: hashed-bigram Naive
    Bayes with curated-source weak labels, trained on the train slice
    only (doc_id % 3 != 0) and scoring EVERY doc — the model-based
    quality filter next to the heuristic gates (gopher_quality_rules)
    and the unsupervised cousins (dsir_importance_weights,
    charlm_perplexity). Held-out separation on a signal-bearing corpus
    is asserted in tests/test_curation.py."""
    return _nbq_scores_for(spark, sf_dir)


@query(
    "quality_classifier_report",
    # Counts-only rollup (plus one rounded ratio of counts): averaging the
    # per-doc rounded-double log_odds would be add-order-dependent and
    # break the hash gate, so the calibration view reports prediction
    # COUNTS per (source, train/heldout cell) — the numbers a
    # threshold-picking pass reads anyway.
    oracle=f"""
    WITH {_NBQ_DOCSCORES_CTES}
    SELECT source, label_curated,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE is_heldout) AS n_heldout,
           COUNT(*) FILTER (WHERE pred_curated) AS n_pred_curated,
           COUNT(*) FILTER (WHERE is_heldout AND pred_curated)
             AS n_heldout_pred_curated,
           CASE WHEN COUNT(*) FILTER (WHERE is_heldout) > 0 THEN
             ROUND(CAST(COUNT(*) FILTER (WHERE is_heldout AND pred_curated)
                        AS DOUBLE)
                   / COUNT(*) FILTER (WHERE is_heldout), 6)
           END AS heldout_pred_share
    FROM docscores
    GROUP BY source, label_curated
    """,
)
def quality_classifier_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source calibration rollup of the trained quality classifier:
    doc counts, held-out counts, and predicted-curated counts per cell —
    the view that says whether the weak-label model generalizes (held-out
    curated sources should lead the predicted-curated shares) before its
    verdicts gate a mix plan. Counts-only (one rounded count ratio), so
    the rollup is hash-exact on any engine/partitioning. Rides the
    per-snapshot score memo shared with quality_classifier_scores."""
    scores = _nbq_scores_for(spark, sf_dir)
    heldout_pred = F.count(
        F.when(F.col("is_heldout") & F.col("pred_curated"), F.lit(1))
    )
    n_heldout = F.count(F.when(F.col("is_heldout"), F.lit(1)))
    return scores.groupBy("source", "label_curated").agg(
        F.count(F.lit(1)).alias("n_docs"),
        n_heldout.alias("n_heldout"),
        F.count(F.when(F.col("pred_curated"), F.lit(1))).alias(
            "n_pred_curated"
        ),
        heldout_pred.alias("n_heldout_pred_curated"),
        F.when(
            n_heldout > 0,
            F.round(heldout_pred.cast("double") / n_heldout, 6),
        ).alias("heldout_pred_share"),
    )


@query(
    "classifier_gate_funnel",
    oracle=f"""
    WITH {_NBQ_DOCSCORES_CTES},
    t AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{_FUNNEL_TOKEN_RE}')) AS n_tok,
             len(list_distinct(regexp_extract_all(text, '{_FUNNEL_TOKEN_RE}')))
               AS n_dist,
             lang
      FROM documents
    ),
    j AS (
      SELECT t.n_tok, t.n_dist, t.lang, ds.pred_curated
      FROM t JOIN docscores ds USING (doc_id)
    ),
    a AS (
      SELECT COUNT(*) AS total,
             COUNT(CASE WHEN n_tok >= 20 THEN 1 END) AS s1,
             COUNT(CASE WHEN n_tok >= 20 AND n_tok <= 90 THEN 1 END) AS s2,
             COUNT(CASE WHEN n_tok >= 20 AND n_tok <= 90
                        AND CAST(n_dist AS DOUBLE) / n_tok >= 0.5
                   THEN 1 END) AS s3,
             COUNT(CASE WHEN n_tok >= 20 AND n_tok <= 90
                        AND CAST(n_dist AS DOUBLE) / n_tok >= 0.5
                        AND lang = 'en' THEN 1 END) AS s4,
             COUNT(CASE WHEN n_tok >= 20 AND n_tok <= 90
                        AND CAST(n_dist AS DOUBLE) / n_tok >= 0.5
                        AND lang = 'en' AND pred_curated THEN 1 END) AS s5
      FROM j
    ),
    staged AS (
      SELECT CAST(1 AS BIGINT) AS stage, 'min_tokens' AS gate_name,
             total AS docs_in, s1 AS docs_kept FROM a
      UNION ALL SELECT 2, 'max_tokens', s1, s2 FROM a
      UNION ALL SELECT 3, 'diversity', s2, s3 FROM a
      UNION ALL SELECT 4, 'lang_en', s3, s4 FROM a
      UNION ALL SELECT 5, 'nb_classifier', s4, s5 FROM a
    )
    SELECT stage, gate_name, docs_in, docs_kept,
           docs_in - docs_kept AS docs_dropped,
           CASE WHEN docs_in > 0
                THEN ROUND(CAST(docs_in - docs_kept AS DOUBLE)
                           / CAST(docs_in AS DOUBLE), 4)
                ELSE 0.0 END AS drop_rate
    FROM staged
    """,
)
def classifier_gate_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality_filter_funnel extended with the trained NB model gate:
    the same nested-conditional one-pass aggregate reports heuristic AND
    model-gated survivor counts together (ref parity: the reference's
    layered validation culture,
    work_item_budget_vs_actual_validation_queries.sql — each gate's
    survivors feed the next check). The model gate is ``pred_curated``,
    i.e. log_odds > 0 — the operating point whose per-source held-out
    calibration quality_classifier_report publishes; a pipeline picking
    a different threshold shifts the same column. Rides the per-snapshot
    NB score memo (one equi-join added to the funnel's row-local pass);
    gate-column agreement with quality_classifier_scores.pred_curated is
    pytest-pinned in tests/test_curation.py."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_FUNNEL_TOKEN_RE), 0)
    flagged = docs.select(
        "doc_id",
        F.array_size(toks).alias("__nt"),
        F.array_size(F.array_distinct(toks)).alias("__nd"),
        F.col("lang"),
    )
    joined = flagged.join(
        _nbq_scores_for(spark, sf_dir).select("doc_id", "pred_curated"),
        "doc_id",
    )
    gates = [
        ("min_tokens", F.col("__nt") >= 20),
        ("max_tokens", F.col("__nt") <= 90),
        (
            "diversity",
            (F.col("__nd").cast("double") / F.col("__nt").cast("double"))
            >= 0.5,
        ),
        ("lang_en", F.col("lang") == "en"),
        ("nb_classifier", F.col("pred_curated")),
    ]
    return curation.quality_funnel(joined, gates)


@query(
    "source_quality_report",
    oracle=rf"""
    WITH t AS (
      SELECT source,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
               AS n_tokens,
             CAST(len(list_distinct(regexp_extract_all(text, '[a-z0-9]+')))
                  AS BIGINT) AS n_distinct,
             CAST(len(regexp_extract_all(text,
                  '\b(the|a|is|and|of|to|in)\b')) AS BIGINT) AS stop_hits,
             regexp_extract_all(text, '{curation.GOPHER_WORD_RE}') AS ws,
             text
      FROM documents
    ),
    s AS (
      SELECT source,
             ROUND(
               0.4 * LEAST(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
               + 0.3 * (1.0 - LEAST(
                   (CASE WHEN n_tokens > 0
                         THEN CAST(stop_hits AS DOUBLE) / n_tokens
                         ELSE 0.0 END) * 2.0, 1.0))
               + 0.3 * (CASE WHEN n_tokens > 0
                             THEN CAST(n_distinct AS DOUBLE) / n_tokens
                             ELSE 0.0 END),
               4) AS score,
             len(ws) AS n_words,
             ROUND(CAST(list_sum(list_transform(ws, w -> len(w)))
                        AS DOUBLE) / len(ws), 6) AS mean_word_len,
             ROUND(CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
                        AS DOUBLE) / len(ws), 6) AS alpha_frac,
             ROUND(CAST((len(text) - len(replace(text, '#', '')))
                        + (len(text) - len(replace(text, '...', ''))) / 3
                        AS DOUBLE) / len(ws), 6) AS symbol_ratio,
             len(list_intersect(list_distinct(ws),
                 [{", ".join(f"'{w}'" for w in curation.GOPHER_STOPWORDS)}]))
               AS n_stop
      FROM t
    ),
    k AS (
      SELECT source, score,
             CASE WHEN score >= 0.75 THEN 'high'
                  WHEN score >= 0.5 THEN 'medium'
                  ELSE 'low' END AS bucket,
             (n_words >= {curation.GOPHER_MIN_WORDS}
              AND n_words <= {curation.GOPHER_MAX_WORDS}
              AND mean_word_len >= {curation.GOPHER_MIN_MEAN_WORD_LEN}
              AND mean_word_len <= {curation.GOPHER_MAX_MEAN_WORD_LEN}
              AND alpha_frac >= {curation.GOPHER_MIN_ALPHA_FRAC}
              AND symbol_ratio <= {curation.GOPHER_MAX_SYMBOL_RATIO}
              AND n_stop >= {curation.GOPHER_MIN_STOPWORDS}) AS keep
      FROM s
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS gopher_keep_rate,
           ROUND(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_quality_score,
           COUNT(CASE WHEN bucket = 'high' THEN 1 END) AS n_high,
           COUNT(CASE WHEN bucket = 'medium' THEN 1 END) AS n_medium,
           COUNT(CASE WHEN bucket = 'low' THEN 1 END) AS n_low
    FROM k GROUP BY source
    """,
)
def source_quality_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality scoreboard (mix monitoring): Gopher keep rate,
    mean heuristic score, bucket composition — one scan, one rollup."""
    return curation.source_quality_report(
        load_table(spark, sf_dir, "documents")
    )


_GOPHER_STOP_SQL = ", ".join(f"'{s}'" for s in curation.GOPHER_STOPWORDS)


@query(
    "gopher_quality_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_extract_all(text, '{curation.GOPHER_WORD_RE}') AS ws
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             ROUND(CAST(list_sum(list_transform(ws, w -> len(w)))
                        AS DOUBLE) / len(ws), 6) AS mean_word_len,
             ROUND(CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
                        AS DOUBLE) / len(ws), 6) AS alpha_word_frac,
             ROUND(CAST((len(text) - len(replace(text, '#', '')))
                        + (len(text) - len(replace(text, '...', ''))) / 3
                        AS DOUBLE) / len(ws), 6) AS symbol_ratio,
             CAST(len(list_intersect(list_distinct(ws),
                                     [{_GOPHER_STOP_SQL}]))
                  AS BIGINT) AS n_stopwords
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, alpha_word_frac, symbol_ratio,
           n_stopwords,
           n_words >= {curation.GOPHER_MIN_WORDS}
             AND n_words <= {curation.GOPHER_MAX_WORDS} AS pass_word_count,
           mean_word_len >= {curation.GOPHER_MIN_MEAN_WORD_LEN}
             AND mean_word_len <= {curation.GOPHER_MAX_MEAN_WORD_LEN}
             AS pass_mean_word_len,
           alpha_word_frac >= {curation.GOPHER_MIN_ALPHA_FRAC}
             AS pass_alpha_frac,
           symbol_ratio <= {curation.GOPHER_MAX_SYMBOL_RATIO}
             AS pass_symbol_ratio,
           n_stopwords >= {curation.GOPHER_MIN_STOPWORDS} AS pass_stopwords,
           (n_words >= {curation.GOPHER_MIN_WORDS}
            AND n_words <= {curation.GOPHER_MAX_WORDS}
            AND mean_word_len >= {curation.GOPHER_MIN_MEAN_WORD_LEN}
            AND mean_word_len <= {curation.GOPHER_MAX_MEAN_WORD_LEN}
            AND alpha_word_frac >= {curation.GOPHER_MIN_ALPHA_FRAC}
            AND symbol_ratio <= {curation.GOPHER_MAX_SYMBOL_RATIO}
            AND n_stopwords >= {curation.GOPHER_MIN_STOPWORDS}) AS keep
    FROM m
    """,
)
def gopher_quality_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-appendix word-shape quality rules per document (Rae et al.
    2021 §A1.1) — the rule-based complement to the token-count funnel.
    Row-local plan: split + higher-order folds, zero shuffle."""
    return curation.gopher_quality_rules(
        load_table(spark, sf_dir, "documents")
    )


@query(
    "dedup_token_savings_by_source",
    oracle="""
    WITH h AS (
      SELECT doc_id, source, md5(text) AS ch,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    c AS (SELECT ch, MIN(doc_id) AS canon FROM h GROUP BY ch),
    j AS (SELECT h.*, c.canon FROM h JOIN c USING (ch))
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id != canon THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN doc_id = canon THEN n_tokens ELSE 0 END)
                AS BIGINT) AS tokens_kept,
           CASE WHEN SUM(n_tokens) > 0 THEN
             ROUND(100.0 * (SUM(n_tokens)
                            - SUM(CASE WHEN doc_id = canon
                                       THEN n_tokens ELSE 0 END))
                   / SUM(n_tokens), 4)
           END AS dup_token_pct
    FROM j GROUP BY source ORDER BY source
    """,
)
def dedup_token_savings_by_source_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dataset accounting a 100 TB curation run reports per source: how
    many documents and TOKENS exact-hash dedup removes (canonical = min
    doc_id per content hash, same contract as ``dedup_exact``).  Token
    budget, not doc count, is what a training-mix plan actually spends —
    cf. the reference's per-table dedup-savings reporting
    (dedup verification in snowflake-bq-dedup-verification/main.py).

    Scale: one hash groupBy for canonicals, one equi-join back on the
    hash, one reduced per-source aggregate — no windows, no collect; the
    pct is a single double division of exact integer sums (cross-engine
    deterministic, the repo's established ratio discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("ch"),
        F.array_size(
            F.regexp_extract_all(F.col("text"), F.lit(text_ops.TOKEN_RE), 0)
        ).cast("long").alias("n_tokens"),
    )
    canon = h.groupBy("ch").agg(F.min("doc_id").alias("canon"))
    j = h.join(canon, "ch")
    kept = F.col("doc_id") == F.col("canon")
    agg = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(~kept, 1).otherwise(0)).alias("n_dup_docs"),
        F.sum("n_tokens").alias("tokens_total"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias(
            "tokens_kept"
        ),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_dup_docs",
        "tokens_total",
        "tokens_kept",
        F.when(
            F.col("tokens_total") > 0,
            F.round(
                F.lit(100.0)
                * (F.col("tokens_total") - F.col("tokens_kept"))
                / F.col("tokens_total"),
                4,
            ),
        ).alias("dup_token_pct"),
    ).orderBy("source")


@query(
    "length_curriculum_buckets",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT doc_id, n_tokens,
             CAST(NTILE(4) OVER (ORDER BY n_tokens, doc_id) AS BIGINT)
               AS bucket
      FROM t
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(n_tokens) AS min_tokens,
           MAX(n_tokens) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 4) AS avg_tokens
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def length_curriculum_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-curriculum quartiles: assign every document to an NTILE(4)
    bucket by token count (short -> long, the classic easy-to-hard
    curriculum split) and report each stage's doc/token budget.

    Scale: ``NTILE(k) OVER (ORDER BY ...)`` executes the whole corpus in
    ONE task — the plan that dies first at 100 TB — so the bucket id is
    derived from the two-phase global row number
    (operators/sync.py:global_row_number, fully parallel) plus NTILE's
    exact fill rule: with n rows the first n % k buckets take
    floor(n/k) + 1 rows, the rest floor(n/k).  The 1-row corpus count
    broadcasts (BroadcastNestedLoopJoin, the repo's sanctioned 1-row
    stats join)."""
    from ..operators.sync import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.array_size(
            F.regexp_extract_all(F.col("text"), F.lit(text_ops.TOKEN_RE), 0)
        ).cast("long").alias("n_tokens"),
    )
    ranked = global_row_number(t, ["n_tokens", "doc_id"], row_col="rn")
    n_df = t.agg(F.count(F.lit(1)).alias("__n"))
    j = ranked.crossJoin(F.broadcast(n_df))
    q = F.floor(F.col("__n") / 4)
    m = F.col("__n") % 4
    r = F.col("rn")
    bucket = F.when(
        r <= m * (q + 1), F.floor((r - 1) / (q + 1)) + 1
    ).otherwise(
        m + F.floor((r - 1 - m * (q + 1)) / F.greatest(q, F.lit(1))) + 1
    )
    return (
        j.groupBy(bucket.cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("tokens_total"),
            F.round(
                F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_tokens"),
        )
        .orderBy("bucket")
    )


@query(
    "doc_chunk_windows",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    n AS (SELECT doc_id, words, len(words) AS nw FROM w WHERE len(words) > 0),
    s AS (
      SELECT doc_id, words, nw,
             unnest(generate_series(0, nw - 1, 24)) AS start_word
      FROM n
    )
    SELECT doc_id,
           CAST(start_word // 24 AS BIGINT) AS chunk_idx,
           CAST(start_word AS BIGINT) AS start_word,
           CAST(least(32, nw - start_word) AS BIGINT) AS n_words,
           md5(array_to_string(
                 list_slice(words, start_word + 1, least(start_word + 32, nw)),
                 ' ')) AS chunk_md5
    FROM s
    """,
)
def doc_chunk_windows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-word / stride-24 retrieval chunks per document —
    the RAG/context chunking pass (map-only, no shuffle; see
    operators/text.chunk_windows for the scale posture)."""
    return text_ops.chunk_windows(load_table(spark, sf_dir, "documents"))


@query(
    "zipf_slope_by_source",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token
      FROM documents
    ),
    freq AS (SELECT source, token, COUNT(*) AS freq FROM tok GROUP BY 1, 2),
    ranked AS (
      SELECT source, token, freq,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY freq DESC, token) AS rnk
      FROM freq
    ),
    s AS (
      SELECT source,
             CAST(COUNT(*) AS DOUBLE) AS n,
             MAX(freq) AS top_freq,
             SUM(ln(rnk)) AS sx, SUM(ln(freq)) AS sy,
             SUM(ln(rnk) * ln(freq)) AS sxy, SUM(ln(rnk) * ln(rnk)) AS sxx
      FROM ranked WHERE rnk <= 100 GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_terms,
           CAST(top_freq AS BIGINT) AS top_freq,
           ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 4)
             AS zipf_slope,
           ROUND((sy - ((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0))
                        * sx) / n, 4) AS zipf_intercept
    FROM s
    """,
)
def zipf_slope_by_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf slope/intercept over the top-100 tokens (source
    quality fingerprint); re-aggregates the shared per-(doc, token)
    count memo, so the tokenize scan is paid once across the family."""
    return text_ops.zipf_slope_by_source(
        load_table(spark, sf_dir, "documents"),
        tok_counts=_tok_counts_for(spark, sf_dir),
    )


@query("vocab_heavy_hitters_sketch")  # rows-only: seeded-hash sketch, no SQL twin
def vocab_heavy_hitters_sketch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch heavy-hitter tokens (est vs exact + verdict) —
    the bounded-memory twin of vocab_top_k, completing the sketch
    family (HLL distinct, GK quantiles, CMS point frequency); rides the
    shared token-count memo. Recall-1.0 / overestimate-only properties
    pinned in tests/test_chunk_zipf_overlap.py."""
    return quality.cms_heavy_hitters(_tok_counts_for(spark, sf_dir))
