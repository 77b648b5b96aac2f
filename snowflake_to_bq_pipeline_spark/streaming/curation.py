"""Streaming corpus curation: quality gate + content dedup, continuously.

The batch registry curates in scheduled passes (text.quality_score,
neardup.exact_dedup); an ingestion pipeline wants the same gates applied
AS DOCUMENTS ARRIVE. Because every quality metric here is a narrow
per-row column expression, the exact batch operators compose onto a
streaming DataFrame unchanged — the only genuinely stateful step is
content dedup, which uses ``dropDuplicatesWithinWatermark`` on the text
fingerprint so state stays bounded by the watermark horizon (same
layered posture as streaming/dedup.py: in-horizon dups die here,
horizon-straddling replays are caught by the scheduled ``dedup_exact``
sweep).

Scale: no shuffle except the dedup state exchange on the 32-char
fingerprint (constant-width key, never document text); quality gating is
stateless per-row compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.neardup import with_simhash
from ..operators.text import TOKEN_RE

CURATION_WATERMARK = "10 minutes"
MIN_TOKENS = 5
MAX_TOKENS = 100_000

#: Simhash band width (bits) for the streaming near-dedup stage. 16-bit
#: bands (4 per 64-bit signature) guarantee an in-horizon drop for every
#: pair with hamming ≤ 3 (pigeonhole) while keeping chance band
#: collisions rare; 8-bit bands would guarantee hamming ≤ 7 but measured
#: 94% spurious drops on a homogeneous sf0.001 corpus (sign-sum
#: signatures cluster, so narrow bands collide far above the uniform
#: birthday rate) vs 7% for 16-bit.
NEAR_DEDUP_BAND_BITS = 16


def curate_docs(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str | None = CURATION_WATERMARK,
) -> DataFrame:
    """Quality-gate + fingerprint-dedup a document stream (or batch).

    Works identically on a streaming and a batch DataFrame: pass
    ``watermark=None`` for the batch twin (plain dropDuplicates) — the
    pytest asserts drain-equality between the two.

    Output adds: n_tokens, fingerprint, quality gates applied as filters
    (length window, nonempty alpha content).
    """
    t = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.lower(t), "[ \\t\\n\\r]+", " "))
    n_tokens = F.array_size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0))
    gated = (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("fingerprint", F.md5(norm.cast("binary")))
        .filter(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("n_tokens") <= MAX_TOKENS)
            & (F.length(norm) > 0)
        )
    )
    if watermark is None:
        return gated.dropDuplicates(["fingerprint"])
    return gated.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )


def near_dedup_docs(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    watermark: str | None = CURATION_WATERMARK,
    band_bits: int = NEAR_DEDUP_BAND_BITS,
    sh: DataFrame | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Streaming simhash-band NEAR-dedup, survivor-band form — the fuzzy
    twin of :func:`curate_docs`'s md5 exact-fingerprint stage (ref
    pattern: work_item_details_latest_view.sql:58 latest-wins dedup,
    continuous form).

    Semantics (greedy first-seen, order = event time then doc id): each
    doc's 64-bit row-local SimHash (operators.neardup.with_simhash —
    bit-identical to the batch signatures) is split into ``64 //
    band_bits`` disjoint bands; a doc is kept iff NONE of its band
    values was seen on ANY earlier doc inside the horizon. By the
    pigeonhole bound this drops every in-horizon pair with hamming ≤
    n_bands − 1 (≤ 3 at the default 16-bit width — the near-exact
    replays a streaming stage exists to stop; asserted against batch
    ``simhash_pairs`` in tests/test_streaming.py). Chance band-collision
    over-drops fall to the scheduled batch sweep to adjudicate (the same
    layered posture as the exact stage) and are kept rare by the band
    width — see NEAR_DEDUP_BAND_BITS for the measured 8-bit failure
    mode. Docs too short to shingle (NULL simhash) pass through
    unexamined, as band −1 rows keyed by xxhash64 of their own doc id
    (non-null and distinct for any doc-id type — the NULL-safe dedup
    key must never collide across distinct short docs).

    Density caveat: chance-collision over-drops grow with docs-per-
    horizon (sign-sum signatures cluster, so bands fill far above the
    uniform birthday rate — the whole-corpus batch twin keeps ~93% of
    508 docs but only ~10% of 5,080 at 4×16-bit). Size ``band_bits`` to
    the expected horizon volume; a VERIFIED variant (band state carrying
    signatures for exact hamming checks via applyInPandasWithState)
    is the escalation path when horizon density is high and retention
    matters.

    Spark shape: ONE stateful operator. The stream is a stateless
    signature projection exploded to band rows, deduped with
    ``dropDuplicatesWithinWatermark`` on the constant-width
    (band, band_val) key — state is band keys within the horizon, never
    document text. The per-doc keep decision (ALL bands first-seen) is
    deliberately NOT a second stateful aggregate (a chained stateful op
    would hold every in-flight doc until watermark eviction): a doc's
    band rows are exploded from one input row, so they live and die in
    the SAME micro-batch, making the reassembly batch-LOCAL — run
    :func:`near_dedup_finalize` on each sink micro-batch (foreachBatch),
    which is exact, stateless, and adds no latency.

    ``watermark=None`` runs the exact batch twin — min-(ts, doc_id)
    first-seen band survival WITH the finalize applied — the
    drain-equality reference for the streaming form.
    """
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    if watermark is None:
        # Batch twin: no stream means no row-locality requirement, so
        # signatures come from the AGGREGATED explode+groupBy path —
        # proven bit-identical to with_simhash (tests/test_neardup.py)
        # and ~3× faster in batch, where the row-local form's 16
        # interpreted higher-order folds per row are pure overhead.
        from ..operators.neardup import (
            _require_shingle_table,
            hashed_shingles,
            simhash_signatures,
        )

        if sig is not None:
            # precomputed (doc_id, simhash) signature table (e.g. the
            # registry's per-snapshot signature memo shared with batch
            # dedup_simhash) — skips the aggregation entirely; wins
            # over ``sh`` when both are given
            agg = sig
        elif sh is not None:
            # precomputed hashed-shingle index (e.g. the registry's
            # per-snapshot memo) — same (k=3, text_col) contract as the
            # batch near-dup family
            _require_shingle_table(sh, text_col, 3, "near_dedup_docs(sh)")
            h = sh.select("doc_id", F.col("__h").alias("th"))
            agg = simhash_signatures(h)
        else:
            h = hashed_shingles(
                docs.select(
                    F.col(doc_id_col).alias("doc_id"), F.col(text_col)
                ),
                text_col,
                k=3,
            ).select("doc_id", F.col("__h").alias("th"))
            agg = simhash_signatures(h)
        sig = docs.select(ts_col, doc_id_col).join(
            agg.select(
                F.col("doc_id").alias(doc_id_col), "simhash"
            ),
            doc_id_col,
            "left",
        )
    else:
        sig = with_simhash(docs, text_col).select(
            ts_col, doc_id_col, "simhash"
        )
    short = sig.filter(F.col("simhash").isNull()).select(
        ts_col,
        doc_id_col,
        "simhash",
        F.lit(-1).alias("band"),
        # xxhash64, NOT cast("long"): for a string doc id the cast yields
        # NULL, and dropDuplicatesWithinWatermark treats NULL keys as
        # equal — every short doc would share the (-1, NULL) key and all
        # but the first would be dropped, contradicting the documented
        # pass-through semantics. xxhash64 gives a distinct non-null
        # band value for ANY doc-id type.
        F.xxhash64(F.col(doc_id_col)).alias("band_val"),
    )
    banded = sig.filter(F.col("simhash").isNotNull()).select(
        ts_col,
        doc_id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("band"),
                        F.shiftright(F.col("simhash"), c * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for c in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select(
        ts_col, doc_id_col, "simhash", "bv.band", "bv.band_val"
    ).unionByName(short)

    if watermark is None:
        # Persisted: the first-seen aggregate and the rejoin both consume
        # the band table, and each would otherwise re-run the expensive
        # signature projection (4 materializations measured 320s vs one
        # at sf0.001 on a single-file input).
        from ..operators._cache import swap_cache

        banded = swap_cache("near_dedup_twin_bands", banded)
        order = F.struct(F.col(ts_col), F.col(doc_id_col))
        first = banded.groupBy("band", "band_val").agg(
            F.min(order).alias("__first")
        )
        surv = (
            banded.join(first, ["band", "band_val"])
            .filter(order == F.col("__first"))
            .drop("__first")
        )
        return near_dedup_finalize(surv, ts_col, doc_id_col, band_bits)
    return banded.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(["band", "band_val"])


def near_dedup_finalize(
    surv: DataFrame,
    ts_col: str = "ts",
    doc_id_col: str = "doc_id",
    band_bits: int = NEAR_DEDUP_BAND_BITS,
) -> DataFrame:
    """Batch-local keep decision over survivor-band rows: a doc is kept
    iff ALL its ``64 // band_bits`` band rows survived the dedup, or it
    is a band −1 pass-through (too short to shingle). Exact within any
    DataFrame whose rows cover whole docs — in streaming that is every
    foreachBatch micro-batch, because a doc's band rows are exploded from
    one input row and never straddle batches. Emits ``(ts, doc_id,
    simhash)``."""
    return (
        surv.groupBy(ts_col, doc_id_col, "simhash")
        .agg(
            F.count(F.when(F.col("band") >= 0, F.lit(1))).alias("__bands"),
            F.max(F.col("band") == -1).alias("__passthrough"),
        )
        .filter(
            F.col("__passthrough") | (F.col("__bands") == 64 // band_bits)
        )
        .select(ts_col, doc_id_col, "simhash")
    )
