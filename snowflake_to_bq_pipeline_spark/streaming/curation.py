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
from pyspark.sql.streaming.state import GroupStateTimeout

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

#: Measured density knee for the UNVERIFIED banding stage at 16-bit
#: bands: ~93% retention at ~500 docs/horizon collapsing to ~10% at
#: ~5,000 (sign-sum signatures cluster, so band buckets fill far above
#: the uniform birthday rate). choose_band_bits widens the bands past
#: this knee.
DENSE_HORIZON_DOCS = 2_000


def choose_band_bits(docs_per_horizon: int) -> int:
    """Data-dependent band width for the UNVERIFIED banding stage,
    floored at NEAR_DEDUP_BAND_BITS.

    Below DENSE_HORIZON_DOCS docs per watermark horizon, 16-bit bands
    hold the measured ~93% retention with the hamming ≤ 3 pigeonhole
    drop guarantee. Past the knee, retention collapses (~10% at 5,000
    docs/horizon), so the rule widens to 32-bit bands — chance band
    collisions drop by ~2^16×, at the documented cost of weakening the
    pigeonhole guarantee to hamming ≤ 1 (2 bands). That trade is right
    for a best-effort PREFILTER backed by the scheduled batch sweep;
    when full hamming ≤ 3 recall must survive a dense horizon, use
    :func:`near_dedup_docs_verified` instead — it keeps the guarantee
    at any density by verifying candidates in band state.

    The input is the caller's expected horizon volume: a batch twin can
    count it (``band_bits="auto"`` in :func:`near_dedup_docs` does); a
    streaming caller sizes from its known ingest rate × horizon — an
    unbounded stream cannot be counted up front.
    """
    return 32 if docs_per_horizon > DENSE_HORIZON_DOCS else NEAR_DEDUP_BAND_BITS


def _horizon_ms(watermark: str) -> int:
    """Parse a Spark watermark delay string ("10 minutes", "30 seconds",
    "500 milliseconds", "2 hours") to milliseconds — needed to schedule
    event-time state timeouts that mirror dropDuplicatesWithinWatermark's
    eviction horizon."""
    qty, unit = watermark.strip().split()
    unit = unit.rstrip("s")
    scale = {
        "millisecond": 1,
        "second": 1_000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit]
    return int(qty) * scale


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
    band_bits: int | str = NEAR_DEDUP_BAND_BITS,
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
    uniform birthday rate — measured: ~93% of 508 docs kept, but only
    ~37% of a 5,000-doc perturbed-replica horizon of which just ~15%
    are true near-dups; tests/test_streaming.py dense-cliff test).
    Size ``band_bits`` to the expected horizon volume —
    ``band_bits="auto"`` applies :func:`choose_band_bits` on the batch
    twin — or escalate to :func:`near_dedup_docs_verified`, which
    carries signatures in band state for exact hamming checks and
    keeps full retention at any density.

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
    if band_bits == "auto":
        # Data-dependent sizing (choose_band_bits): only the batch twin
        # can count its horizon volume — a stream is unbounded, so
        # streaming callers must size from their known ingest rate.
        if watermark is not None:
            raise ValueError(
                "band_bits='auto' requires watermark=None (batch twin); "
                "size a streaming caller with choose_band_bits(expected "
                "docs per horizon) explicitly"
            )
        band_bits = choose_band_bits(docs.count())
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


def _banded(
    sig: DataFrame, ts_col: str, doc_id_col: str, band_bits: int
) -> DataFrame:
    """Explode non-null signatures to (ts, doc_id, simhash, band,
    band_val) rows — the shared banding projection of both near-dedup
    variants."""
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    return sig.filter(F.col("simhash").isNotNull()).select(
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
    ).select(ts_col, doc_id_col, "simhash", "bv.band", "bv.band_val")


def near_dedup_docs_verified(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    watermark: str | None = CURATION_WATERMARK,
    band_bits: int = NEAR_DEDUP_BAND_BITS,
    max_hamming: int = 3,
    sig: DataFrame | None = None,
) -> DataFrame:
    """VERIFIED-state streaming near-dedup — the documented escalation
    of :func:`near_dedup_docs` for dense horizons.

    Semantics (exact, order = event time then doc id): a doc is DROPPED
    iff some EARLIER doc within the watermark horizon has SimHash
    hamming distance ≤ ``max_hamming``; kept otherwise. Unlike the
    banding stage, a chance band collision never drops a doc — every
    candidate is verified against the signatures held in band state, so
    precision is 1.0 by construction and retention no longer collapses
    on dense horizons (the banding stage keeps ~10% of 5,080
    docs/horizon at 4×16-bit; this variant keeps every non-near-dup).
    Recall keeps the pigeonhole guarantee: any pair with hamming ≤
    n_bands − 1 (= 3 at 16-bit bands) shares at least one exact band
    value, so the later doc always meets its match in that band's
    state. Docs too short to shingle pass through unexamined.

    Spark shape: ONE stateful operator (the env's hard constraint —
    chained stateful ops make no progress). The stream is the stateless
    row-local signature projection exploded to band rows, grouped by
    the constant-width (band, band_val) key into
    ``applyInPandasWithState``: each group's state is the signature
    list seen on that band value within the horizon (sig + ts per
    entry — band-bucket-sized, never document text), against which
    incoming rows are hamming-verified vectorized (numpy xor +
    popcount). Rows emit (ts, doc_id, simhash, band, matched); the
    per-doc keep decision (NO band matched) is batch-local —
    :func:`near_dedup_verified_finalize` in foreachBatch — exact for
    the same reason as the banding stage: a doc's band rows are
    exploded from one input row and never straddle micro-batches.
    State eviction mirrors ``dropDuplicatesWithinWatermark``: entries
    expire once the event-time watermark passes their ts + horizon
    (pruned on every group visit, whole-group removal via event-time
    timeout when a band value goes quiet).

    ``watermark=None`` runs the exact batch twin — a band-bucketed
    self-join (earlier-than + hamming ≤ max_hamming, never all-pairs)
    with the finalize applied — the drain-equality reference. Pass
    ``sig`` (a precomputed ``(doc_id, simhash)`` table, e.g. the
    registry's per-snapshot memo) to skip the batch twin's signature
    aggregation.
    """
    n_bands = 64 // band_bits
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole recall "
            f"guarantee of {n_bands}x{band_bits}-bit bands "
            f"(hamming <= {n_bands - 1})"
        )

    if watermark is None:
        from ..operators.neardup import hashed_shingles, simhash_signatures

        if sig is not None:
            agg = sig
        else:
            agg = simhash_signatures(
                hashed_shingles(
                    docs.select(
                        F.col(doc_id_col).alias("doc_id"), F.col(text_col)
                    ),
                    text_col,
                    k=3,
                ).select("doc_id", F.col("__h").alias("th"))
            )
        sigt = docs.select(ts_col, doc_id_col).join(
            agg.select(F.col("doc_id").alias(doc_id_col), "simhash"),
            doc_id_col,
            "left",
        )
        from ..operators._cache import swap_cache

        sigt = swap_cache("near_dedup_verified_sigs", sigt)
        b = _banded(sigt, ts_col, doc_id_col, band_bits)
        e = b.select(
            "band",
            "band_val",
            F.col("simhash").alias("__sig_e"),
            F.col(ts_col).alias("__ts_e"),
            F.col(doc_id_col).alias("__id_e"),
        )
        d = b.select(
            "band",
            "band_val",
            F.col("simhash").alias("__sig_d"),
            F.col(ts_col).alias("__ts_d"),
            F.col(doc_id_col).alias("__id_d"),
        )
        earlier = (F.col("__ts_e") < F.col("__ts_d")) | (
            (F.col("__ts_e") == F.col("__ts_d"))
            & (F.col("__id_e") < F.col("__id_d"))
        )
        ham = F.bit_count(F.col("__sig_e").bitwiseXOR(F.col("__sig_d")))
        dropped = (
            e.join(d, ["band", "band_val"])
            .filter(earlier & (ham <= max_hamming))
            .select(F.col("__id_d").alias(doc_id_col))
            .distinct()
        )
        return sigt.join(dropped, doc_id_col, "left_anti").select(
            ts_col, doc_id_col, "simhash"
        )

    # ---- streaming form ------------------------------------------------
    proj = with_simhash(docs, text_col).select(ts_col, doc_id_col, "simhash")
    short = proj.filter(F.col("simhash").isNull()).select(
        ts_col,
        doc_id_col,
        "simhash",
        F.lit(-1).alias("band"),
        F.lit(False).alias("matched"),
    )
    banded = _banded(proj, ts_col, doc_id_col, band_bits)
    # doc-id type flows from the input schema (a hardcoded long would
    # break string doc ids on the STREAMING path only, silently
    # violating the drain-equality contract with the batch twin — the
    # same id-type hazard as the banding stage's pass-through keying)
    id_type = docs.schema[doc_id_col].dataType.simpleString()
    verified = (
        banded.withWatermark(ts_col, watermark)
        .groupBy("band", "band_val")
        .applyInPandasWithState(
            _make_band_verifier(
                ts_col, doc_id_col, max_hamming, _horizon_ms(watermark)
            ),
            outputStructType=(
                f"{ts_col} timestamp, {doc_id_col} {id_type}, "
                "simhash long, band int, matched boolean"
            ),
            stateStructType="sigs array<long>, ts_us array<long>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return verified.unionByName(short)


def _make_band_verifier(
    ts_col: str, doc_id_col: str, max_hamming: int, horizon_ms: int
):
    """Build the per-(band, band_val) stateful verifier.

    State = parallel arrays (sigs, ts_us) of the signatures seen on
    this band value within the horizon. Each incoming row is checked
    against state ∪ earlier-in-batch rows with a vectorized
    xor + popcount; its own signature then joins the working set
    whether or not it matched (semantics: "any earlier ARRIVED doc",
    matching the banding stage's first-SEEN — not first-KEPT — state,
    so the decision never depends on another group's verdict).
    """
    import numpy as np
    import pandas as pd

    def _popcount(x: "np.ndarray") -> "np.ndarray":
        return (
            np.unpackbits(x.view(np.uint8)).reshape(len(x), 64).sum(axis=1)
        )

    def verify(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        sigs, ts_us = (
            ([*state.get[0]], [*state.get[1]])
            if state.exists
            else ([], [])
        )
        parts = [p for p in pdfs if len(p)]  # empty frames poison concat dtypes
        if not parts:
            return
        rows = pd.concat(parts, ignore_index=True)
        rows = rows.sort_values([ts_col, doc_id_col], kind="stable")
        out_matched = []
        for sig, ts in zip(
            rows["simhash"].to_numpy(), rows[ts_col].to_numpy()
        ):
            if sigs:
                # xor is sign-agnostic, so the whole check stays in int64
                x = np.bitwise_xor(np.array(sigs, dtype=np.int64), np.int64(sig))
                out_matched.append(bool((_popcount(x) <= max_hamming).any()))
            else:
                out_matched.append(False)
            sigs.append(int(sig))
            ts_us.append(int(pd.Timestamp(ts).value // 1_000))
        # Horizon eviction mirrors dropDuplicatesWithinWatermark: an
        # entry can no longer match once the watermark passes
        # entry_ts + horizon (any future row has ts >= watermark).
        wm_us = state.getCurrentWatermarkMs() * 1_000
        keep = [i for i, t in enumerate(ts_us) if t + horizon_ms * 1_000 >= wm_us]
        sigs = [sigs[i] for i in keep]
        ts_us = [ts_us[i] for i in keep]
        if sigs:
            state.update((sigs, ts_us))
            state.setTimeoutTimestamp(
                max(ts_us) // 1_000 + horizon_ms + 1
            )
        else:
            state.remove()
        yield rows.assign(matched=out_matched)[
            [ts_col, doc_id_col, "simhash", "band", "matched"]
        ]

    return verify


def near_dedup_verified_finalize(
    out: DataFrame, ts_col: str = "ts", doc_id_col: str = "doc_id"
) -> DataFrame:
    """Batch-local keep decision for the verified variant: a doc is kept
    iff NO band reported a hamming-verified match (pass-through short
    docs carry matched=false). Exact within any DataFrame whose rows
    cover whole docs — every foreachBatch micro-batch, because a doc's
    band rows are exploded from one input row. Emits ``(ts, doc_id,
    simhash)``."""
    return (
        out.groupBy(ts_col, doc_id_col, "simhash")
        .agg(F.max("matched").alias("__m"))
        .filter(~F.col("__m"))
        .select(ts_col, doc_id_col, "simhash")
    )
