"""Near-duplicate detection: exact, n-gram Jaccard, MinHash+LSH, SimHash.

LLM-training-data extensions (SURVEY.md §2-E). The exact and Jaccard paths
are oracle-checkable; MinHash/SimHash depend on Spark's xxhash64 and are
validated by recall tests against the exact Jaccard result instead.

Scale posture:
- ``exact_dedup`` groups on md5(text) — constant-width shuffle key instead
  of shuffling full documents.
- ``shingles`` is a per-row transform (no shuffle); the Jaccard self-join
  shuffles on the shingle value, which is the standard scalable plan — the
  cross product never materializes, only per-shingle buckets.
- Multi-consumer intermediates (the shingle table, the SimHash signature)
  are persisted with managed lifecycle (``_swap_cache``): the round-2
  executed plans showed 0 ReusedExchange — every consumer recomputed the
  explode+dedup subtree, costing 2x wall-time and 2-8s run-to-run
  variance at sf0.1.
- ``minhash_lsh_pairs`` is the 100 TB path: signature computation is one
  groupBy over exploded shingles (32 min-aggregates + the shingle count,
  single shuffle), banding explodes to B small rows per doc, and candidate
  generation joins on (band, band_hash) buckets only. Candidates are then
  verified with exact Jaccard — no false positives, LSH-bounded
  false-negative rate.
- ``simhash_pairs`` bands the 64-bit signature into 8 byte-chunks; only
  chunk-equal pairs are candidates (pigeonhole-exact for hamming ≤ 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._cache import swap_cache as _swap_cache

N_PERMS = 32
N_BANDS = 8  # 4 rows per band
SIMHASH_CHUNKS = 8

#: Hot-shingle (stop-phrase) guard: a shingle carried by d docs explodes
#: the candidate self-join to d² rows in ONE bucket — the lexical twin of
#: the TF-IDF hot-token hazard, and THE 100 TB killer when a boilerplate
#: phrase (license header, crawler banner) lands in a large corpus
#: fraction. Shingles with document frequency above
#: ``max(DF_CAP_MIN, n_docs // DF_CAP_FRAC)`` are pruned from CANDIDATE
#: GENERATION only; candidates are exactly re-scored over the FULL
#: shingle sets, and small docs that a pruned shingle could still carry
#: over the threshold are exempted from pruning (see
#: ``_guard_plan_or_none``) — output provably identical for ANY cap.
DF_CAP_MIN = 64
DF_CAP_FRAC = 50
#: hot shingle hashes ship as a driver-side InSet predicate up to this
#: many (Catalyst hash-set conversion keeps execution O(1) per row and
#: the plan under ~100 KB); a corpus with more distinct hot shingles
#: than this is wall-to-wall boilerplate — the guard declines and the
#: plain plan runs (its per-bucket cost bounded by that same flat df
#: distribution)
_HOT_LIST_MAX = 10_000


def exact_dedup(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per doc with its canonical (min doc_id) exact-dup group."""
    h = documents.select(
        "doc_id", F.md5(F.col(text_col).cast("binary")).alias("content_hash")
    )
    g = h.groupBy("content_hash").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("dup_group_size"),
    )
    return h.join(g, "content_hash").select(
        "doc_id",
        "content_hash",
        "canonical_doc_id",
        (F.col("doc_id") != F.col("canonical_doc_id")).alias("is_duplicate"),
        "dup_group_size",
    )


def shingles(
    documents: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Distinct word-k-gram shingles, one row per (doc_id, shingle).

    1-indexed element_at mirrors the oracle's list indexing; sequence is
    guarded because Spark's sequence(1, 0) counts DOWN instead of being
    empty.
    """
    from ..catalog import fan_out

    w = F.split(F.col(text_col), " ")
    idx = F.when(
        F.array_size(w) >= k, F.sequence(F.lit(1), F.array_size(w) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    # fan_out: split/explode here is the CPU floor of every near-dup
    # consumer; a single-row-group local file would run it one-core.
    exploded = fan_out(documents.select("doc_id", F.col(text_col))).select(
        "doc_id", w.alias("__w"), F.explode(idx).alias("i")
    )
    parts = [F.element_at(F.col("__w"), F.col("i") + j) for j in range(k)]
    # dropDuplicates' aggregation exchange doubles as the shared
    # materialization point for every consumer (signatures, sizes, both
    # self-join sides). Measured alternatives — row-local array_distinct
    # with no shuffle, and with an explicit repartition — both ran ~2×
    # slower end-to-end: the map-side partial dedup plus exchange reuse
    # beats recomputing or re-shuffling the exploded shingles.
    return (
        exploded.select("doc_id", F.concat_ws(" ", *parts).alias("shingle"))
        .dropDuplicates(["doc_id", "shingle"])
    )


def hashed_shingles(
    documents: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """(doc_id, __h) hashed word-k-gram shingle index — the reusable
    asset of the whole lexical near-dup family (Jaccard, containment,
    novelty, SimHash all start from exactly this table). The registry
    memoizes it per corpus snapshot (``_shingles_for``) so a session
    running several family members builds the explode+dedup+hash once;
    between daily runs this is what a production pipeline would persist
    as the standing index.

    The ``__h`` column carries (k, text_col) as column metadata so every
    consumer that accepts a precomputed table can verify it was built
    with matching parameters (see :func:`_require_shingle_table`) — a
    caller handing containment a k=5 index built off another column
    fails loudly instead of returning silently-wrong pair counts."""
    return shingles(documents, text_col, k).select(
        "doc_id",
        F.xxhash64("shingle").alias(
            "__h", metadata={"shingle_k": k, "shingle_text_col": text_col}
        ),
    )


def _require_shingle_table(
    sh: DataFrame, text_col: str, k: int, caller: str
) -> None:
    """Fail loudly when a precomputed shingle table doesn't match the
    caller's (text_col, k) contract.

    Shape is always enforced ((doc_id, __h) present); provenance is
    enforced when the table carries :func:`hashed_shingles`' metadata
    tag. A foreign table without the tag passes the shape check only —
    the documented caller contract still applies to it.
    """
    missing = {"doc_id", "__h"} - set(sh.columns)
    if missing:
        raise ValueError(
            f"{caller}: precomputed shingle table lacks column(s) "
            f"{sorted(missing)}; expected a hashed_shingles(doc_id, __h) "
            f"table"
        )
    meta = sh.schema["__h"].metadata or {}
    got_k = meta.get("shingle_k")
    got_col = meta.get("shingle_text_col")
    if got_k is not None and int(got_k) != k:
        raise ValueError(
            f"{caller}: precomputed shingle table was built with "
            f"k={got_k}, but the call requests k={k}"
        )
    if got_col is not None and got_col != text_col:
        raise ValueError(
            f"{caller}: precomputed shingle table was built over "
            f"text_col={got_col!r}, but the call requests "
            f"text_col={text_col!r}"
        )


def _df_guard_stats(sh: DataFrame, sizes: DataFrame, df_cap: int | None):
    """ONE bounded job deciding whether the hot-shingle guard is needed:
    returns (cap, n_over_thr, max_df exceeded?). n_over_thr counts
    df > min-possible-cap, so it upper-bounds the true hot count for
    any auto cap — a larger bound only widens the exemption (more pairs
    checked exactly), never loses one."""
    thr = df_cap if df_cap is not None else DF_CAP_MIN
    df_tab = sh.groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
    stats = (
        df_tab.agg(
            F.max("__df").alias("max_df"),
            F.sum((F.col("__df") > thr).cast("long")).alias("n_over_thr"),
        )
        .crossJoin(sizes.agg(F.count(F.lit(1)).alias("n_docs")))
        .collect()[0]
    )
    cap = (
        df_cap
        if df_cap is not None
        else max(DF_CAP_MIN, (stats["n_docs"] or 0) // DF_CAP_FRAC)
    )
    fires = stats["max_df"] is not None and stats["max_df"] > cap
    return df_tab, cap, stats["n_over_thr"], fires


def probe_guard_stats(
    sh: DataFrame, df_cap: int | None = None
) -> tuple[int, int, bool]:
    """Run the hot-shingle guard's ONE bounded stats job over a shingle
    index and return its collected verdict ``(cap, n_over_thr, fires)``
    — the injectable form of the per-call probe.

    The verdict is a pure function of (index contents, ``df_cap``), so
    a caller holding a STANDING index (the registry's per-snapshot
    shingle memo, a persisted daily-increment index) can probe it once
    and hand the verdict to every guard consumer via ``guard_stats=``
    instead of re-running the same two-aggregate job per plan build
    (guide §1.2: don't recompute what a standing asset already knows).
    ``n_over_thr`` counts df > the min-possible cap, so the verdict is
    threshold-independent and one probe serves Jaccard, containment and
    incremental consumers alike.
    """
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    _, cap, n_over_thr, fires = _df_guard_stats(sh, sizes, df_cap)
    return int(cap), int(n_over_thr or 0), bool(fires)


def _df_guard_probe(
    df_tab: DataFrame, sizes, size_col: str, cap: int, exempt_sz: float
) -> tuple[list, int]:
    """One combined job collecting the hot-hash list AND the exempt-doc
    count (docs small enough that hot shingles alone could carry them
    over the threshold). Both are bounded: hot hashes by _HOT_LIST_MAX
    (checked by the caller), the count is one row."""
    probe = df_tab.filter(F.col("__df") > cap).select(
        F.col("__h"), F.lit(None).cast("long").alias("__cnt")
    ).unionByName(
        sizes.filter(F.col(size_col) <= F.lit(exempt_sz)).agg(
            F.count(F.lit(1)).alias("__cnt")
        ).select(F.lit(None).cast("long").alias("__h"), "__cnt")
    )
    hot_hashes, n_exempt = [], 0
    for r in probe.collect():
        if r["__h"] is not None:
            hot_hashes.append(r["__h"])
        else:
            n_exempt = r["__cnt"]
    return hot_hashes, n_exempt


def _df_guard_pair_table(
    sh: DataFrame,
    threshold: float,
    df_cap: int | None,
    guard_stats: tuple[int, int, bool] | None = None,
) -> DataFrame | None:
    """Exact (doc_a, doc_b, intersection_size, size_a, size_b) computed
    hot-shingle-safely, or None when no shingle's document frequency
    exceeds the cap — the clean-corpus common case, where the plain
    self-join is the better plan (the guard then costs exactly one
    bounded two-aggregate job; the fixed-overhead lesson from the
    semdedup grid).

    Guarded decomposition: intersection = COLD part + HOT part.

    - COLD: the standard shingle self-join restricted to shingles with
      df ≤ cap — per-bucket work is bounded by cap², never (n/2)².
    - HOT: each doc carries at most |HOT| hot shingles, so they ride
      the per-doc size aggregate as a collect_set column and the hot
      overlap is |array_intersect(hs_a, hs_b)| computed AT the size
      joins the op already does — zero extra joins, no explosion, and
      no re-scoring of full shingle sets (a first cut re-scored
      candidates over full sets; that multiplies every 1-shared-shingle
      candidate by ~|doc| and measured 10× the naive time on the hot
      corpus).
    - Pairs whose overlap is hot-ONLY are added from the exemption
      join: intersection ≤ |HOT| forces the deciding doc's size ≤
      |HOT|/threshold (Jaccard divides by max size, containment by min
      size), so joining just the EXEMPT docs' hot rows against all hot
      rows recovers every such pair; when NO doc is small enough to be
      exempt (the probe job counts them), the branch — and its
      union+dedup — is skipped entirely. Same exactness-preserving
      shape as the TF-IDF max-df guard (operators/text.py): output
      identical for ANY cap.

    A corpus of near-identical boilerplate docs still pairs
    quadratically through the exemption — but there the OUTPUT is
    genuinely quadratic; no candidate scheme can beat its own result
    size.

    A corpus with >_HOT_LIST_MAX distinct hot shingles (pathological —
    a boilerplate corpus has a handful) falls back to the unguarded
    plan rather than shipping an unbounded isin list; the naive plan's
    per-bucket cost is bounded by that very df distribution being flat.
    """
    if threshold <= 0:
        # exempt_sz = n_hot/threshold is undefined (or inverts the
        # exemption for negative values); at threshold <= 0 the naive
        # plan keeps every INTERSECTING pair (both plans only ever emit
        # pairs sharing >= 1 shingle — shingle-disjoint pairs with
        # jaccard 0 >= threshold are out of scope for either), so fall
        # back to the naive plan — which accepts threshold <= 0 without
        # crashing — instead of guarding.
        return None
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    if guard_stats is None:
        df_tab, cap, n_hot_ub, fires = _df_guard_stats(sh, sizes, df_cap)
    else:
        # standing-index verdict injected by the caller (same contract
        # as probe_guard_stats over THIS sh/df_cap): skip the stats job;
        # df_tab is only consumed below when the guard fires, and its
        # lazy declaration costs nothing otherwise.
        cap, n_hot_ub, fires = guard_stats
        df_tab = sh.groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
    if not fires or n_hot_ub > _HOT_LIST_MAX:
        return None
    exempt_sz = n_hot_ub / threshold
    hot_hashes, n_exempt = _df_guard_probe(
        df_tab, sizes, "sz", cap, exempt_sz
    )
    if len(hot_hashes) > n_hot_ub:
        # Contract breach under injection (r15, ADVICE): ``n_over_thr``
        # counts df > the MIN-POSSIBLE cap, so an honest probe of THIS
        # index always upper-bounds the df > cap hot list collected
        # here; a smaller injected bound (verdict probed over a
        # different slice / df_cap than ``sh``) would shrink exempt_sz
        # and silently drop hot-only pairs.  Degrade to the exact naive
        # plan instead of producing wrong output — the probed path can
        # never trip this (same job produced both numbers).
        return None
    is_hot = F.col("__h").isin(hot_hashes)
    cold, hot = sh.filter(~is_hot), sh.filter(is_hot)

    cold_inter = (
        cold.select(F.col("doc_id").alias("doc_a"), "__h")
        .join(cold.select(F.col("doc_id").alias("doc_b"), "__h"), "__h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("__cold"))
    )
    if n_exempt > 0:
        exempt_docs = sizes.filter(F.col("sz") <= F.lit(exempt_sz)).select(
            "doc_id"
        )
        hot_only_pairs = (
            hot.join(F.broadcast(exempt_docs), "doc_id")
            .select(F.col("doc_id").alias("doc_x"), "__h")
            .join(hot.select(F.col("doc_id").alias("doc_y"), "__h"), "__h")
            .filter(F.col("doc_x") != F.col("doc_y"))
            .select(
                F.least("doc_x", "doc_y").alias("doc_a"),
                F.greatest("doc_x", "doc_y").alias("doc_b"),
            )
            .dropDuplicates(["doc_a", "doc_b"])
        )
        base = (
            cold_inter.select("doc_a", "doc_b")
            .unionByName(hot_only_pairs)
            .dropDuplicates(["doc_a", "doc_b"])
            .join(cold_inter, ["doc_a", "doc_b"], "left")
        )
    else:
        base = cold_inter
    # per-doc size + hot-shingle set in ONE aggregate: the op-level size
    # joins double as the hot-overlap transport (collect_set ignores the
    # when()'s nulls, so cold-only docs carry an empty array)
    szhs = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("sz"),
        F.collect_set(F.when(is_hot, F.col("__h"))).alias("__hs"),
    )
    hot_shared = F.array_size(
        F.array_intersect(F.col("__hs_a"), F.col("__hs_b"))
    )
    return (
        base.join(
            szhs.select(
                F.col("doc_id").alias("doc_a"),
                F.col("sz").alias("size_a"),
                F.col("__hs").alias("__hs_a"),
            ),
            "doc_a",
        )
        .join(
            szhs.select(
                F.col("doc_id").alias("doc_b"),
                F.col("sz").alias("size_b"),
                F.col("__hs").alias("__hs_b"),
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.coalesce(F.col("__cold"), F.lit(0).cast("long"))
                + hot_shared.cast("long")
            ).alias("intersection_size"),
            "size_a",
            "size_b",
        )
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    threshold: float,
    text_col: str = "text",
    k: int = 3,
    sh: DataFrame | None = None,
    df_cap: int | None = None,
    guard_stats: tuple[int, int, bool] | None = None,
) -> DataFrame:
    """All pairs with shingle-Jaccard ≥ threshold (exact, via shingle join).

    Scope: pairs sharing at least one shingle.  For any threshold > 0 that
    IS every qualifying pair (jaccard > 0 requires an intersection); at the
    degenerate threshold ≤ 0 shingle-disjoint pairs (jaccard 0 ≥ 0) are
    still absent — the operator never enumerates the non-intersecting
    cross product.

    The intersection join runs on ``xxhash64(shingle)`` — 8-byte keys —
    instead of the variable-length shingle strings: measured 2.5× at
    sf0.1 (3.5s → 1.4s) because the pair-explosion shuffle moves fixed
    longs. Same collision trade the MinHash verification path documents:
    a 64-bit collision off-by-ones one intersection count with
    probability ~distinct²/2⁶⁴ — negligible against the DuckDB oracle's
    string-exact counts. Pass ``sh`` (a hashed_shingles table, e.g. the
    registry's fingerprint memo) to skip the shingle build.

    NOTE: constructing the plan runs ONE bounded Spark job (the
    hot-shingle guard's two-aggregate stats probe) — the repo's
    established one-bounded-job guard pattern — so this call is not
    lazy the way a pure plan builder is. Pass ``guard_stats`` (the
    :func:`probe_guard_stats` verdict for the SAME ``sh``/``df_cap``,
    e.g. the registry's per-snapshot memo) to skip that job too.
    """
    if sh is None:
        sh = _swap_cache("jaccard", hashed_shingles(documents, text_col, k))
    else:
        _require_shingle_table(sh, text_col, k, "ngram_jaccard_pairs")
    scored = _df_guard_pair_table(sh, threshold, df_cap, guard_stats)
    if scored is None:
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
        a = sh.select(F.col("doc_id").alias("doc_a"), "__h")
        b = sh.select(F.col("doc_id").alias("doc_b"), "__h")
        inter = (
            a.join(b, "__h")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("intersection_size"))
        )
        sa = sizes.select(
            F.col("doc_id").alias("doc_a"), F.col("sz").alias("size_a")
        )
        sb = sizes.select(
            F.col("doc_id").alias("doc_b"), F.col("sz").alias("size_b")
        )
        scored = inter.join(sa, "doc_a").join(sb, "doc_b")
    j = F.col("intersection_size").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("intersection_size")
    )
    return scored.filter(j >= threshold).select(
        "doc_a", "doc_b", "intersection_size", "size_a", "size_b",
        j.alias("jaccard"),
    )


MINHASH_SIG_COLS = ["doc_id", "sz"] + [f"mh_{i}" for i in range(N_PERMS)]


def minhash_sig_table(sh: DataFrame) -> DataFrame:
    """(doc_id, sz, mh_0..mh_{N_PERMS-1}) MinHash signature table off the
    hashed shingle index — the shared asset of the whole MinHash family
    (pair finder, band-load profile, tuning curve, recall report input),
    memoized per corpus snapshot by the registry (``_minhash_sigs_for``)
    exactly like the SimHash signature memo, so a session running
    several family members pays the 32-min-aggregate groupBy once.

    Each permutation re-hashes the fixed-width shingle hash with a seed
    — far cheaper than N_PERMS string hashes, and overflow-free under
    ANSI mode (an affine a*h+b permutation family would throw on long
    overflow there). ``sz`` (the doc's distinct-shingle count) rides
    along in the same pass for the verification stage's Jaccard
    denominator.

    The input shingle table's (k, text_col) provenance metadata is
    propagated onto ``sz`` so downstream ``sigs=`` consumers enforce
    the same loud-failure contract as the shingle family — candidates
    from k=5 signatures verified against k=3 shingles would otherwise
    return silently wrong pairs.
    """
    meta = dict(sh.schema["__h"].metadata or {})
    aggs = [F.count(F.lit(1)).alias("sz", metadata=meta)] + [
        F.min(F.xxhash64(F.lit(i), F.col("__h"))).alias(f"mh_{i}")
        for i in range(N_PERMS)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _require_sig_table(
    sigs: DataFrame, text_col: str, k: int, caller: str
) -> None:
    """Shape always enforced; (k, text_col) provenance enforced when the
    table carries minhash_sig_table's propagated metadata tag (same
    contract as :func:`_require_shingle_table`)."""
    missing = set(MINHASH_SIG_COLS) - set(sigs.columns)
    if missing:
        raise ValueError(
            f"{caller}: precomputed signature table lacks column(s) "
            f"{sorted(missing)}; expected minhash_sig_table output"
        )
    meta = sigs.schema["sz"].metadata or {}
    got_k = meta.get("shingle_k")
    got_col = meta.get("shingle_text_col")
    if got_k is not None and int(got_k) != k:
        raise ValueError(
            f"{caller}: precomputed signature table was built over k="
            f"{got_k} shingles, but the call requests k={k}"
        )
    if got_col is not None and got_col != text_col:
        raise ValueError(
            f"{caller}: precomputed signature table was built over "
            f"text_col={got_col!r}, but the call requests "
            f"text_col={text_col!r}"
        )


def _band_explode():
    """Explode column turning mh_0..mh_{N_PERMS-1} signature columns into
    N_BANDS (band, band_hash) structs — the single banding definition the
    pair finder and the band-load profile share (same band hash ⇒ the
    profile's bucket counts describe exactly the joins the finder runs).
    """
    rows_per_band = N_PERMS // N_BANDS
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        *[
                            F.col(f"mh_{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ]
                    ).alias("band_hash"),
                )
                for b in range(N_BANDS)
            ]
        )
    ).alias("bh")


def lsh_band_load_profile(
    documents: DataFrame,
    text_col: str = "text",
    k: int = 3,
    sh: DataFrame | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """LSH bucket-load histogram: per band, how many buckets hold how
    many docs, and the candidate-pair volume those buckets imply
    (n_buckets × C(size, 2)) — the pre-flight skew read a production
    near-dup run does before paying for the candidate join. A template-
    heavy corpus shows up here as a fat bucket whose implied pair count
    dwarfs the rest; that is the signal to strip boilerplate (see
    boilerplate_phrase_profile) or re-band BEFORE the join blows up —
    the band-bucket twin of key_skew_profile.

    Scale posture: signatures are one groupBy over the shared shingle
    index; the profile is two more aggregations on (band, band_hash)
    grain — output is a histogram (bands × distinct sizes), never
    corpus-sized, and nothing here joins.
    """
    if sigs is None:
        if sh is None:
            sh = hashed_shingles(documents, text_col, k)
        else:
            _require_shingle_table(sh, text_col, k, "lsh_band_load_profile")
        sigs = minhash_sig_table(sh)
    else:
        _require_sig_table(sigs, text_col, k, "lsh_band_load_profile")
    bands = sigs.select("doc_id", _band_explode()).select(
        "bh.band", "bh.band_hash"
    )
    loads = bands.groupBy("band", "band_hash").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    sz = F.col("bucket_size")
    return (
        loads.groupBy("band", "bucket_size")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .select(
            "band",
            "bucket_size",
            "n_buckets",
            (F.col("n_buckets") * sz * (sz - 1) / 2)
            .cast("long")
            .alias("candidate_pairs"),
        )
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    threshold: float,
    text_col: str = "text",
    k: int = 3,
    sh: DataFrame | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, exact-Jaccard-verified.

    Output schema matches ``ngram_jaccard_pairs``; the difference is the
    candidate set (LSH buckets vs full shingle join) — at 100 TB only this
    path is viable.

    The hashed-shingle table (doc_id, xxhash64(shingle)) is computed once
    and persisted: it feeds the signature groupBy and both sides of the
    verification join, and the round-2 executed plan proved Spark does NOT
    reuse the explode+dedup exchange across those consumers (0
    ReusedExchange; 3-5 recomputes, 2x wall-time variance). Shingle sizes
    ride along in the signature groupBy instead of a separate pass, and
    verification intersects 8-byte hashes rather than shingle strings —
    a 64-bit collision would off-by-one an intersection count with
    probability ~n²/2⁶⁴ per doc pair, which the banded-candidate volume
    keeps negligible.

    ``sh``/``sigs`` let the registry hand in its memoized shingle index
    and signature table (same contract as ngram_jaccard_pairs' ``sh=``)
    instead of this operator persisting a second copy of each.
    """
    if sh is None:
        sh = _swap_cache("minhash", hashed_shingles(documents, text_col, k))
    else:
        _require_shingle_table(sh, text_col, k, "minhash_lsh_pairs")
    if sigs is None:
        sigs = minhash_sig_table(sh)
    else:
        _require_sig_table(sigs, text_col, k, "minhash_lsh_pairs")
    bands = sigs.select("doc_id", "sz", _band_explode()).select(
        "doc_id", "sz", "bh.band", "bh.band_hash"
    )

    left = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sz").alias("size_a"),
        "band",
        "band_hash",
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sz").alias("size_b"),
        "band",
        "band_hash",
    )
    candidates = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "size_a", "size_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )

    # Exact verification restricted to candidates only.
    a = sh.select(F.col("doc_id").alias("doc_a"), "__h")
    b = sh.select(F.col("doc_id").alias("doc_b"), "__h")
    inter = (
        candidates.join(a, "doc_a")
        .join(b, ["doc_b", "__h"])
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("intersection_size"))
    )
    j = F.col("intersection_size").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("intersection_size")
    )
    return (
        inter.filter(j >= threshold)
        .select(
            "doc_a", "doc_b", "intersection_size", "size_a", "size_b",
            j.alias("jaccard"),
        )
    )


#: 16-bit lanes per packed sign-sum aggregate (see simhash_signatures).
_SIMHASH_LANES = 4


def _simhash_lane_sum(h, j: int):
    """Packed 4-lane contribution of one shingle hash to counter ``j``:
    lane k of counter j counts the set bit at position 4j + k, shifted to
    bit 16k. Lanes never carry into each other while per-doc shingle
    counts stay under 2^16 (guaranteed by orders of magnitude at the doc
    grain)."""
    expr = None
    for kk in range(_SIMHASH_LANES):
        bit = j * _SIMHASH_LANES + kk
        lane = F.shiftleft(
            F.shiftrightunsigned(h, bit).bitwiseAND(F.lit(1)).cast("long"),
            16 * kk,
        )
        expr = lane if expr is None else expr + lane
    return expr


def _simhash_ones(j_col, i: int):
    """Extract bit-position ``i``'s counter from its packed lane column."""
    return F.shiftrightunsigned(
        j_col, 16 * (i % _SIMHASH_LANES)
    ).bitwiseAND(F.lit(65535))


def _simhash_from_packed(n_col, p_col):
    """64-bit signature from n_shingles + 16 packed counters: bit i set
    iff 2·ones(i) > n — exactly the sign-sum > 0 rule (ones − (n − ones)
    > 0), ties unset."""
    return sum(
        [
            F.when(
                _simhash_ones(p_col(i // _SIMHASH_LANES), i) * 2 > n_col,
                F.shiftleft(F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long"))
            for i in range(64)
        ],
        F.lit(0).cast("long"),
    )


def simhash_signatures(h: DataFrame) -> DataFrame:
    """(doc_id, simhash) 64-bit signatures from a hashed-shingle table
    ``(doc_id, th)``.

    Packs the 64 per-bit sign counters into 16 SUM aggregates, 4 × 16-bit
    lanes each (see :func:`_simhash_lane_sum`) — one long addition
    advances four counters, quartering the aggregation-buffer width (the
    cost driver for a 64-aggregate groupBy) without leaving whole-stage
    codegen.
    """
    pack_aggs = [
        F.sum(_simhash_lane_sum(F.col("th"), j)).alias(f"p_{j}")
        for j in range(64 // _SIMHASH_LANES)
    ]
    bits = h.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__n"), *pack_aggs
    )
    return bits.select(
        "doc_id",
        _simhash_from_packed(
            F.col("__n"), lambda j: F.col(f"p_{j}")
        ).alias("simhash"),
    )


def with_simhash(
    df: DataFrame, text_col: str = "text", out_col: str = "simhash", k: int = 3
) -> DataFrame:
    """Append a ROW-LOCAL 64-bit SimHash column — bit-identical to
    :func:`simhash_signatures` over :func:`hashed_shingles` (asserted in
    tests/test_neardup.py), but computed entirely inside one row via
    array expressions: tokenize → distinct word-k-grams → xxhash64 each →
    16 packed ``F.aggregate`` sign-sum folds → majority-vote bits.

    This is the streaming-safe form: no explode, no groupBy, no shuffle —
    it composes onto an unbounded stream as a stateless projection
    (streaming/curation.near_dedup_docs builds its band keys from it).
    Batch consumers should prefer the aggregated form, whose shuffle
    doubles as the shared materialization point of the near-dup family.

    Docs with fewer than ``k`` words have no shingles and get NULL (the
    aggregated form simply has no row for them — same "no signature"
    semantics).
    """
    w = F.split(F.col(text_col), " ")
    idx = F.when(
        F.array_size(w) >= k, F.sequence(F.lit(1), F.array_size(w) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingle_arr = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(k)]
            ),
        )
    )
    hashes = F.transform(shingle_arr, lambda s: F.xxhash64(s))
    tmp_h = f"__{out_col}_h"
    tmp_p = [f"__{out_col}_p{j}" for j in range(64 // _SIMHASH_LANES)]
    # Two-step select so the 16 packed fold columns are evaluated ONCE per
    # row and the 64 majority votes read them as plain columns — inlining
    # the folds into the vote expression would re-run each O(shingles)
    # aggregate up to 16 times per row.
    def _fold(j: int):
        # closure factory (NOT a default arg: PySpark counts lambda
        # params, and a bound default would read as a third lambda var)
        return lambda acc, h: acc + _simhash_lane_sum(h, j)

    packed = df.withColumn(tmp_h, hashes).select(
        "*",
        *[
            F.aggregate(
                F.col(tmp_h), F.lit(0).cast("long"), _fold(j)
            ).alias(tmp_p[j])
            for j in range(64 // _SIMHASH_LANES)
        ],
    )
    n = F.array_size(F.col(tmp_h))
    sig = F.when(
        n >= 1,
        _simhash_from_packed(n, lambda j: F.col(tmp_p[j])),
    )
    return packed.withColumn(out_col, sig).drop(tmp_h, *tmp_p)


def simhash_pairs(
    documents: DataFrame,
    max_hamming: int = 6,
    text_col: str = "text",
    sh: DataFrame | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash hamming distance.

    Signature: sign-sum of hash bits over distinct word-3-gram shingles
    (unigram features degenerate when the vocabulary is small — most docs
    would share most tokens). Banding on 8 disjoint bytes finds every pair
    with hamming ≤ 7 exactly (pigeonhole); candidates are verified with
    bit_count(xor). Pass ``sh`` (a hashed_shingles table, e.g. the
    registry's fingerprint memo shared with the Jaccard family — the
    feature hash is the same xxhash64 over the same k=3 shingles) to
    skip the shingle build, or ``sig`` (a precomputed ``(doc_id,
    simhash)`` signature table, e.g. the registry's per-snapshot
    signature memo shared with the streaming twin) to skip the signature
    aggregation entirely — ``sig`` wins when both are given.
    """
    if sig is None:
        if sh is not None:
            _require_shingle_table(sh, text_col, 3, "simhash_pairs")
            h = sh.select("doc_id", F.col("__h").alias("th"))
        else:
            h = hashed_shingles(documents, text_col, k=3).select(
                "doc_id", F.col("__h").alias("th")
            )
        # Persisted: the candidate join consumes this twice (left/right),
        # and without the persist each side recomputes the whole shingle
        # explode + 16-aggregate groupBy (no ReusedExchange in the
        # executed plan). The table is 16 bytes/doc — trivially cacheable
        # at any scale. (A caller-supplied ``sig`` is expected to arrive
        # already persisted — the registry memo does.)
        sig = _swap_cache("simhash", simhash_signatures(h))
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 8)
                        .bitwiseAND(F.lit(255))
                        .alias("chunk_val"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("cv"),
    ).select("doc_id", "simhash", "cv.chunk", "cv.chunk_val")

    left = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"),
        "chunk", "chunk_val",
    )
    right = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"),
        "chunk", "chunk_val",
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    # Hamming-verify BEFORE the pair distinct: verification is a row-local
    # expression (bit_count of xor), so running it on the raw band join
    # costs nothing extra per row, while the distinct's shuffle then only
    # carries pairs that already passed — by far the smaller set, since
    # band candidates are dominated by chance single-byte collisions.
    # Semantically identical: every chunk-copy of a pair carries the same
    # signatures, hence the same hamming verdict.
    return (
        left.join(right, ["chunk", "chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(ham <= max_hamming)
        .select("doc_a", "doc_b", ham.alias("hamming_distance"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def incremental_neardup_check(
    corpus: DataFrame,
    incoming: DataFrame,
    threshold: float,
    text_col: str = "text",
    k: int = 3,
    sh_corpus: DataFrame | None = None,
    sh_incoming: DataFrame | None = None,
    df_cap: int | None = None,
    corpus_bloom: list[int] | None = None,
    bloom_bits: int | None = None,
    guard_stats: tuple[int, int, bool] | None = None,
) -> DataFrame:
    """Check INCOMING docs against an EXISTING corpus (daily-increment
    dedup: the batch flow of "is today's crawl already in the training
    set").

    Exact shingle-Jaccard via the asymmetric inverted-index join — new
    docs only probe; the corpus side carries the index. One row per
    incoming doc: its best corpus match (highest jaccard, ties to the
    smallest corpus doc id) or nulls when nothing clears the threshold.

    Intersections join on xxhash64(shingle) — same 8-byte-key trade as
    ngram_jaccard_pairs. At 100 TB the corpus shingle side is the big
    one and is exactly what you'd persist as a reusable index between
    daily runs (the _swap_cache slot does that within a session).

    NOTE: constructing the plan runs ONE bounded Spark job (the
    hot-shingle guard's stats probe over the corpus index, skipped when
    ``threshold <= 0`` or when the caller injects ``guard_stats`` — the
    :func:`probe_guard_stats` verdict for the SAME corpus-side index,
    e.g. the registry's per-snapshot memo); see
    :func:`ngram_jaccard_pairs`.
    """
    from pyspark.sql import Window

    if sh_corpus is not None:
        # precomputed hashed_shingles slices (e.g. filters of the
        # registry's fingerprint memo) — already persisted upstream
        _require_shingle_table(
            sh_corpus, text_col, k, "incremental_neardup_check(sh_corpus)"
        )
        sh_old = sh_corpus.select(
            F.col("doc_id").alias("corpus_id"), "__h"
        )
    else:
        sh_old = _swap_cache(
            "incremental_index",
            shingles(corpus, text_col, k).select(
                F.col("doc_id").alias("corpus_id"),
                F.xxhash64("shingle").alias("__h"),
            ),
        )
    # Persisted like the corpus side: sizes and the probe join both
    # consume it, and Spark does not reuse the explode+dedup exchange
    # across consumers (the module-wide 0-ReusedExchange finding).
    if sh_incoming is not None:
        _require_shingle_table(
            sh_incoming, text_col, k, "incremental_neardup_check(sh_incoming)"
        )
        sh_new = sh_incoming.select("doc_id", "__h")
    else:
        sh_new = _swap_cache(
            "incremental_incoming",
            shingles(incoming, text_col, k).select(
                F.col("doc_id"), F.xxhash64("shingle").alias("__h")
            ),
        )
    sz_old = sh_old.groupBy("corpus_id").agg(F.count(F.lit(1)).alias("__szo"))
    sz_new = sh_new.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__szn"))
    # Exactness-preserving Bloom prefilter on the PROBE side: incoming
    # shingles whose hash is provably absent from the corpus index never
    # reach the inverted-index join. No false negatives by construction
    # (operators/bloom.py), so every probe row that could match survives
    # and candidates re-score identically — pytest-proven equal to the
    # unfiltered plan on an adversarial corpus (tests/test_neardup.py).
    # False positives only cost join input. Sizes (sz_new) deliberately
    # come from the UNfiltered incoming shingles — they are part of the
    # Jaccard denominator, not candidate generation. Pass a prebuilt
    # ``corpus_bloom`` bitmap (the registry memoizes one per corpus
    # snapshot) or ``bloom_bits`` to build it here (one bounded job:
    # partial-aggregated bit_or, O(n_bits/64) collect).
    if corpus_bloom is None and bloom_bits:
        from .bloom import build_bloom

        corpus_bloom = build_bloom(sh_old, "__h", bloom_bits)
    if corpus_bloom is not None:
        from .bloom import apply_bloom

        sh_probe = apply_bloom(sh_new, "__h", corpus_bloom)
    else:
        sh_probe = sh_new
    # Hot-shingle guard, asymmetric form: cap on the CORPUS index's
    # document frequencies (the big side). Probe shingles that hit a
    # hot corpus shingle are dropped from candidate generation unless
    # the incoming doc is small (szn <= n_hot/threshold): a pair whose
    # overlap is hot-only has intersection <= n_hot, so j >= threshold
    # forces szn <= n_hot/threshold — the exempt doc keeps its hot
    # probes and the pair survives. Candidates are re-scored over the
    # full indexes, so output is identical for any cap (the
    # _df_guard_pair_table exactness argument, one-sided). threshold<=0
    # skips the guard — and its stats job — entirely (exempt_sz would be
    # undefined; the naive probe join below accepts it without crashing).
    if threshold > 0:
        if guard_stats is None:
            df_old_tab, cap, n_hot_ub, fires = _df_guard_stats(
                sh_old, sz_old, df_cap
            )
        else:
            # injected standing-index verdict: skip the stats job; the
            # df table is declared lazily and only executes when the
            # guard fires (inside _df_guard_probe's collect).
            cap, n_hot_ub, fires = guard_stats
            df_old_tab = sh_old.groupBy("__h").agg(
                F.count(F.lit(1)).alias("__df")
            )
    else:
        fires, n_hot_ub = False, 0
    if fires and n_hot_ub <= _HOT_LIST_MAX:
        exempt_sz = n_hot_ub / threshold
        hot_hashes, n_exempt = _df_guard_probe(
            df_old_tab, sz_new, "__szn", cap, exempt_sz
        )
        is_hot = F.col("__h").isin(hot_hashes)
        cold_new, hot_new = sh_probe.filter(~is_hot), sh_probe.filter(is_hot)
        cold_old, hot_old = sh_old.filter(~is_hot), sh_old.filter(is_hot)
        # cold part: the plain probe join, hot buckets excluded
        cold_inter = (
            cold_new.join(cold_old, "__h")
            .groupBy("doc_id", "corpus_id")
            .agg(F.count(F.lit(1)).alias("__cold"))
        )
        if n_exempt > 0:
            # hot-only pairs: only small (exempt) incoming docs can
            # clear the threshold on hot shingles alone
            exempt_docs = sz_new.filter(
                F.col("__szn") <= F.lit(exempt_sz)
            ).select("doc_id")
            hot_only = (
                hot_new.join(F.broadcast(exempt_docs), "doc_id")
                .join(hot_old, "__h")
                .select("doc_id", "corpus_id")
                .dropDuplicates(["doc_id", "corpus_id"])
            )
            base = (
                cold_inter.select("doc_id", "corpus_id")
                .unionByName(hot_only)
                .dropDuplicates(["doc_id", "corpus_id"])
                .join(cold_inter, ["doc_id", "corpus_id"], "left")
            )
        else:
            base = cold_inter
        # hot part at PAIR grain via per-doc hot sets (≤ |HOT| elements)
        hs_new = hot_new.groupBy("doc_id").agg(
            F.collect_set("__h").alias("__hsn")
        )
        hs_old = hot_old.groupBy("corpus_id").agg(
            F.collect_set("__h").alias("__hso")
        )
        empty = F.array().cast("array<bigint>")
        hot_shared = F.array_size(
            F.array_intersect(
                F.coalesce(F.col("__hsn"), empty),
                F.coalesce(F.col("__hso"), empty),
            )
        )
        inter = (
            base.join(hs_new, "doc_id", "left")
            .join(hs_old, "corpus_id", "left")
            .select(
                "doc_id",
                "corpus_id",
                (
                    F.coalesce(F.col("__cold"), F.lit(0).cast("long"))
                    + hot_shared.cast("long")
                ).alias("__i"),
            )
        )
    else:
        inter = (
            sh_probe.join(sh_old, "__h")
            .groupBy("doc_id", "corpus_id")
            .agg(F.count(F.lit(1)).alias("__i"))
        )
    j = F.col("__i").cast("double") / (
        F.col("__szn") + F.col("__szo") - F.col("__i")
    )
    scored = (
        inter.join(sz_new, "doc_id")
        .join(sz_old, "corpus_id")
        .withColumn("__j", j)
        .filter(F.col("__j") >= threshold)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("__j").desc(), F.col("corpus_id")
    )
    best = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            "doc_id",
            F.col("corpus_id").alias("best_match_id"),
            F.round(F.col("__j"), 6).alias("best_jaccard"),
        )
    )
    return (
        incoming.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            "best_match_id",
            "best_jaccard",
            F.col("best_match_id").isNotNull().alias("is_duplicate"),
        )
    )


def substring_dup_profile(
    documents: DataFrame,
    window: int = 40,
    stride: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Per-doc exact-substring duplication profile via rolling windows.

    The windowed form of suffix-array substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): a
    suffix array over 100 TB is impractical, but sliding fixed-width
    character windows at a stride and flagging window CONTENT that occurs
    more than once anywhere in the corpus finds the same long verbatim
    repeats (any duplicated span of length >= window + stride - 1 is
    guaranteed to contain a flagged window). Reference parity: the repo's
    dedup sweep deletes whole duplicate rows
    (snowflake_bq_deduplication_sync.py:214); this measures sub-document
    duplication so a curation pass can cut spans instead of whole docs.

    Output per doc (docs shorter than ``window`` carry zero windows and
    are excluded): n_windows, n_dup_windows, dup_chars (union length of
    flagged [start, start+window-1] intervals — overlapping windows are
    merged with one gaps-and-islands pass), dup_char_share.

    Scale posture: window extraction is a row-local explode (no shuffle);
    dup marking is one groupBy on the md5 window key (constant-width,
    map-side combined) plus an equi-join back — never all-pairs; the
    island merge partitions by doc_id. Shuffled rows are (hash, start)
    pairs, ~len/stride per doc, not document text.
    """
    from pyspark.sql import Window

    w_len = F.length(F.col(text_col))
    from ..catalog import fan_out

    wins = _swap_cache(
        "substr_windows",
        fan_out(documents.filter(w_len >= window))
        .select(
            "doc_id",
            w_len.alias("__len"),
            F.explode(
                F.sequence(F.lit(1), w_len - window + 1, F.lit(stride))
            ).alias("start"),
            F.col(text_col),
        )
        .select(
            "doc_id",
            "__len",
            "start",
            (F.col("start") + window - 1).alias("end"),
            F.md5(
                F.substring(F.col(text_col), F.col("start"), window).cast(
                    "binary"
                )
            ).alias("__h"),
        ),
    )
    dup_hashes = (
        wins.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .select("__h")
    )
    dup = wins.join(dup_hashes, "__h").select("doc_id", "start", "end")
    w_doc = Window.partitionBy("doc_id").orderBy("start")
    prev_max_end = F.max("end").over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        dup.withColumn(
            "__new",
            (F.col("start") > F.coalesce(prev_max_end, F.lit(-1))).cast("long"),
        )
        .withColumn("__isl", F.sum("__new").over(w_doc))
        .groupBy("doc_id", "__isl")
        .agg((F.max("end") - F.min("start") + 1).alias("__cov"))
        .groupBy("doc_id")
        .agg(
            F.sum("__cov").alias("dup_chars"),
        )
    )
    dup_counts = dup.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_windows")
    )
    base = wins.groupBy("doc_id", "__len").agg(
        F.count(F.lit(1)).alias("n_windows")
    )
    return (
        base.join(dup_counts, "doc_id", "left")
        .join(islands, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            F.coalesce(F.col("n_dup_windows"), F.lit(0).cast("long")).alias(
                "n_dup_windows"
            ),
            F.coalesce(F.col("dup_chars"), F.lit(0).cast("long")).alias(
                "dup_chars"
            ),
            (
                F.coalesce(F.col("dup_chars"), F.lit(0).cast("long"))
                .cast("double")
                / F.col("__len").cast("double")
            ).alias("dup_char_share"),
        )
    )


def ngram_containment_pairs(
    documents: DataFrame,
    threshold: float,
    text_col: str = "text",
    k: int = 3,
    sh: DataFrame | None = None,
    df_cap: int | None = None,
    guard_stats: tuple[int, int, bool] | None = None,
) -> DataFrame:
    """Pairs where one doc's shingle set is largely CONTAINED in the
    other's: max(|A∩B|/|A|, |A∩B|/|B|) ≥ threshold.

    The asymmetric complement of :func:`ngram_jaccard_pairs` — a short
    document quoted inside a long one scores near-zero Jaccard (the union
    is dominated by the long side) but containment ≈ 1 on the short side,
    which is exactly the quotation/subset-dup case corpus dedup cares
    about (cf. the containment measure of Broder 1997, "On the
    resemblance and containment of documents").

    Same physical shape as the Jaccard op (and the same shared shingle
    persist): hashed-shingle equi-join for intersections, two reduced-side
    size joins, row-local arithmetic — no cross product. Pass ``sh`` (a
    hashed_shingles table, e.g. the registry's fingerprint memo) to skip
    the shingle build.

    NOTE: constructing the plan runs ONE bounded Spark job (the
    hot-shingle guard's stats probe), skippable via ``guard_stats``;
    see :func:`ngram_jaccard_pairs`.
    """
    if sh is None:
        sh = _swap_cache("jaccard", hashed_shingles(documents, text_col, k))
    else:
        _require_shingle_table(sh, text_col, k, "ngram_containment_pairs")
    scored = _df_guard_pair_table(sh, threshold, df_cap, guard_stats)
    if scored is None:
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
        a = sh.select(F.col("doc_id").alias("doc_a"), "__h")
        b = sh.select(F.col("doc_id").alias("doc_b"), "__h")
        inter = (
            a.join(b, "__h")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("intersection_size"))
        )
        sa = sizes.select(
            F.col("doc_id").alias("doc_a"), F.col("sz").alias("size_a")
        )
        sb = sizes.select(
            F.col("doc_id").alias("doc_b"), F.col("sz").alias("size_b")
        )
        scored = inter.join(sa, "doc_a").join(sb, "doc_b")
    c_a = F.col("intersection_size").cast("double") / F.col("size_a").cast("double")
    c_b = F.col("intersection_size").cast("double") / F.col("size_b").cast("double")
    return scored.filter(F.greatest(c_a, c_b) >= threshold).select(
        "doc_a", "doc_b", "intersection_size", "size_a", "size_b",
        F.round(c_a, 6).alias("containment_a"),
        F.round(c_b, 6).alias("containment_b"),
    )


def doc_novelty(
    documents: DataFrame,
    text_col: str = "text",
    k: int = 3,
    sh: DataFrame | None = None,
) -> DataFrame:
    """Per-document novelty: the share of a doc's shingles that FIRST
    appear in that doc (first occurrence = smallest doc_id carrying the
    shingle) — the dedup-aware growth accounting view: a crawl snapshot
    whose novelty collapses toward zero is re-collecting what the corpus
    already has, regardless of whether any single pair clears a dup
    threshold.

    Same hashed-shingle table (and shared persist) as the Jaccard ops;
    first-occurrence attribution is one groupBy(shingle) MIN plus a join
    back — shuffles fixed 8-byte keys, never text. The 64-bit collision
    trade matches ngram_jaccard_pairs (collision probability
    ~distinct²/2⁶⁴ against the string-exact oracle). Pass ``sh`` (a
    hashed_shingles table, e.g. the registry's fingerprint memo) to skip
    the shingle build.
    """
    if sh is None:
        sh = _swap_cache("jaccard", hashed_shingles(documents, text_col, k))
    else:
        _require_shingle_table(sh, text_col, k, "doc_novelty")
    first = sh.groupBy("__h").agg(F.min("doc_id").alias("__first"))
    return (
        sh.join(first, "__h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("__first") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double")
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("novelty_share"),
        )
    )


def minhash_recall_report(
    exact_pairs: DataFrame,
    approx_pairs: DataFrame,
) -> DataFrame:
    """Dedup-QA report: recall/precision of the MinHash+LSH pair path
    against the exact shingle-Jaccard ground truth, as ONE auditable row
    — the number a pipeline operator watches before trusting the scale
    path (exact is the oracle only at validation scale; in production
    this runs on a sampled slice).

    Because LSH candidates are exact-verified downstream, precision is 1
    by construction — the report measures it anyway (an engine regression
    that broke verification would surface here first). Recall < 1 means
    banding missed true pairs (tune bands/rows).

    Takes the two MATERIALIZED pair tables (the registry memoizes both —
    recomputing them here would silently double the dedup work it
    audits); the comparison is one join on the (doc_a, doc_b) key folded
    to one aggregate row. Exact integer counts; ratios divide once,
    round 6.
    """
    exact = exact_pairs.select("doc_a", "doc_b")
    approx = approx_pairs.select("doc_a", "doc_b")
    common = exact.join(approx, ["doc_a", "doc_b"]).select("doc_a")
    counts = (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(approx.agg(F.count(F.lit(1)).alias("n_approx")))
        .crossJoin(common.agg(F.count(F.lit(1)).alias("n_common")))
    )
    safe = lambda num, den: F.when(
        F.col(den) > 0,
        F.round(F.col(num).cast("double") / F.col(den).cast("double"), 6),
    ).otherwise(F.lit(1.0))
    return counts.select(
        "n_exact",
        "n_approx",
        "n_common",
        safe("n_common", "n_exact").alias("recall"),
        safe("n_common", "n_approx").alias("precision"),
    )


def source_ngram_overlap(
    documents: DataFrame,
    text_col: str = "text",
    k: int = 3,
    sh: DataFrame | None = None,
) -> DataFrame:
    """Source-pair shingle-overlap matrix: for every pair of sources,
    the count of distinct word-k-gram shingles they share plus the
    source-level Jaccard — the corpus-curation view that surfaces
    mirrored / scraped-twice feeds BEFORE per-doc pair finding (the
    reference compares feeds only by row counts; fallback_monitor.py).

    Scale posture: ONE corpus-scale shuffle. ``groupBy(__h)`` with a
    ``collect_set(source)`` partial aggregate collapses the joined
    shingle rows straight to per-shingle source sets — each bounded by
    |sources|, so no set (and no task) can blow up on a boilerplate
    shingle — and every downstream row count is O(vocab × |sources|²)
    at worst: pair rows explode from the sorted set (C(s, 2) per
    shingle), per-source sizes explode 1 row per member. The self-join
    alternative (distinct (source, __h) then equi-join on __h) computes
    the same matrix with three corpus-scale shuffles; measured 1.74s →
    this plan at sf0.1 replaces them with this single aggregate.
    """
    if sh is None:
        sh = hashed_shingles(documents, text_col, k)
    else:
        _require_shingle_table(sh, text_col, k, "source_ngram_overlap")
    src = documents.select("doc_id", "source")
    per_h = (
        sh.join(src, "doc_id")
        .groupBy("__h")
        .agg(F.sort_array(F.collect_set("source")).alias("__srcs"))
    )
    a = F.col("__srcs")
    pairs = F.flatten(
        F.transform(
            a,
            lambda x, i: F.transform(
                F.slice(a, i + 2, F.size(a)),
                lambda y: F.struct(
                    x.alias("source_a"), y.alias("source_b")
                ),
            ),
        )
    )
    # TWO consumer passes over per_h (r15 revert of the r14 one-pass
    # fold): the r14 shape rode pair structs and singleton structs
    # through ONE explode + groupBy + a persisted counts split, so the
    # corpus-scale collect_set aggregate executed once — but an
    # interleaved same-session A/B at sf0.1 (6 reps each, identical
    # output) measured the fold consistently SLOWER (one-pass best
    # 1.62s / median ~2.0 vs two-pass best 1.27s / median ~1.4): the
    # concat-explode + persist layer costs more than re-running the
    # join+aggregate over the already-persisted shingle memo, and the
    # r14 bench's same-day regression on this query
    # ([8.76, 5.85, 3.88] reps) was adjudicated REAL, not VM noise.
    # Scale note: at 100 TB, re-deriving per_h twice from a NON-cached
    # shingle table would be the wrong trade — there the right shape is
    # this one with per_h persisted (a one-line change at the seam
    # below); at bench scale the persist itself measured slower (r14
    # note: cache write + pre-AQE layout pinning).
    inter = (
        per_h.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.source_a"), F.col("p.source_b"))
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )
    sizes = (
        per_h.select(F.explode(a).alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    shared = F.col("shared_shingles")
    union_sz = F.col("size_a") + F.col("size_b") - shared
    return (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_a"), F.col("sz").alias("size_a")
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_b"), F.col("sz").alias("size_b")
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared_shingles",
            "size_a",
            "size_b",
            F.round(shared.cast("double") / union_sz, 6).alias("jaccard"),
        )
    )


def pair_similarity_histogram(
    pairs: DataFrame, n_bins_per_unit: int = 20
) -> DataFrame:
    """Similarity histogram over the verified near-dup pair table — the
    measurement behind the "pick the plan by the similarity regime"
    rule (README): if the pair mass piles up just above the threshold,
    the threshold sits in the BULK of the similarity distribution and
    LSH candidates stop pruning (candidates ≈ all pairs — switch to the
    structured exact scan); a mass concentrated near 1.0 is the sparse
    regime where banding wins. One aggregate over the already-tiny pair
    table; the share column is a window over histogram rows (≤ bins).
    """
    b = F.floor(F.col("jaccard") * n_bins_per_unit).cast("long")
    h = pairs.groupBy(b.alias("bucket_idx")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    from pyspark.sql import Window

    total = F.sum("n_pairs").over(Window.partitionBy())
    return h.select(
        "bucket_idx",
        F.round(
            F.col("bucket_idx") / F.lit(float(n_bins_per_unit)), 6
        ).alias("bucket_lo"),
        "n_pairs",
        F.round(F.col("n_pairs").cast("double") / total, 6).alias(
            "pair_share"
        ),
    )


def lsh_band_tuning_curve(
    documents: DataFrame,
    text_col: str = "text",
    k: int = 3,
    sh: DataFrame | None = None,
    sigs: DataFrame | None = None,
    band_counts: tuple[int, ...] = (4, 8, 16, 32),
) -> DataFrame:
    """LSH parameter-tuning table: for each banding of the SAME
    ``N_PERMS`` MinHash signature (b bands × r = N_PERMS/b rows), the
    theoretical S-curve midpoint ``(1/b)^(1/r)`` next to the MEASURED
    candidate volume on this corpus — the one-look answer to "which
    (b, r) do I run dedup_minhash_lsh with here". Configs nest (each
    b=4 band is two b=8 bands, …), so candidate rows are provably
    nondecreasing in b; the production choice is the smallest b whose
    S-curve midpoint sits at or below the dedup threshold.

    One explode of Σb per-config band structs off one signature
    groupBy, then counters on (config, band, hash) grain — bucket
    counts, never pair enumeration, so the measurement costs the same
    whether the corpus would generate 10 or 10^9 candidates.
    """
    for b in band_counts:
        if N_PERMS % b != 0:
            raise ValueError(f"band count {b} does not divide {N_PERMS}")
    if sigs is None:
        if sh is None:
            sh = hashed_shingles(documents, text_col, k)
        else:
            _require_shingle_table(sh, text_col, k, "lsh_band_tuning_curve")
        sigs = minhash_sig_table(sh)
    else:
        _require_sig_table(sigs, text_col, k, "lsh_band_tuning_curve")
    # One SQL string instead of Σb Column-object structs: building the
    # 60-struct tree through per-call F.struct/F.col py4j round trips
    # measured ~0.8s of pure driver-side plan-CONSTRUCT time at warm
    # steady state (r14 construct/exec sweep); a single parsed
    # expression is one round trip for the identical expression tree.
    struct_sql = ", ".join(
        "named_struct('n_bands', {b}, 'band', {band}, 'band_hash', "
        "xxhash64({cols}))".format(
            b=b,
            band=band,
            cols=", ".join(
                f"mh_{band * (N_PERMS // b) + i}"
                for i in range(N_PERMS // b)
            ),
        )
        for b in band_counts
        for band in range(b)
    )
    cells = sigs.selectExpr(f"explode(array({struct_sql})) AS c")
    loads = cells.groupBy("c.n_bands", "c.band", "c.band_hash").agg(
        F.count(F.lit(1)).alias("sz")
    )
    sz = F.col("sz")
    # Every doc lands in exactly one bucket per band, so each config's
    # bucket-size sum is n_docs × n_bands — n_docs falls out of the
    # aggregate for free (no extra signature-pipeline pass just to
    # count docs).
    per_cfg = loads.groupBy("n_bands").agg(
        F.sum(sz * (sz - 1) / 2).cast("long").alias("candidate_pair_rows"),
        F.sum(F.when(sz > 1, 1).otherwise(0)).alias("n_colliding_buckets"),
        (F.sum(sz) / F.col("n_bands")).cast("long").alias("__n_docs"),
    )
    nd = F.col("__n_docs")
    all_pairs = (nd * (nd - 1) / 2).cast("double")
    rows_per_band = (F.lit(N_PERMS) / F.col("n_bands")).cast("long")
    s_curve = F.pow(
        F.lit(1.0) / F.col("n_bands"),
        F.lit(1.0) / rows_per_band.cast("double"),
    )
    return per_cfg.select(
        "n_bands",
        rows_per_band.alias("rows_per_band"),
        F.round(s_curve, 6).alias("s_curve_threshold"),
        "n_colliding_buckets",
        "candidate_pair_rows",
        F.round(
            F.try_divide(
                F.col("candidate_pair_rows").cast("double"), all_pairs
            ),
            9,
        ).alias("candidate_row_rate"),
    )


def simhash_hamming_histogram(
    documents: DataFrame,
    text_col: str = "text",
    sh: DataFrame | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Hamming-distance histogram over SimHash band-candidate pairs —
    the threshold-placement view for the simhash family: the near-dup
    mass sits in the low-distance buckets, the chance byte-collision
    noise floor in the high ones, and the right ``max_hamming`` is the
    gap between them (the simhash twin of dup_pair_similarity_histogram,
    and of the streaming stage's measured density caveat). Distances
    ≤ SIMHASH_CHUNKS-1 (= 7) are complete by pigeonhole; above that the
    histogram profiles exactly the candidate set a wider threshold
    would have to verify — ``is_complete`` carries that boundary IN the
    data (advice r11: a consumer reading cum_share at distance 20 must
    see it is a share of band candidates, not of the population).

    Cost: the band-candidate join (shared shape with simhash_pairs,
    same memoized signature input) plus a ≤ 65-row aggregate; the
    cumulative columns are windows over histogram rows, not pairs.
    """
    from pyspark.sql import Window

    pairs = simhash_pairs(
        documents, max_hamming=64, text_col=text_col, sh=sh, sig=sig
    )
    h = pairs.groupBy("hamming_distance").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    total = F.sum("n_pairs").over(Window.partitionBy())
    cum = F.sum("n_pairs").over(
        Window.orderBy("hamming_distance").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    return h.select(
        "hamming_distance",
        "n_pairs",
        cum.alias("cum_pairs"),
        F.round(cum / total, 6).alias("cum_share"),
        (F.col("hamming_distance") <= SIMHASH_CHUNKS - 1).alias(
            "is_complete"
        ),
    )


#: Seed-and-extend span discovery parameters: anchor window width, the
#: winnowing band (one anchor guaranteed selected per BAND consecutive
#: window positions), and the resulting detection guarantee — every
#: maximal duplicated span of at least SPAN_MIN_LEN chars is found with
#: EXACT boundaries (Schleimer et al. 2003 winnowing theorem:
#: t = w + band - 1).
SPAN_WINDOW = 20
SPAN_BAND = 21
SPAN_MIN_LEN = SPAN_WINDOW + SPAN_BAND - 1


def substring_dup_spans(
    documents: DataFrame,
    window: int = SPAN_WINDOW,
    band: int = SPAN_BAND,
    text_col: str = "text",
    mode: str = "pairs",
    rescue_rounds: int = 0,
    anchors: DataFrame | None = None,
) -> DataFrame:
    """EXACT maximal duplicated spans across document pairs, seed-and-
    extend (Lee et al. 2021 ExactSubstr semantics, winnowing-anchored).

    :func:`substring_dup_profile` is the cheap PROFILE: stride-grid
    windows flag duplication mass but (a) only see grid-ALIGNED repeats
    and (b) report window coverage, not span boundaries. This operator
    reports the spans themselves: one row per (doc_a, doc_b, maximal
    span) with exact 1-indexed starts and length — the table a curation
    pass cuts spans from (the reference deletes whole duplicate rows,
    snowflake_bq_deduplication_sync.py:214; Lee et al. cut the span).

    Guarantee (not heuristic): anchors are winnowing-selected window
    hashes — position p is selected iff it is the rightmost minimum of
    some ``band``-length run of window hashes. Selection inside a shared
    span depends only on hashes inside the span, so any common span of
    length >= ``window + band - 1`` selects at least one anchor at the
    SAME relative offset in both docs (alignment-free, unlike the stride
    grid). Each anchor pair is verified by character comparison (hash
    collisions die here) and extended left/right to its maximal run;
    spans shorter than the guarantee are dropped so the output is
    deterministic: exactly the set a quadratic per-diagonal scan
    produces (equality pytest in tests/test_neardup.py).

    Scale posture: the position explode is row-local and linear
    (one row per char position; ~len-w+1 per doc); winnowing is one
    per-doc window pass (partitioned by doc_id — parallel across docs);
    anchors are ~2/(band+1) of positions; the candidate join is
    anchor-hash bucketed — never all-pairs — and the extension is an
    Arrow-batched mapInPandas over candidate rows only, each touching
    just the two texts it extends. Work scales with true duplication
    (anchors per shared span ~ span_len/band), not corpus²; enrolled in
    SCALE_SMOKE.

    ``mode``: with ``"pairs"`` (default) the output itself is pairwise,
    so a >=guarantee-length boilerplate block carried by a corpus
    fraction f makes the TRUE answer Θ((f·n)²) rows — correct, but the
    wrong tool at 100 TB. ``"star"`` is the linear-output curation form
    (the Lee et al. cut-all-but-one read): each anchor hash pairs its
    occurrences against the CANONICAL first occurrence only (min
    (doc_id, position)) — O(occurrences) candidates and output under
    any boilerplate skew, with duplicated regions extended to exact
    boundaries vs the canonical carrier. Scope, honestly: the detection
    guarantee holds when the span's anchor content FIRST occurs inside
    a carrier of the span (the corpus-wide-boilerplate case the mode
    exists for); anchor content that also appears in an OLDER unrelated
    doc with sub-guarantee context can shadow a later pair (the
    canonical extension falls below the floor, so the non-canonical
    pair is never formed). Pairs mode remains the exact answer; star is
    the scale triage that says which docs carry the canonical content.
    Pytest-pinned: star output on a hot-boilerplate corpus is linear,
    every star span is a genuine common substring at exact boundaries,
    and every carrier of the boilerplate is detected.

    ``rescue_rounds`` (star mode only) counters that shadowing without
    giving up linearity: each rescue round takes the occurrences whose
    round-N extension FAILED the guarantee floor (short extension or
    hash-collision mismatch), removes the occurrences already covered
    (the canonical position per hash and every occurrence whose span
    succeeded), re-selects the canonical among the survivors — which by
    construction IS the oldest true carrier once the shadowing doc is
    out — and extends against it. Each round strictly shrinks the pool
    (the canonical leaves it), costs one bucketed join + one Arrow pass
    over FAILED occurrences only, and round counts beyond the seeded
    shadow depth are no-ops. The shadow rate and its rescue to zero are
    measured and pinned in tests/test_neardup.py (a seeded shadow corpus
    plus the planted-motif corpus, where the plain-star rate is already
    0 — realistic shapes rarely shadow; the seeded corpus needs EVERY
    anchor window of the span to first occur in an older non-carrier).
    """
    if mode not in ("pairs", "star"):
        raise ValueError(f"substring_dup_spans: unknown mode {mode!r}")
    docs = _span_docs(documents, window, band, text_col)
    if anchors is None:
        anchors = span_anchor_table(documents, window, band, text_col, docs)
    w_len, min_len = int(window), int(window) + int(band) - 1

    def _attach_texts(cand: DataFrame) -> DataFrame:
        return _attach_span_texts(cand, docs, docs)

    if mode == "star":
        return _star_spans(
            docs, anchors, _attach_texts, w_len, min_len, rescue_rounds
        )
    cand = (
        anchors.select(
            F.col("doc_id").alias("doc_a"), F.col("i").alias("sa"), "__h"
        )
        .join(
            anchors.select(
                F.col("doc_id").alias("doc_b"),
                F.col("i").alias("sb"),
                "__h",
            ),
            "__h",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "sa", "doc_b", "sb")
    )
    return _attach_texts(cand).mapInPandas(
        _make_extend_pairs(w_len, min_len),
        schema="doc_a long, doc_b long, start_a long, start_b long, "
        "span_len long",
    ).distinct()


def _span_docs(
    documents: DataFrame, window: int, band: int, text_col: str
) -> DataFrame:
    """(doc_id, __t) limited to docs long enough to carry a reportable
    span (output keeps only span_len >= window + band - 1), so the
    position explode prunes to qualifying docs up front."""
    return documents.select(
        "doc_id", F.col(text_col).alias("__t")
    ).filter(F.length("__t") >= window + band - 1)


def span_anchor_table(
    documents: DataFrame,
    window: int = SPAN_WINDOW,
    band: int = SPAN_BAND,
    text_col: str = "text",
    docs: DataFrame | None = None,
) -> DataFrame:
    """Winnowing-selected anchor table (doc_id, i, __h) for the span
    family — the persistable STANDING index of ExactSubstr dedup.

    Rightmost-min winnowing: min(struct(h, -i)) over each band-length
    frame IS that frame's rightmost minimal hash; a position selected by
    any frame fully inside a shared span is selected identically in both
    docs. Tail frames (< band positions) select extra anchors — a
    harmless superset (everything verifies downstream). Selection is
    PER-DOC (each doc's own window hashes), so slicing a corpus-wide
    anchor table by doc_id is exactly the anchor table of the sliced
    corpus — the property that lets a memoized/persisted table serve
    both the pairs query and the incremental probe
    (:func:`incremental_span_check`), like the shingle-index memo.
    """
    from pyspark.sql import Window as W

    from ..catalog import fan_out

    if docs is None:
        docs = _span_docs(documents, window, band, text_col)
    pos = fan_out(docs).select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("__t") - window + 1)
        ).alias("i"),
        F.col("__t"),
    ).select(
        "doc_id",
        "i",
        F.xxhash64(
            F.col("__t").substr(F.col("i"), F.lit(window))
        ).alias("__h"),
    )
    frame = W.partitionBy("doc_id").orderBy("i").rowsBetween(0, band - 1)
    sel = F.min(F.struct(F.col("__h"), (-F.col("i")).alias("ni"))).over(
        frame
    )
    return (
        pos.select("doc_id", sel.alias("__sel"))
        .select(
            "doc_id",
            (-F.col("__sel.ni")).alias("i"),
            F.col("__sel.__h").alias("__h"),
        )
        .distinct()
    )


def _attach_span_texts(
    cand: DataFrame, docs_a: DataFrame, docs_b: DataFrame
) -> DataFrame:
    return cand.join(
        docs_a.select(
            F.col("doc_id").alias("doc_a"), F.col("__t").alias("__ta")
        ),
        "doc_a",
    ).join(
        docs_b.select(
            F.col("doc_id").alias("doc_b"), F.col("__t").alias("__tb")
        ),
        "doc_b",
    )


def _make_extend_pairs(w_len: int, min_len: int):
    """Arrow extension pass for pairs-shaped span candidates: verify the
    anchor window by characters (hash collisions die here), extend to
    the maximal run, keep runs at/above the winnowing guarantee."""

    def _extend(batches):
        import pandas as pd

        for pdf in batches:
            da_o, db_o, sa_o, sb_o, ln_o = [], [], [], [], []
            for da, db, sa, sb, ta, tb in zip(
                pdf["doc_a"], pdf["doc_b"], pdf["sa"], pdf["sb"],
                pdf["__ta"], pdf["__tb"],
            ):
                i, j = int(sa) - 1, int(sb) - 1
                if ta[i : i + w_len] != tb[j : j + w_len]:
                    continue  # xxhash64 collision — exact verify kills it
                left = 0
                while (
                    i - left - 1 >= 0
                    and j - left - 1 >= 0
                    and ta[i - left - 1] == tb[j - left - 1]
                ):
                    left += 1
                right = 0
                while (
                    i + w_len + right < len(ta)
                    and j + w_len + right < len(tb)
                    and ta[i + w_len + right] == tb[j + w_len + right]
                ):
                    right += 1
                span = w_len + left + right
                if span >= min_len:
                    da_o.append(da)
                    db_o.append(db)
                    sa_o.append(i - left + 1)
                    sb_o.append(j - left + 1)
                    ln_o.append(span)
            yield pd.DataFrame(
                {
                    "doc_a": pd.Series(da_o, dtype="int64"),
                    "doc_b": pd.Series(db_o, dtype="int64"),
                    "start_a": pd.Series(sa_o, dtype="int64"),
                    "start_b": pd.Series(sb_o, dtype="int64"),
                    "span_len": pd.Series(ln_o, dtype="int64"),
                }
            )

    return _extend


def incremental_span_check(
    corpus: DataFrame,
    incoming: DataFrame,
    window: int = SPAN_WINDOW,
    band: int = SPAN_BAND,
    text_col: str = "text",
    anchors_corpus: DataFrame | None = None,
    anchors_incoming: DataFrame | None = None,
) -> DataFrame:
    """EXACT maximal duplicated spans of INCOMING docs against an
    EXISTING corpus — the span-grain twin of
    :func:`incremental_neardup_check` (the daily-increment flow: "which
    passages of today's crawl already exist verbatim in the training
    set"), and the incremental form of :func:`substring_dup_spans`.

    Output: (doc_a = corpus doc, doc_b = incoming doc, start_a, start_b,
    span_len) for every maximal common run >= window + band - 1 —
    pytest-pinned equal to the pairs-mode span set on the union,
    restricted/orientated to (corpus, incoming) pairs. The winnowing
    guarantee is unchanged: anchor selection is per-doc, so probing a
    standing corpus anchor table with increment anchors finds exactly
    the spans the whole-corpus run would.

    Scale posture: the corpus side is the persistable standing anchor
    index (:func:`span_anchor_table` — pass ``anchors_corpus``, e.g. a
    doc_id slice of the registry's memoized table, exact because
    winnowing is per-doc); the increment only probes. Candidate volume
    is bucketed by anchor hash (never corpus × increment), extension is
    the same Arrow pass over candidates only — maintenance cost is
    O(increment + true shared spans), the incremental posture the daily
    pipeline's other probes already hold.
    """
    docs_a = _span_docs(corpus, window, band, text_col)
    docs_b = _span_docs(incoming, window, band, text_col)
    if anchors_corpus is None:
        anchors_corpus = span_anchor_table(
            corpus, window, band, text_col, docs_a
        )
    if anchors_incoming is None:
        anchors_incoming = span_anchor_table(
            incoming, window, band, text_col, docs_b
        )
    w_len, min_len = int(window), int(window) + int(band) - 1
    cand = (
        anchors_corpus.select(
            F.col("doc_id").alias("doc_a"), F.col("i").alias("sa"), "__h"
        )
        .join(
            anchors_incoming.select(
                F.col("doc_id").alias("doc_b"),
                F.col("i").alias("sb"),
                "__h",
            ),
            "__h",
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "sa", "doc_b", "sb")
    )
    return _attach_span_texts(cand, docs_a, docs_b).mapInPandas(
        _make_extend_pairs(w_len, min_len),
        schema="doc_a long, doc_b long, start_a long, start_b long, "
        "span_len long",
    ).distinct()


def _star_spans(
    docs: DataFrame,
    anchors: DataFrame,
    attach_texts,
    w_len: int,
    min_len: int,
    rescue_rounds: int,
) -> DataFrame:
    """Star-mode candidate generation + extension for
    :func:`substring_dup_spans`, with the shadow-rescue loop (see the
    mode/rescue_rounds contract there). Round 0 is the plain star pass:
    one candidate per (anchor hash, occurrence) against the hash's
    canonical first occurrence. Each rescue round re-anchors ONLY the
    occurrences whose extension failed the guarantee floor — linear
    per-round cost, strictly shrinking pool."""
    if rescue_rounds < 0:
        raise ValueError(
            f"substring_dup_spans: rescue_rounds must be >= 0, "
            f"got {rescue_rounds}"
        )

    def _extend_flagged(batches):
        import pandas as pd

        for pdf in batches:
            cols = {
                k: []
                for k in (
                    "doc_a", "doc_b", "start_a", "start_b", "span_len",
                    "asb", "ah",
                )
            }
            for da, db, sa, sb, h, ta, tb in zip(
                pdf["doc_a"], pdf["doc_b"], pdf["sa"], pdf["sb"],
                pdf["__h"], pdf["__ta"], pdf["__tb"],
            ):
                i, j = int(sa) - 1, int(sb) - 1
                if ta[i : i + w_len] != tb[j : j + w_len]:
                    # xxhash64 collision: no shared content at the anchor;
                    # emitted with span_len 0 so the occurrence stays in
                    # the rescue pool instead of silently vanishing
                    span, oa, ob = 0, i + 1, j + 1
                else:
                    left = 0
                    while (
                        i - left - 1 >= 0
                        and j - left - 1 >= 0
                        and ta[i - left - 1] == tb[j - left - 1]
                    ):
                        left += 1
                    right = 0
                    while (
                        i + w_len + right < len(ta)
                        and j + w_len + right < len(tb)
                        and ta[i + w_len + right] == tb[j + w_len + right]
                    ):
                        right += 1
                    span = w_len + left + right
                    oa, ob = i - left + 1, j - left + 1
                cols["doc_a"].append(da)
                cols["doc_b"].append(db)
                cols["start_a"].append(oa)
                cols["start_b"].append(ob)
                cols["span_len"].append(span)
                cols["asb"].append(int(sb))
                cols["ah"].append(int(h))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in cols.items()}
            )

    schema = (
        "doc_a long, doc_b long, start_a long, start_b long, "
        "span_len long, asb long, ah long"
    )
    remaining = anchors
    parts: list[DataFrame] = []
    for rnd in range(int(rescue_rounds) + 1):
        canon = (
            remaining.groupBy("__h")
            .agg(F.min(F.struct("doc_id", "i")).alias("__c"))
            .select(
                "__h",
                F.col("__c.doc_id").alias("doc_a"),
                F.col("__c.i").alias("sa"),
            )
        )
        cand = canon.join(
            remaining.select(
                F.col("doc_id").alias("doc_b"),
                F.col("i").alias("sb"),
                "__h",
            ),
            "__h",
        ).filter(F.col("doc_a") < F.col("doc_b"))
        ext = attach_texts(cand).mapInPandas(_extend_flagged, schema=schema)
        if rnd < int(rescue_rounds):
            # ext feeds BOTH this round's ok-part and (through
            # `remaining`) every later round's lineage: without a
            # persist, materializing the final union re-executes round
            # r's candidate join + Arrow extension once per later round
            # (O(R²) stage work on the boilerplate corpora star mode
            # exists for). The last round's ext has a single consumer.
            ext = _swap_cache(f"neardup._star_spans.round{rnd}", ext)
        ok = ext.filter(F.col("span_len") >= min_len)
        parts.append(
            ok.select("doc_a", "doc_b", "start_a", "start_b", "span_len")
        )
        # next pool = the FAILED candidates only (short extension or
        # collision): the canonical and every succeeded occurrence are
        # covered, and re-selecting the canonical among the failures IS
        # "the canonical carrier of the actual shared content" once the
        # shadowing doc is out — one round even for periodic content,
        # where anchor hashes recur at many alignments (the failed
        # occurrences sit at matching relative offsets, so they align
        # with each other immediately). Residual, documented: an
        # alternate occurrence INSIDE the canonical doc at the right
        # alignment is never re-attempted (same-doc occurrences cannot
        # be candidates) — pairs mode remains the exact answer.
        remaining = ext.filter(F.col("span_len") < min_len).select(
            F.col("doc_b").alias("doc_id"),
            F.col("asb").alias("i"),
            F.col("ah").alias("__h"),
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def span_cut(
    documents: DataFrame,
    window: int = SPAN_WINDOW,
    band: int = SPAN_BAND,
    text_col: str = "text",
    mode: str = "pairs",
    spans: DataFrame | None = None,
) -> DataFrame:
    """CUT every non-canonical maximal duplicated span and reassemble the
    survivors — the curation pass that CONSUMES :func:`substring_dup_spans`
    the way Lee et al. 2021 apply ExactSubstr dedup: the span's first
    occurrence (the smaller doc_id of each pair) stays intact, every later
    occurrence is removed from its document, and the doc is stitched back
    together from the surviving segments. The span-grain engine form of
    the reference's row-level dedup sweep
    (snowflake_bq_deduplication_sync.py:214 deletes whole duplicate rows;
    this deletes just the duplicated characters).

    Semantics: for each spans-table row (doc_a < doc_b) the interval
    [start_b, start_b + span_len) is cut from doc_b; per doc, overlapping
    cut intervals from different pairs UNION before cutting (one
    gaps-and-islands pass — pytest-pinned equal to a naive per-position
    mask), so chars are never double-counted and the reassembly is exact:
    length(cut_text) + chars_removed == orig_chars for every doc
    (conservation pytest). Keep-first is transitive here the same way the
    whole-doc rule is: content shared by docs {2, 5, 9} yields pairs
    (2,5), (2,9), (5,9), so doc 2 keeps its copy and docs 5 and 9 lose
    theirs. Within-doc self-repeats are out of scope (the spans table is
    cross-doc by construction) — documented, not silent.

    ``mode="pairs"`` cuts from the exact pairwise span set;
    ``mode="star"`` rides the linear-output star spans — the 100 TB form
    under corpus-wide boilerplate, cutting each occurrence against the
    canonical carrier only (same shadowing caveat as the spans operator,
    quantified in tests/test_neardup.py). Pass ``spans=`` to reuse a
    memoized/persisted spans table (the registry posture).

    Scale posture: everything downstream of the spans table is linear in
    cut intervals — one shuffle partitioned by doc_id for the island
    merge, one join back to the corpus, and a per-doc row-local stitch
    (Spark's ``aggregate`` over the doc's own island array; interpreted,
    but O(islands) per doc and never corpus-wide). No all-pairs work
    beyond what the spans table itself priced in.
    """
    from pyspark.sql import Window as W

    if spans is None:
        spans = substring_dup_spans(documents, window, band, text_col, mode)
    cuts = spans.select(
        F.col("doc_b").alias("doc_id"),
        F.col("start_b").alias("s"),
        (F.col("start_b") + F.col("span_len") - 1).alias("e"),
    )
    w_doc = W.partitionBy("doc_id").orderBy("s", "e")
    prev_max_end = F.max("e").over(
        w_doc.rowsBetween(W.unboundedPreceding, -1)
    )
    # a new island starts only past prev_end + 1: ADJACENT intervals merge
    # too (one contiguous removed region is ONE cut), matching the
    # per-position mask reference, not just the overlap case
    per_doc = (
        cuts.withColumn(
            "__new",
            (
                F.col("s") > F.coalesce(prev_max_end, F.lit(-2)) + 1
            ).cast("long"),
        )
        .withColumn("__isl", F.sum("__new").over(w_doc))
        .groupBy("doc_id", "__isl")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("spans_cut"),
            F.sum(F.col("e") - F.col("s") + 1).alias("chars_removed"),
            F.array_sort(
                F.collect_list(F.struct(F.col("s"), F.col("e")))
            ).alias("__isl"),
        )
    )
    base = documents.select(
        "doc_id", F.col(text_col).alias("__t")
    ).join(per_doc, "doc_id", "left")
    isl = F.coalesce(
        F.col("__isl"), F.array().cast("array<struct<s:bigint,e:bigint>>")
    )
    # row-local stitch: walk the doc's merged islands left-to-right,
    # keeping [cursor, island.start) each step and the tail at the end
    stitched = F.aggregate(
        isl,
        F.struct(
            F.lit(1).cast("long").alias("p"), F.lit("").alias("acc")
        ),
        lambda a, x: F.struct(
            (x["e"] + 1).alias("p"),
            F.concat(
                a["acc"],
                F.col("__t").substr(
                    a["p"].cast("int"),
                    F.greatest(
                        (x["s"] - a["p"]).cast("int"), F.lit(0)
                    ),
                ),
            ).alias("acc"),
        ),
        lambda a: F.concat(
            a["acc"],
            F.col("__t").substr(
                a["p"].cast("int"),
                F.greatest(
                    (F.length("__t") - a["p"] + 1).cast("int"), F.lit(0)
                ),
            ),
        ),
    )
    return base.select(
        "doc_id",
        F.length("__t").cast("long").alias("orig_chars"),
        F.coalesce(F.col("spans_cut"), F.lit(0).cast("long")).alias(
            "spans_cut"
        ),
        F.coalesce(F.col("chars_removed"), F.lit(0).cast("long")).alias(
            "chars_removed"
        ),
        stitched.alias("cut_text"),
    )
