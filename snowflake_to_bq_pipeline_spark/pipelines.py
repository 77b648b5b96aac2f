"""End-to-end pipeline compositions — the engine-side equivalent of the
reference's per-pipeline ``main.py`` entry points (extract → transform →
load → monitor in one invocation, e.g.
work_item_budget_vs_actual_pipeline/main.py), applied to the
training-corpus use case this engine extends the reference toward.

``build_training_corpus`` chains the curation operators the registry
exposes individually into the standard corpus-production sequence:

1. quality gate (Gopher word-shape rules — row-local, zero shuffle)
2. exact dedup (md5 fingerprint, keep min doc_id)
3. fuzzy dedup (n-gram Jaccard pairs → verified CC → keep canonical)
4. language-mix downsampling (deterministic md5 stratified sample)
5. token-balanced shard assignment + one-file-per-shard parquet export

Every stage is the already-oracle-gated operator, so end-to-end
correctness reduces to composition accounting: the pipeline returns a
per-stage funnel (docs in/out) the caller can assert and monitor — the
same survivors-per-gate discipline as ``curation.quality_funnel``.

Scale posture inherits from the stages: the only corpus-sized shuffles
are the dedup joins; the quality gate and sampling are row-local filters
pushed before both, so the expensive stages see the smallest corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import curation, neardup
from .operators.graph import dup_clusters
from .operators.text import fingerprint
from .sinks.writers import write_training_shards

#: Default language-mix rates (matches the registry's stratified query).
MIX_RATES = {"en": 1.0, "zh": 0.5, "fr": 0.25, "es": 0.1, "de": 0.05}


def build_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    jaccard_tau: float = 0.6,
    n_shards: int = 8,
    mix_rates: dict[str, float] | None = None,
    write_audit: bool = True,
) -> dict[str, int]:
    """Produce a curated, deduplicated, mix-balanced, sharded corpus at
    ``out_path``; returns the per-stage document-count funnel.

    With ``write_audit`` (default), also ships the per-doc PROVENANCE
    audit at ``{out_path}_audit``: every INPUT doc with exactly one
    verdict reason by stage precedence (quality_reject > exact_dup >
    near_dup > sampled_out > kept) — the curation-run audit the dedup
    provenance family standardizes (conservation pytest-pinned).
    """
    docs = load_table(spark, sf_dir, "documents")
    all_ids = docs.select("doc_id")
    stage_ids: dict[str, DataFrame] = {}
    stats: dict[str, int] = {"input": docs.count()}
    # the audit-row accounting below leans on "left joins off all_ids can
    # only mark, never fan out", which is only true while doc_id is unique
    # in the INPUT — verify that premise once up front (one cheap
    # distinct-count over a single long column) instead of assuming it
    n_distinct = all_ids.distinct().count()
    if n_distinct != stats["input"]:
        raise ValueError(
            "build_training_corpus: input documents carry "
            f"{stats['input'] - n_distinct} duplicate doc_id row(s) — "
            "doc_id must be unique for the stage-id audit joins to stay "
            "one-row-per-doc"
        )

    # 1. Quality gate (row-local; cheapest filter runs first).
    kept = (
        curation.gopher_quality_rules(docs)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    docs = docs.join(kept, "doc_id")
    stage_ids["quality"] = docs.select("doc_id")
    stats["after_quality"] = docs.count()

    # 2. Exact dedup: keep min doc_id per normalized-text fingerprint.
    fp = fingerprint(docs)
    keep_exact = fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id")
    )
    docs = docs.join(keep_exact.select("doc_id"), "doc_id")
    stage_ids["exact"] = docs.select("doc_id")
    stats["after_exact_dedup"] = docs.count()

    # 3. Fuzzy dedup: Jaccard pairs → transitive clusters → canonical only.
    pairs = neardup.ngram_jaccard_pairs(docs, jaccard_tau)
    drop = (
        dup_clusters(pairs)
        .filter(~F.col("is_canonical"))
        .select("doc_id")
    )
    docs = docs.join(drop, "doc_id", "left_anti")
    stage_ids["fuzzy"] = docs.select("doc_id")
    stats["after_fuzzy_dedup"] = docs.count()

    # 4. Language-mix downsampling (deterministic, auditable).
    docs = curation.stratified_sample(
        docs, "doc_id", "lang", mix_rates or MIX_RATES
    )
    stage_ids["sampled"] = docs.select("doc_id")
    stats["after_mix_sample"] = docs.count()

    if write_audit:
        marked = all_ids
        for name, ids in stage_ids.items():
            marked = marked.join(
                ids.withColumn(f"__{name}", F.lit(True)), "doc_id", "left"
            )
        reason = (
            F.when(
                ~F.coalesce(F.col("__quality"), F.lit(False)),
                "quality_reject",
            )
            .when(~F.coalesce(F.col("__exact"), F.lit(False)), "exact_dup")
            .when(~F.coalesce(F.col("__fuzzy"), F.lit(False)), "near_dup")
            .when(
                ~F.coalesce(F.col("__sampled"), F.lit(False)), "sampled_out"
            )
            .otherwise("kept")
        )
        marked.select(
            "doc_id",
            reason.alias("reason"),
            (reason == "kept").alias("keep"),
        ).write.mode("overwrite").parquet(f"{out_path}_audit")
        # one row per input doc by construction (left joins off all_ids
        # can only mark, never drop/fan out) — the e2e test re-reads the
        # file and verifies; no read-back count here
        stats["audit_rows"] = stats["input"]

    # 5. Split-leakage QA: fuzzy dedup at tau should have removed
    # cross-split near-dups; report residual exact-5-gram leakage across
    # the deterministic train/val/test boundary (the number an eval-set
    # owner watches — nonzero means step 3's tau is too loose).
    leak = curation.cross_split_contamination(docs)
    stats["heldout_docs"] = leak.count()
    stats["heldout_leaked"] = leak.filter(F.col("leaked")).count()

    # 6. Token-balanced shards → one parquet file per shard.
    n_tokens = F.array_size(F.split(F.col("text"), " "))
    assigned = curation.shard_assignment(docs, n_tokens, n_shards=n_shards)
    out = docs.join(assigned.select("doc_id", "shard_id"), "doc_id")
    write_training_shards(out, out_path, order_col="doc_id")
    stats["written"] = spark.read.parquet(out_path).count()
    return stats


# ---------------------------------------------------------------------------
# Incremental daily curation — the daily-increment twin of
# build_training_corpus, and the engine form of the reference's daily
# sync discipline (snowflake_bq_sync_daily Time Details/main.py:
# date-window DELETE + INSERT per run; *_sync_daily/main.py): each run
# owns one partition of the standing state, so re-running a day is
# idempotent, and the accepted corpus after N increments is provably the
# batch rebuild on the union (pytest-pinned).
# ---------------------------------------------------------------------------


def _read_state_or_empty(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read a standing-state table with an EXPLICIT schema (string or
    StructType), or the empty frame of that schema when the table does
    not exist yet. The explicit schema is what makes schema EVOLUTION
    read old and new ``__run`` partitions together: runs written before
    a column was added read it as NULL, and runs written at a narrower
    numeric type read through the parquet reader's widening promotion
    (int→bigint, float→double — verified by pytest) — the lake-side
    equivalent of the reference's reuse-existing-table-schema discipline
    (client_dimension_sync_full/main.py:94-104)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(schema).parquet(path)
    except AnalysisException:
        return spark.createDataFrame([], schema)


def _require_local_state_dir(op: str, state_dir: str) -> None:
    """The incremental state machinery tracks schema evolution
    (``_schema.json``) and the cut_spans mode guard with LOCAL-file
    metadata (os.path / os.listdir) next to the Spark-written tables. On
    a URI-scheme dir (hdfs://, s3a://) those checks would silently
    no-op — schema flips slipping through unchecked and mixed cut/uncut
    states mis-deduping — in a module whose contract is loud refusal.
    Refuse the path instead; a distributed-fs state dir needs these
    probes ported to the Hadoop FileSystem API first."""
    if "://" in state_dir:
        raise ValueError(
            f"{op}: state_dir {state_dir!r} uses a URI scheme — the "
            "standing-state metadata (schema evolution, span-cut mode "
            "guard) is tracked with local-filesystem probes; use a "
            "local path or port the probes to the Hadoop FS API"
        )


def _schema_state_path(state_dir: str) -> str:
    return f"{state_dir}/_schema.json"


def _load_state_schema(state_dir: str):
    import json
    import os

    from pyspark.sql.types import StructType

    p = _schema_state_path(state_dir)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return StructType.fromJson(json.load(fh))


def _store_state_schema(state_dir: str, schema) -> None:
    import json
    import os

    os.makedirs(state_dir, exist_ok=True)
    tmp = _schema_state_path(state_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(schema.jsonValue(), fh)
    os.replace(tmp, _schema_state_path(state_dir))


def read_corpus_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Read the standing accepted-corpus table under the CURRENT evolved
    schema (stored ``_schema.json`` + the pipeline's own columns) — the
    read every consumer must use after a schema evolution: a plain
    parquet read of the root adopts one arbitrary footer's schema and
    silently drops columns that only newer runs carry."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    _require_local_state_dir("read_corpus_state", state_dir)
    evolved = _load_state_schema(state_dir)
    path = f"{state_dir}/corpus"
    if evolved is None:  # pre-evolution state dir: files share one schema
        return spark.read.parquet(path)
    fields = list(evolved.fields) + [
        StructField("log_odds", DoubleType()),
        StructField("split", StringType()),
        StructField("n_tokens", LongType()),
        StructField("shard_id", LongType()),
        StructField("__run", StringType()),
    ]
    return _read_state_or_empty(spark, path, StructType(fields))


def run_daily_increment(
    spark: SparkSession,
    state_dir: str,
    increment: DataFrame,
    run_id: str,
    model: dict,
    jaccard_tau: float = 0.6,
    n_shards: int = 8,
    cut_spans: bool = False,
) -> dict[str, int]:
    """One daily curation run: score the increment with the STANDING NB
    model, drop docs that duplicate the standing corpus (or an earlier
    doc of the same increment), assign split-stable train/val/test, and
    APPEND token-balanced shard assignments — all against persistent
    state under ``state_dir``:

    - ``{state_dir}/seen/__run=<id>``: every quality-passing doc of the
      run (INCLUDING dedup-dropped ones — they stay in the standing
      dedup index, exactly like the batch pair table sees them);
    - ``{state_dir}/corpus/__run=<id>``: the accepted rows with
      ``split``/``shard_id``/score columns;
    - ``{state_dir}/audit/__run=<id>``: the run's provenance slice —
      every increment doc with exactly one verdict reason
      (quality_reject > dup_vs_standing > dup_within_increment >
      accepted), the daily analog of ``dedup_provenance_rollup``.

    Idempotence by the reference's date-window discipline: each run
    OVERWRITES its own ``__run`` partition and the standing state it
    reads EXCLUDES that partition, so re-running a day converges to the
    identical state (delete+insert, pytest-pinned).

    Merge ≡ recompute: the dedup rule is keep-first greedy — doc d is
    dropped iff some quality-passing doc with a SMALLER doc_id matches
    it at ``jaccard_tau`` (standing index probe via
    incremental_neardup_check + the intra-increment pair check). That
    rule is a pure per-doc function of the union, so increment-then-
    increment equals one batch :func:`rebuild_corpus` on the union —
    the same merge≡recompute property the sync family pins. It requires
    each run to own a DISJOINT doc_id interval (new days above every
    seen id; re-running an old day keeps its interval), CHECKED per run
    — a violation raises instead of silently mis-deduping. Split
    assignment hashes each accepted
    doc's own id, which here IS the cluster-canonical key: any doc whose
    cluster canonical is older was dropped, so every accepted doc is its
    own canonical (the cluster-safe property by construction).

    Scale posture: the expensive side of every join is the standing
    corpus, touched exactly as the standing-index queries touch it
    (inverted shingle probe); the increment is small. The shard append
    deals the increment rank-round-robin starting from the LIGHTEST
    standing shards — O(n_shards) driver state, one tiny aggregate over
    the standing corpus state.

    Schema drift (r14): the increment's schema evolves the standing
    corpus schema through ``operators/schema_drift.full_sync_evolve`` —
    added columns append nullable (old runs read NULL), widenable types
    widen (old runs read via parquet type promotion), incompatible flips
    raise ``SchemaDriftError`` before any state is written; the evolved
    schema persists at ``{state_dir}/_schema.json``. increment≡rebuild
    holds across an evolution boundary (pytest-pinned).

    Span-grain dedup (``cut_spans=True``, late r14): after the whole-doc
    keep-first drop, every maximal duplicated span (>= the ExactSubstr
    guarantee length) an ACCEPTED doc shares with the standing corpus or
    with a smaller-id accepted doc of the same increment is CUT from the
    later doc before it is written — Lee et al. 2021 ExactSubstr applied
    at the daily cadence (the span-grain form of the reference's
    row-level dedup sweep, snowflake_bq_deduplication_sync.py:214).
    Mechanics per run:

    - probes ride the STANDING ANCHOR INDEX at
      ``{state_dir}/span_anchors/__run=<id>`` — each run appends the
      winnowing anchors of its ORIGINAL accepted texts (O(increment)
      anchor work per day; per-doc winnowing makes the union of slices
      exactly the whole-corpus anchor table);
    - spans are found against the standing docs' ORIGINAL texts (the
      ``seen`` state), never their cut forms — exactly the pairs a batch
      rebuild on the union pairs, which is why increment≡rebuild stays
      EXACT under cutting (pytest-pinned): canonical carriers keep their
      copy, so cutting a carrier's own later-dup content can never
      shorten the span a future increment must match;
    - cuts land on the increment side only (every standing doc is the
      smaller id under the interval contract — its copy is canonical);
      overlapping/adjacent cut intervals union per doc before cutting
      (span_cut's gaps-and-islands pass), and the per-doc accounting
      (orig_chars / spans_cut / chars_removed) is written to
      ``{state_dir}/span_cuts/__run=<id>`` — conservation
      (chars kept + chars removed == chars in) is pytest-pinned.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    from .operators import schema_drift
    from .operators.sync import global_row_number

    for col in ("doc_id", "source", "text"):
        if col not in increment.columns:
            raise ValueError(
                f"run_daily_increment: increment is missing required "
                f"column {col!r}"
            )
    # pipeline-reserved names: schema evolution admits arbitrary
    # increment columns into the standing schema, and these collide with
    # the columns the pipeline itself adds — 'log_odds' would make the
    # scored join ambiguous AFTER the evolved schema persisted (every
    # later read then carries a duplicate-named field), 'n_tokens' would
    # be silently overwritten in corpus while seen keeps the original.
    # Refuse up front, before any state is touched.
    clash = {
        "log_odds", "split", "n_tokens", "shard_id",
        "__run", "__rn", "__neg_nt",
    }.intersection(increment.columns)
    if clash:
        raise ValueError(
            f"run_daily_increment: increment column(s) {sorted(clash)} "
            "collide with pipeline-reserved names (log_odds/split/"
            "n_tokens/shard_id/__run and internals) — rename them "
            "upstream; schema evolution would otherwise corrupt the "
            "standing corpus schema"
        )
    # schema evolution against the STANDING corpus schema (the
    # reference's daily sync re-derives/reuses the target schema per
    # run, client_dimension_sync_full/main.py:94-104): a new nullable
    # column appends (old runs read NULL), a widenable type widens
    # (old runs read through parquet type promotion), a type FLIP
    # raises SchemaDriftError before any state is touched. The evolved
    # schema persists as _schema.json next to the state tables, so
    # every later read — including an old day's re-run — aligns to it.
    _require_local_state_dir("run_daily_increment", state_dir)
    target_schema = _load_state_schema(state_dir)
    inc, _drift = schema_drift.full_sync_evolve(increment, target_schema)
    evolved = inc.schema
    # NOTE: the evolved schema is PERSISTED only after every contract
    # guard below (id-interval, cut_spans mode) has passed — a rejected
    # run must leave the standing schema exactly as committed runs built
    # it (only SchemaDriftError, raised inside full_sync_evolve above,
    # precedes this point, and it stores nothing).
    inc_cols = [f.name for f in evolved.fields]
    n_inc = inc.count()

    seen_path = f"{state_dir}/seen"
    corpus_path = f"{state_dir}/corpus"
    seen_all = _read_state_or_empty(
        spark,
        seen_path,
        StructType(
            list(evolved.fields) + [StructField("__run", StringType())]
        ),
    )
    is_rerun = bool(
        seen_all.filter(F.col("__run") == run_id).take(1)
    )
    seen = seen_all.filter(F.col("__run") != run_id)

    # id-interval contract: each run owns a DISJOINT doc_id interval;
    # NEW run ids must take ids above every seen id (a first-time run
    # slotted BELOW existing runs could not retroactively drop the
    # later-id standing docs that batch recompute would drop — so it
    # raises instead of silently diverging), while RE-RUNNING an
    # already-committed run id keeps its old interval (later runs were
    # already deduped against it). Under the contract, "quality-passing
    # docs with a smaller id" == "seen docs below this increment's
    # interval ∪ smaller-id increment docs", so the keep-first rule
    # stays a pure per-doc function of the union across re-runs.
    bounds = inc.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    min_inc, max_inc = bounds["lo"], bounds["hi"]
    if min_inc is not None:
        overlap = seen.filter(
            (F.col("doc_id") >= min_inc) & (F.col("doc_id") <= max_inc)
        ).count()
        if overlap:
            raise ValueError(
                f"run_daily_increment: {overlap} seen doc id(s) from "
                f"other runs fall inside this increment's id interval "
                f"[{min_inc}, {max_inc}] — run id intervals must be "
                "disjoint for the keep-first dedup rule to be exact"
            )
        if not is_rerun:
            above = seen.filter(F.col("doc_id") > max_inc).count()
            if above:
                raise ValueError(
                    f"run_daily_increment: new run {run_id!r} sits below "
                    f"{above} already-seen doc id(s) — a first-time run "
                    "must take ids above every seen id (only re-running "
                    "an existing run id may keep an old interval), else "
                    "standing docs the batch rebuild would drop as its "
                    "later-id dups silently survive"
                )
        seen = seen.filter(F.col("doc_id") < min_inc)

    # mode guard: span cutting is a property of the WHOLE state dir, not
    # of one run — a cut run over uncut history would silently miss every
    # span whose carrier predates the flag (no standing anchors), and an
    # uncut run over cut history would emit uncut text a rebuild would
    # have cut. Either mix refuses loudly, BEFORE any compute or write.
    anchors_path = f"{state_dir}/span_anchors"
    import os as _os

    def _run_parts(path: str) -> set[str]:
        if not _os.path.isdir(path):
            return set()
        return {
            d
            for d in _os.listdir(path)
            if d.startswith("__run=") and ".old." not in d
        }

    prior_seen_runs = _run_parts(seen_path) - {f"__run={run_id}"}
    prior_anchor_runs = _run_parts(anchors_path) - {f"__run={run_id}"}
    if cut_spans and (missing := prior_seen_runs - prior_anchor_runs):
        raise ValueError(
            "run_daily_increment: cut_spans=True over a state dir with "
            f"{len(missing)} prior run(s) that carry no span-anchor "
            "slice — the standing corpus was built WITHOUT span cutting "
            "and its spans cannot be probed; rebuild the state with "
            "cut_spans or keep it uncut"
        )
    if not cut_spans and prior_anchor_runs:
        raise ValueError(
            "run_daily_increment: cut_spans=False over a state dir "
            "whose prior runs carry span-anchor slices — the standing "
            "corpus was built WITH span cutting; pass cut_spans=True"
        )
    # every contract guard has passed: NOW the evolved schema may persist
    _store_state_schema(state_dir, evolved)

    # 1. standing-model quality gate (row-local, shuffle-free scorer)
    scored = curation.score_docs_with_model(inc, model).select(
        "doc_id", "n_grams", "log_odds", "pred_curated"
    )
    from pyspark.storagelevel import StorageLevel

    # increment-sized multi-consumer intermediates are persisted for the
    # run (the stats counts, both dedup probes, the accepted anti-join,
    # and the three writes would otherwise re-execute the scorer and the
    # standing-index probe per action)
    inc_q = inc.join(
        scored.filter(F.col("pred_curated")).select(
            "doc_id", "log_odds"
        ),
        "doc_id",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_quality = inc_q.count()

    # 2a. dedup vs the STANDING corpus (quality-passing seen docs)
    std_dup = (
        neardup.incremental_neardup_check(
            seen.select("doc_id", "text"),
            inc_q.select("doc_id", "text"),
            jaccard_tau,
        )
        .filter(F.col("is_duplicate"))
        .select("doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # 2b. dedup WITHIN the increment: keep-first — drop the larger id of
    # every pair (matches the batch rule "has a smaller-id neighbor")
    intra_dup = (
        neardup.ngram_jaccard_pairs(
            inc_q.select("doc_id", "text"), jaccard_tau
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dropped = (
        std_dup.unionByName(intra_dup)
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    accepted = inc_q.join(dropped, "doc_id", "left_anti")

    # 2c. span-grain dedup (opt-in): cut every ExactSubstr maximal span
    # an accepted doc shares with the standing corpus (probed through
    # the standing anchor index over ORIGINAL texts — see docstring for
    # why originals keep increment≡rebuild exact) or with a smaller-id
    # accepted doc of this increment. Anchor work is O(increment); the
    # standing side contributes one text-attach join keyed by the
    # candidates the anchor hash join survives.
    cut = None
    if cut_spans:
        acc_docs = accepted.select("doc_id", "text").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        inc_anchors = neardup.span_anchor_table(acc_docs).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        standing_anchors = _read_state_or_empty(
            spark,
            anchors_path,
            "doc_id long, i long, __h long, __run string",
        ).filter(F.col("__run") != run_id)
        if min_inc is not None:
            standing_anchors = standing_anchors.filter(
                F.col("doc_id") < min_inc
            )
        std_spans = neardup.incremental_span_check(
            seen.select("doc_id", "text"),
            acc_docs,
            anchors_corpus=standing_anchors.select("doc_id", "i", "__h"),
            anchors_incoming=inc_anchors,
        )
        intra_spans = neardup.substring_dup_spans(
            acc_docs, anchors=inc_anchors
        )
        cut = neardup.span_cut(
            acc_docs, spans=std_spans.unionByName(intra_spans)
        ).persist(StorageLevel.MEMORY_AND_DISK)
        accepted = accepted.drop("text").join(
            cut.select("doc_id", F.col("cut_text").alias("text")),
            "doc_id",
        )

    # 3. split-stable assignment (pure function of doc_id — see above)
    accepted = curation.dataset_split(accepted, "doc_id")
    n_tokens = F.array_size(F.split(F.col("text"), " ")).cast("long")
    accepted = accepted.withColumn("n_tokens", n_tokens)

    # 4. token-balanced shard APPEND: deal increment ranks (token desc)
    # round-robin across shards ordered lightest-first by the standing
    # load of the PRECEDING intervals only — a pure function of the
    # runs before this one, so re-running an old day re-deals against
    # exactly the loads its original run saw (full state convergence,
    # not just the accepted set)
    prior = _read_state_or_empty(
        spark,
        corpus_path,
        "doc_id long, n_tokens long, shard_id long, __run string",
    ).filter(F.col("__run") != run_id)
    if min_inc is not None:
        prior = prior.filter(F.col("doc_id") < min_inc)
    standing = {
        r["shard_id"]: r["t"]
        for r in prior.groupBy("shard_id")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    order = sorted(
        range(n_shards), key=lambda s: (standing.get(s, 0), s)
    )
    n_std = std_dup.count()
    n_dropped = dropped.count()
    if n_quality - n_dropped == 0:
        # idle/no-survivor day: nothing to rank (global_row_number's
        # offset map is undefined over zero rows) — emit the empty
        # frame with the output schema
        out = accepted.withColumn("shard_id", F.lit(0).cast("long"))
    else:
        ranked = global_row_number(
            accepted.withColumn("__neg_nt", -F.col("n_tokens")),
            ["__neg_nt", "doc_id"],
        )
        deal = F.element_at(
            F.array(*[F.lit(s) for s in order]),
            ((F.col("__rn") - 1) % n_shards + 1).cast("int"),
        )
        out = ranked.withColumn("shard_id", deal.cast("long")).drop(
            "__neg_nt", "__rn"
        )

    # 5. per-run AUDIT: every increment doc gets exactly one verdict
    # reason (precedence quality > standing dup > intra dup > accepted) —
    # the daily provenance slice next to the corpus, same discipline as
    # the batch dedup_provenance_rollup (reasons are run-local here:
    # quality_reject never reaches the dedup index, so the families are
    # disjoint by construction except the two dup sides, which the
    # left-anti below makes exclusive too)
    audit = (
        inc.select("doc_id", "source")
        .join(inc_q.select("doc_id").withColumn("__q", F.lit(True)), "doc_id", "left")
        .join(std_dup.withColumn("__std", F.lit(True)), "doc_id", "left")
        .join(intra_dup.withColumn("__intra", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.when(~F.coalesce(F.col("__q"), F.lit(False)), "quality_reject")
            .when(F.coalesce(F.col("__std"), F.lit(False)), "dup_vs_standing")
            .when(F.coalesce(F.col("__intra"), F.lit(False)), "dup_within_increment")
            .otherwise("accepted")
            .alias("reason"),
        )
    )

    # 6. date-window delete+insert: each run owns its __run partition
    # (seen rows carry the full EVOLVED column set)
    inc_q.select(*inc_cols).write.mode(
        "overwrite"
    ).parquet(f"{seen_path}/__run={run_id}")
    out.write.mode("overwrite").parquet(f"{corpus_path}/__run={run_id}")
    audit.write.mode("overwrite").parquet(f"{state_dir}/audit/__run={run_id}")

    n_intra = n_dropped - n_std
    appended = spark.read.parquet(f"{corpus_path}/__run={run_id}").count()
    stats = {
        "increment": n_inc,
        "after_quality": n_quality,
        "dup_vs_standing": n_std,
        "dup_within_increment": n_intra,
        "appended": appended,
    }
    if cut_spans:
        # the run's anchor slice (ORIGINAL accepted texts) joins the
        # standing index; the per-doc cut accounting ships next to the
        # audit slice. Both own their __run partition (idempotent
        # delete+insert like every other state table).
        inc_anchors.select(
            "doc_id", F.col("i").cast("long").alias("i"), "__h"
        ).write.mode("overwrite").parquet(f"{anchors_path}/__run={run_id}")
        cut.select(
            "doc_id", "orig_chars", "spans_cut", "chars_removed"
        ).write.mode("overwrite").parquet(
            f"{state_dir}/span_cuts/__run={run_id}"
        )
        totals = cut.agg(
            F.coalesce(F.sum("spans_cut"), F.lit(0)).alias("s"),
            F.coalesce(F.sum("chars_removed"), F.lit(0)).alias("c"),
        ).collect()[0]
        stats["spans_cut"] = int(totals["s"])
        stats["chars_removed"] = int(totals["c"])
        for handle in (acc_docs, inc_anchors, cut):
            handle.unpersist(blocking=False)
    for handle in (inc_q, std_dup, intra_dup, dropped):
        handle.unpersist(blocking=False)
    return stats


def rebuild_corpus(
    spark: SparkSession,
    all_docs: DataFrame,
    model: dict,
    jaccard_tau: float = 0.6,
    cut_spans: bool = False,
) -> DataFrame:
    """Batch rebuild on the full union — the merge≡recompute reference
    for :func:`run_daily_increment` (pytest-pinned equal). Same rules,
    batch plans: standing-model score (identical row-local expression),
    keep-first greedy dedup as one pair-table anti-join (doc dropped iff
    a quality-passing smaller-id neighbor exists at tau), split by id
    hash. ``cut_spans=True`` additionally cuts every ExactSubstr maximal
    span from its non-canonical carrier among the KEPT docs (one
    pairs-mode span_cut over the survivors — the batch twin of the daily
    standing-anchor probe, pinned equal). Returns the accepted per-doc
    frame (doc_id, source, text, log_odds, split, n_tokens), with
    ``text`` the cut form under the flag."""
    docs = all_docs.select("doc_id", "source", "text")
    scored = curation.score_docs_with_model(docs, model)
    q = docs.join(
        scored.filter(F.col("pred_curated")).select("doc_id", "log_odds"),
        "doc_id",
    )
    dropped = (
        neardup.ngram_jaccard_pairs(q.select("doc_id", "text"), jaccard_tau)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = q.join(dropped, "doc_id", "left_anti")
    if cut_spans:
        cut = neardup.span_cut(kept.select("doc_id", "text"))
        kept = kept.drop("text").join(
            cut.select("doc_id", F.col("cut_text").alias("text")),
            "doc_id",
        )
    kept = curation.dataset_split(kept, "doc_id")
    return kept.withColumn(
        "n_tokens", F.array_size(F.split(F.col("text"), " ")).cast("long")
    )


def export_corpus(
    spark: SparkSession, state_dir: str, out_path: str
) -> dict[str, int]:
    """Materialize the standing incremental corpus as training shards:
    one parquet file per shard_id (sinks.writers.write_training_shards —
    per-shard token balance becomes data-loader wall-clock balance),
    dropping the run-bookkeeping partition column. The hand-off point
    between the continuously-maintained state and a training job's
    input manifest; returns {docs, shards} for the run report."""
    corpus = read_corpus_state(spark, state_dir).drop("__run")
    write_training_shards(corpus, out_path, order_col="doc_id")
    back = spark.read.parquet(out_path)
    return {
        "docs": back.count(),
        "shards": back.select("shard_id").distinct().count(),
    }


def validate_corpus_state(
    spark: SparkSession, state_dir: str, strict: bool = False
) -> dict[str, list[str]]:
    """Integrity audit of a standing incremental state dir — the check a
    corpus owner runs before trusting a year of daily runs (the engine
    analog of the reference's reconciliation validators,
    snowflake_bq_deduplication_sync.py:270 and the diagnostic SQL pack):
    every invariant the pipeline RELIES on is re-verified from the
    tables themselves, not from bookkeeping.

    Checks (key -> list of human-readable violations, empty == healthy):

    - ``runs``: every corpus/audit ``__run`` partition has a seen slice
      (seen is the dedup index — a corpus run without one would be
      invisible to future dedup); span tables are either absent (uncut
      state) or cover exactly the seen runs (cut state).
    - ``intervals``: per-run [min,max] doc_id intervals are pairwise
      disjoint across seen runs — the keep-first contract.
    - ``membership``: corpus doc_ids are unique and a subset of seen;
      audit rows cover every seen doc of their run.
    - ``splits``: each corpus doc's stored split equals the
      deterministic hash assignment (split stability re-derived).
    - ``conservation`` (cut state only): for every corpus doc,
      len(text) == orig_chars - chars_removed from its span_cuts row.

    ``strict=True`` raises ValueError listing every violation instead of
    returning them. Scale: one pass over each state table; per-run
    reductions land O(runs) rows on the driver, never documents.
    """
    _require_local_state_dir("validate_corpus_state", state_dir)
    report: dict[str, list[str]] = {
        "runs": [], "intervals": [], "membership": [],
        "splits": [], "conservation": [],
    }

    def _tbl_runs(table: str) -> set[str]:
        import os

        tdir = f"{state_dir}/{table}"
        if not os.path.isdir(tdir):
            return set()
        return {
            p.split("=", 1)[1]
            for p in os.listdir(tdir)
            if p.startswith("__run=") and ".old." not in p
        }

    seen_runs = _tbl_runs("seen")
    corpus_runs, audit_runs = _tbl_runs("corpus"), _tbl_runs("audit")
    anchor_runs, cuts_runs = _tbl_runs("span_anchors"), _tbl_runs("span_cuts")
    for tbl, runs in (("corpus", corpus_runs), ("audit", audit_runs)):
        for r in sorted(runs - seen_runs):
            report["runs"].append(f"{tbl} run {r!r} has no seen slice")
    cut_mode = bool(anchor_runs or cuts_runs)
    if cut_mode:
        for name, runs in (
            ("span_anchors", anchor_runs), ("span_cuts", cuts_runs)
        ):
            missing = seen_runs - runs
            extra = runs - seen_runs
            for r in sorted(missing):
                report["runs"].append(f"{name} missing run {r!r}")
            for r in sorted(extra):
                report["runs"].append(f"{name} has orphan run {r!r}")

    seen = _read_state_or_empty(
        spark, f"{state_dir}/seen", "doc_id long, __run string"
    ).select("doc_id", "__run")
    bounds = (
        seen.groupBy("__run")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    # idle-day runs write an empty seen slice (lo/hi NULL) — no interval
    ordered = sorted(
        (r for r in bounds if r["lo"] is not None),
        key=lambda r: (r["lo"], r["hi"]),
    )
    for a, b in zip(ordered, ordered[1:]):
        if b["lo"] <= a["hi"]:
            report["intervals"].append(
                f"runs {a['__run']!r} [{a['lo']},{a['hi']}] and "
                f"{b['__run']!r} [{b['lo']},{b['hi']}] overlap"
            )

    corpus = read_corpus_state(spark, state_dir)
    n_corpus = corpus.count()
    n_ids = corpus.select("doc_id").distinct().count()
    if n_ids != n_corpus:
        report["membership"].append(
            f"corpus carries {n_corpus - n_ids} duplicate doc_id row(s)"
        )
    orphans = corpus.join(
        seen.select("doc_id"), "doc_id", "left_anti"
    ).count()
    if orphans:
        report["membership"].append(
            f"{orphans} corpus doc(s) absent from the seen index"
        )
    audit = _read_state_or_empty(
        spark, f"{state_dir}/audit", "doc_id long, __run string"
    )
    # audit covers every seen doc of its run (seen keeps only
    # quality-passing docs; the audit additionally has quality rejects,
    # so seen \ audit must be empty per run)
    uncovered = seen.join(
        audit.select("doc_id"), "doc_id", "left_anti"
    ).count()
    if uncovered:
        report["membership"].append(
            f"{uncovered} seen doc(s) missing from the audit"
        )

    expected = curation.dataset_split(
        corpus.select("doc_id", F.col("split").alias("__stored")), "doc_id"
    )
    drifted = expected.filter(F.col("split") != F.col("__stored")).count()
    if drifted:
        report["splits"].append(
            f"{drifted} corpus doc(s) whose stored split differs from "
            "the deterministic hash assignment"
        )

    if cut_mode:
        cuts = _read_state_or_empty(
            spark,
            f"{state_dir}/span_cuts",
            "doc_id long, orig_chars long, spans_cut long, "
            "chars_removed long, __run string",
        )
        joined = corpus.select(
            "doc_id", F.length("text").cast("long").alias("__len")
        ).join(
            cuts.select("doc_id", "orig_chars", "chars_removed"),
            "doc_id",
            "left",
        )
        missing_cut = joined.filter(F.col("orig_chars").isNull()).count()
        if missing_cut:
            report["conservation"].append(
                f"{missing_cut} corpus doc(s) with no span_cuts "
                "accounting row"
            )
        broken = joined.filter(
            F.col("orig_chars").isNotNull()
            & (
                F.col("__len")
                != F.col("orig_chars") - F.col("chars_removed")
            )
        ).count()
        if broken:
            report["conservation"].append(
                f"{broken} corpus doc(s) violating chars_kept == "
                "orig_chars - chars_removed"
            )

    if strict and any(report.values()):
        lines = [v for vs in report.values() for v in vs]
        raise ValueError(
            "validate_corpus_state: " + "; ".join(lines)
        )
    return report


def span_cut_report(spark: SparkSession, state_dir: str) -> DataFrame:
    """Per-run rollup of the daily span-cut accounting — the standing-
    state analog of the batch ``span_cut_rollup`` query: one row per
    ``__run`` with docs_touched / spans_cut / chars removed+kept and the
    removal fraction, read straight off ``{state_dir}/span_cuts`` (no
    text is re-read; the accounting table IS the evidence the
    conservation pytest checks). Returns an empty frame with the same
    schema for an uncut state dir."""
    cuts = _read_state_or_empty(
        spark,
        f"{state_dir}/span_cuts",
        "doc_id long, orig_chars long, spans_cut long, "
        "chars_removed long, __run string",
    )
    return (
        cuts.groupBy("__run")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum((F.col("spans_cut") > 0).cast("long")).alias(
                "docs_touched"
            ),
            F.sum("spans_cut").alias("spans_cut"),
            F.sum("orig_chars").alias("chars_in"),
            F.sum("chars_removed").alias("chars_removed"),
            (F.sum("orig_chars") - F.sum("chars_removed")).alias(
                "chars_kept"
            ),
            F.round(
                F.sum("chars_removed")
                / F.greatest(F.sum("orig_chars"), F.lit(1)),
                6,
            ).alias("removed_frac"),
        )
        .orderBy("__run")
    )


def export_packed_corpus(
    spark: SparkSession,
    state_dir: str,
    out_path: str,
    budget: int = curation.PACK_BUDGET,
) -> dict[str, int]:
    """Materialize the standing corpus as PACKED fixed-length training
    sequences — the actual LM-training handoff: GPT-style concat-and-
    chunk per split (documents concatenated in doc_id order, sliced into
    ``budget``-token windows; every pack but a split's last holds exactly
    ``budget`` tokens, docs cross pack boundaries rather than pad).

    Output rows: (split, pack_id, tokens array<string>, n_tokens,
    doc_spans array<struct<doc_id, start, end>>) — doc_spans is the
    provenance map (token half-open interval each doc occupies inside
    the pack), so a loss-masking or attribution pass can recover doc
    boundaries without re-reading the corpus. Conservation and exact
    reconstruction (pack-order tokens == doc-order tokens, per split)
    are pytest-pinned. Tokenization is the pipeline's own n_tokens rule
    (whitespace split), so pack token mass equals the corpus n_tokens
    mass it was sharded by.

    Scale posture: NO token-level explode — each doc row computes its
    global start offset with the TWO-PHASE grouped prefix sum
    (operators/prefix.grouped_prefix_sum — the 90%-train split IS the
    one-dominant-group shape a plain per-split window would serialize
    into a single task), then emits only its ceil(spanned-packs) CHUNK
    rows via an array slice (rows ~ docs + boundary crossings, never ~
    tokens); one shuffle groups chunks into packs; output written
    partitioned by split.
    """
    from .operators.prefix import grouped_prefix_sum

    corpus = read_corpus_state(spark, state_dir).select(
        "doc_id", "split", "text"
    )
    toks = F.split(F.col("text"), " ")
    nt = F.array_size(toks).cast("long")
    docs = grouped_prefix_sum(
        corpus.select(
            "doc_id", "split", toks.alias("__toks"), nt.alias("__nt")
        ),
        group_cols=["split"],
        order_cols=["doc_id"],
        value_col="__nt",
        out_col="__cum",
    ).withColumn("__start", F.col("__cum") - F.col("__nt"))
    # each doc spans packs floor(start/B) .. floor((start+nt-1)/B); emit
    # one CHUNK row per spanned pack with the doc's token slice for it
    first_p = F.floor(F.col("__start") / budget)
    last_p = F.floor((F.col("__start") + F.col("__nt") - 1) / budget)
    chunks = (
        docs.filter(F.col("__nt") > 0)
        .select(
            "doc_id",
            "split",
            "__toks",
            "__nt",
            "__start",
            F.explode(F.sequence(first_p, last_p)).alias("pack_id"),
        )
        .select(
            "split",
            "pack_id",
            "doc_id",
            # token interval of THIS doc that lands in THIS pack,
            # 0-based within the doc: [lo, hi)
            F.greatest(
                F.col("pack_id") * budget - F.col("__start"), F.lit(0)
            ).alias("__lo"),
            F.least(
                (F.col("pack_id") + 1) * budget - F.col("__start"),
                F.col("__nt"),
            ).alias("__hi"),
            # offset of the chunk inside the pack (orders chunks)
            F.greatest(
                F.col("__start") - F.col("pack_id") * budget, F.lit(0)
            ).alias("__off"),
            F.col("__toks"),
        )
        .select(
            "split",
            "pack_id",
            "doc_id",
            "__off",
            F.slice(
                F.col("__toks"),
                (F.col("__lo") + 1).cast("int"),
                (F.col("__hi") - F.col("__lo")).cast("int"),
            ).alias("__chunk"),
        )
    )
    packs = (
        chunks.groupBy("split", "pack_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__off"), F.col("doc_id"), F.col("__chunk")
                    )
                )
            ).alias("__parts")
        )
        .select(
            "split",
            "pack_id",
            F.flatten(F.col("__parts.__chunk")).alias("tokens"),
            F.transform(
                F.col("__parts"),
                lambda p: F.struct(
                    p["doc_id"].alias("doc_id"),
                    p["__off"].alias("start"),
                    (p["__off"] + F.array_size(p["__chunk"])).alias(
                        "end"
                    ),
                ),
            ).alias("doc_spans"),
        )
        .withColumn("n_tokens", F.array_size(F.col("tokens")).cast("long"))
    )
    packs.write.mode("overwrite").partitionBy("split").parquet(out_path)
    back = spark.read.parquet(out_path)
    agg = back.agg(
        F.count(F.lit(1)).alias("packs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("tokens"),
    ).collect()[0]
    return {"packs": int(agg["packs"]), "tokens": int(agg["tokens"])}


def compact_corpus(
    spark: SparkSession,
    state_dir: str,
    target_bytes_per_file: int = 128 * 1024 * 1024,
) -> dict[str, dict[str, int]]:
    """Small-file maintenance for the standing incremental state: a year
    of daily runs leaves 365 ``__run=`` partitions of shard-fragmented
    small files whose open/footer overhead dominates scans (the Delta
    OPTIMIZE / Iceberg rewrite_data_files pass, applied to this layout).

    Compaction is PER PARTITION — each ``__run=<id>`` directory rewrites
    through ``sinks.writers.compact_path``'s crash-safe two-rename swap
    — so the ``__run`` provenance the idempotent delete+insert discipline
    depends on survives verbatim: a post-compaction re-run of an OLD day
    still overwrites exactly its own partition and converges
    (pytest-pinned), and the audit slices stay addressable by run.
    Returns per-table ``{files_before, files_after}``.

    Scale posture: each partition rewrite is one coalesce (no shuffle);
    partitions compact independently, so the maintenance pass
    parallelizes across days and never rewrites surviving data more
    than once. ``_schema.json`` and in-flight ``.compact_*`` temp dirs
    are untouched; a dangling ``.old.*`` from a crashed prior swap is
    healed by ``compact_path`` itself on the next pass.
    """
    import os

    from .sinks.writers import _recover_dangling_swap, compact_path

    _require_local_state_dir("compact_corpus", state_dir)

    def _n_parquet(root: str) -> int:
        return sum(
            1
            for r, _d, files in os.walk(root)
            for f in files
            if f.endswith(".parquet")
        )

    report: dict[str, dict[str, int]] = {}
    for table in ("seen", "corpus", "audit", "span_anchors", "span_cuts"):
        tdir = f"{state_dir}/{table}"
        if not os.path.isdir(tdir):
            continue
        # heal any crash-dangling swap FIRST: a leftover
        # `__run=<id>.old.<hex>` dir must be recovered/dropped via its
        # BASE partition path — treating it as a partition of its own
        # would "compact" it into a bogus __run value
        for part in sorted(os.listdir(tdir)):
            if part.startswith("__run=") and ".old." in part:
                _recover_dangling_swap(
                    os.path.join(tdir, part.split(".old.")[0])
                )
        before = _n_parquet(tdir)
        for part in sorted(os.listdir(tdir)):
            pdir = os.path.join(tdir, part)
            if (
                part.startswith("__run=")
                and ".old." not in part
                and os.path.isdir(pdir)
                # already-compact partitions skip the rewrite — the
                # maintenance pass touches each day's data once, not on
                # every subsequent invocation
                and sum(
                    1 for f in os.listdir(pdir) if f.endswith(".parquet")
                )
                > 1
            ):
                compact_path(spark, pdir, target_bytes_per_file)
        report[table] = {
            "files_before": before,
            "files_after": _n_parquet(tdir),
        }
    return report
