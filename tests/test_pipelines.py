"""End-to-end training-corpus pipeline: stage accounting, idempotence,
and output-shape invariants over the composed (already oracle-gated)
operators."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark import pipelines
from snowflake_to_bq_pipeline_spark.catalog import load_table


def test_build_training_corpus_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    stats = pipelines.build_training_corpus(
        spark, sf_dir, out, n_shards=4
    )
    # Monotone funnel: every stage can only drop documents.
    order = [
        "input",
        "after_quality",
        "after_exact_dedup",
        "after_fuzzy_dedup",
        "after_mix_sample",
        "written",
    ]
    vals = [stats[k] for k in order]
    assert vals == sorted(vals, reverse=True), stats
    assert stats["written"] == stats["after_mix_sample"]
    assert stats["written"] > 0
    # split-leakage QA stage: held-out slice exists and is bounded by the
    # curated corpus; after exact+fuzzy dedup residual leakage is a small
    # fraction of the held-out docs
    assert 0 < stats["heldout_docs"] < stats["after_mix_sample"]
    assert stats["heldout_leaked"] <= stats["heldout_docs"]

    # Physical layout: one file per (non-empty) shard.
    shard_dirs = glob.glob(out + "/shard_id=*")
    assert 0 < len(shard_dirs) <= 4
    for d in shard_dirs:
        assert len(glob.glob(d + "/*.parquet")) == 1

    # Provenance audit ships next to the corpus: every INPUT doc gets
    # exactly one reason; stage deltas equal reason counts; kept ==
    # written selection.
    audit = {r.doc_id: r for r in spark.read.parquet(out + "_audit").collect()}
    assert stats["audit_rows"] == stats["input"] == len(audit)
    from collections import Counter

    reasons = Counter(r.reason for r in audit.values())
    assert reasons["quality_reject"] == stats["input"] - stats["after_quality"]
    assert reasons["exact_dup"] == stats["after_quality"] - stats["after_exact_dedup"]
    assert reasons["near_dup"] == stats["after_exact_dedup"] - stats["after_fuzzy_dedup"]
    assert reasons["sampled_out"] == stats["after_fuzzy_dedup"] - stats["after_mix_sample"]
    assert reasons["kept"] == stats["after_mix_sample"]
    kept_ids = {d for d, r in audit.items() if r.keep}
    assert all((r.reason == "kept") == r.keep for r in audit.values())

    # Written docs are a subset of the input with text intact.
    back = spark.read.parquet(out)
    src = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("src_text")
    )
    joined = back.join(src, "doc_id")
    assert joined.count() == stats["written"]
    assert joined.filter(F.col("text") != F.col("src_text")).count() == 0
    assert {r.doc_id for r in back.select("doc_id").collect()} == kept_ids

    # Determinism: a second run reproduces the identical selection.
    out2 = str(tmp_path / "corpus2")
    stats2 = pipelines.build_training_corpus(
        spark, sf_dir, out2, n_shards=4
    )
    assert stats2 == stats
    a = {tuple(r) for r in back.select("doc_id", "shard_id").collect()}
    b = {
        tuple(r)
        for r in spark.read.parquet(out2).select("doc_id", "shard_id").collect()
    }
    assert a == b


def test_cli_list_and_run(tmp_path):
    import json as _json
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "snowflake_to_bq_pipeline_spark", "list"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0
    lines = dict(
        l.split("\t") for l in r.stdout.strip().splitlines() if "\t" in l
    )
    assert "budget_vs_actual" in lines and lines["budget_vs_actual"] == "oracle"

    out = str(tmp_path / "cli_out")
    r = subprocess.run(
        [
            sys.executable, "-m", "snowflake_to_bq_pipeline_spark",
            "run", "row_count_by_day", "--out", out,
        ],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = _json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["rows"] > 0


def _inc_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


CUR = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lam mu nu xi omicron pi rho sigma tau upsilon"
)
# Interior words affect 3 shingles each; 2 changes -> jaccard 0.5 and
# 3 changes -> 1/3, both under tau=0.6 (an EDGE-word change would only
# touch 1-2 shingles and leave the text a 0.8-jaccard near-dup).
CUR2 = CUR.replace("delta", "phi").replace("rho", "chi")
CUR3 = (
    CUR.replace("zeta", "qq1")
    .replace("omicron", "qq2")
    .replace("sigma", "qq3")
)
CUR4 = (
    CUR.replace("gamma", "rr1")
    .replace("iota", "rr2")
    .replace("pi ", "rr3 ")
)
GARBAGE = "zz qq xx ww vv uu tt ss rr pp oo nn mm ll kk jj ii hh gg ff"


def _state_rows(spark, state_dir):
    corpus = spark.read.parquet(f"{state_dir}/corpus")
    seen = spark.read.parquet(f"{state_dir}/seen")
    return (
        sorted(
            tuple(r)
            for r in corpus.select(
                "doc_id", "source", "split", "shard_id", "log_odds"
            ).collect()
        ),
        sorted(
            tuple(r) for r in seen.select("doc_id", "source").collect()
        ),
    )


def _fixture(spark):
    """Base model + two increments with quality rejects, an intra-
    increment dup, a standing dup, and a NEAR (one-word-off) standing
    dup."""
    from snowflake_to_bq_pipeline_spark.operators import curation

    base = _inc_df(
        spark,
        [(i, "cur", CUR) for i in range(1, 21)]
        + [(i, "raw", GARBAGE) for i in range(21, 41)],
    )
    model = curation.train_nbq_model(base, ("cur",))
    inc_a = _inc_df(
        spark,
        [
            (101, "raw", CUR),            # keep
            (102, "raw", CUR2),           # keep
            (103, "raw", CUR),            # intra dup of 101 -> drop
            (104, "raw", GARBAGE),        # quality reject
            (105, "raw", CUR3),           # keep
        ],
    )
    near_cur = CUR.replace("kappa", "lambda2")  # ~0.85 jaccard vs CUR
    inc_b = _inc_df(
        spark,
        [
            (201, "raw", CUR2),           # standing dup of 102 -> drop
            (202, "raw", CUR4),           # keep
            (203, "raw", CUR4),           # intra dup of 202 -> drop
            (204, "raw", GARBAGE),        # quality reject
            (205, "raw", near_cur),       # NEAR standing dup of 101 -> drop
        ],
    )
    return model, inc_a, inc_b


def test_daily_increment_funnel_and_idempotent_rerun(spark, tmp_path):
    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b = _fixture(spark)
    state = str(tmp_path / "state")
    s1 = pipelines.run_daily_increment(spark, state, inc_a, "d1", model)
    assert s1 == {
        "increment": 5,
        "after_quality": 4,
        "dup_vs_standing": 0,
        "dup_within_increment": 1,
        "appended": 3,
    }
    s2 = pipelines.run_daily_increment(spark, state, inc_b, "d2", model)
    assert s2 == {
        "increment": 5,
        "after_quality": 4,
        "dup_vs_standing": 2,
        "dup_within_increment": 1,
        "appended": 1,
    }
    before = _state_rows(spark, state)
    # idempotent re-run of the same day: delete+insert of its own
    # partition converges to the identical state AND identical stats
    s2_again = pipelines.run_daily_increment(
        spark, state, inc_b, "d2", model
    )
    assert s2_again == s2
    assert _state_rows(spark, state) == before
    # dedup-dropped docs stay in the standing index (seen), quality
    # rejects do not
    seen_ids = {t[0] for t in before[1]}
    assert seen_ids == {101, 102, 103, 105, 201, 202, 203, 205}


def test_daily_increments_equal_batch_rebuild_on_union(spark, tmp_path):
    """Merge ≡ recompute: increment-then-increment must accept exactly
    the docs one batch rebuild on the union accepts, with identical
    scores and split assignments (the property the sync family pins for
    MERGE; shard ids are run-order state by design and excluded)."""
    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b = _fixture(spark)
    state = str(tmp_path / "state")
    pipelines.run_daily_increment(spark, state, inc_a, "d1", model)
    pipelines.run_daily_increment(spark, state, inc_b, "d2", model)
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{state}/corpus")
        .select("doc_id", "source", "log_odds", "split", "n_tokens")
        .collect()
    )
    rebuilt = pipelines.rebuild_corpus(
        spark, inc_a.unionByName(inc_b), model
    )
    want = sorted(
        tuple(r)
        for r in rebuilt.select(
            "doc_id", "source", "log_odds", "split", "n_tokens"
        ).collect()
    )
    assert got == want
    assert len(got) == 4  # 101, 102, 105, 202


def test_daily_increment_contract_and_shard_balance(spark, tmp_path):
    from snowflake_to_bq_pipeline_spark import pipelines
    import pytest

    model, inc_a, inc_b = _fixture(spark)
    state = str(tmp_path / "state")
    pipelines.run_daily_increment(
        spark, state, inc_a, "d1", model, n_shards=2
    )
    # id-interval contract: replaying day-1 ids under a DIFFERENT run id
    # would double-own the interval and must fail loudly (replaying the
    # SAME run id is the legal delete+insert re-run)
    with pytest.raises(ValueError, match="intervals must be disjoint"):
        pipelines.run_daily_increment(
            spark, state, inc_a, "d9", model, n_shards=2
        )
    # a FIRST-TIME run slotted below existing ids could not retroactively
    # drop the later-id standing docs batch recompute would drop — raises
    low = _inc_df(spark, [(50, "raw", CUR4), (51, "raw", GARBAGE)])
    with pytest.raises(ValueError, match="above every seen id"):
        pipelines.run_daily_increment(
            spark, state, low, "d0", model, n_shards=2
        )
    # shard append deals lightest-first: with 2 shards and 3 docs in d1,
    # shard totals differ by at most one doc; the d2 append must land on
    # the lighter shard
    corpus = spark.read.parquet(f"{state}/corpus")
    tot = {
        r["shard_id"]: r["t"]
        for r in corpus.groupBy("shard_id")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    lightest = min(sorted(tot), key=lambda s: (tot[s], s))
    pipelines.run_daily_increment(
        spark, state, inc_b, "d2", model, n_shards=2
    )
    appended = spark.read.parquet(f"{state}/corpus").filter(
        F.col("__run") == "d2"
    )
    assert [r.shard_id for r in appended.collect()] == [lightest]


def test_daily_increment_audit_slice_conserves_and_classifies(
    spark, tmp_path
):
    """Every increment doc gets exactly one audit verdict; reasons are
    mutually exclusive by precedence and agree with the funnel stats
    and the corpus content."""
    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b = _fixture(spark)
    state = str(tmp_path / "state")
    pipelines.run_daily_increment(spark, state, inc_a, "d1", model)
    s2 = pipelines.run_daily_increment(spark, state, inc_b, "d2", model)
    audit = {
        r.doc_id: r.reason
        for r in spark.read.parquet(f"{state}/audit")
        .filter(F.col("__run") == "d2")
        .collect()
    }
    assert set(audit) == {r.doc_id for r in inc_b.collect()}
    from collections import Counter

    counts = Counter(audit.values())
    assert counts["quality_reject"] == s2["increment"] - s2["after_quality"]
    assert counts["dup_vs_standing"] == s2["dup_vs_standing"]
    assert counts["dup_within_increment"] == s2["dup_within_increment"]
    assert counts["accepted"] == s2["appended"]
    accepted = {
        r.doc_id
        for r in spark.read.parquet(f"{state}/corpus")
        .filter(F.col("__run") == "d2")
        .collect()
    }
    assert {d for d, r in audit.items() if r == "accepted"} == accepted


def test_export_corpus_one_file_per_shard(spark, tmp_path):
    import glob

    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b = _fixture(spark)
    state = str(tmp_path / "state")
    pipelines.run_daily_increment(spark, state, inc_a, "d1", model, n_shards=2)
    pipelines.run_daily_increment(spark, state, inc_b, "d2", model, n_shards=2)
    out = str(tmp_path / "export")
    rep = pipelines.export_corpus(spark, state, out)
    assert rep["docs"] == 4 and 1 <= rep["shards"] <= 2
    for d in glob.glob(out + "/shard_id=*"):
        assert len(glob.glob(d + "/*.parquet")) == 1
    got = {
        r.doc_id
        for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert got == {101, 102, 105, 202}


def test_daily_increment_empty_increment_is_a_noop_run(spark, tmp_path):
    """An empty increment (idle day) must run cleanly: zero-row
    partitions, no verdicts, standing state untouched."""
    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, _ = _fixture(spark)
    state = str(tmp_path / "state")
    pipelines.run_daily_increment(spark, state, inc_a, "d1", model)
    before = _state_rows(spark, state)
    empty = _inc_df(spark, [])
    s = pipelines.run_daily_increment(spark, state, empty, "d2", model)
    assert s == {
        "increment": 0,
        "after_quality": 0,
        "dup_vs_standing": 0,
        "dup_within_increment": 0,
        "appended": 0,
    }
    assert _state_rows(spark, state) == before


def test_old_day_rerun_converges_fully_after_later_days(spark, tmp_path):
    """Re-running a COMMITTED old day after later days exist must
    converge to the identical full state — including shard_ids, because
    the deal reads only the PRECEDING intervals' standing loads (a pure
    function of the runs before it, not of wall-clock history)."""
    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b = _fixture(spark)
    state = str(tmp_path / "state")
    s1 = pipelines.run_daily_increment(spark, state, inc_a, "d1", model)
    pipelines.run_daily_increment(spark, state, inc_b, "d2", model)
    before = _state_rows(spark, state)
    s1_again = pipelines.run_daily_increment(
        spark, state, inc_a, "d1", model
    )
    assert s1_again == s1
    assert _state_rows(spark, state) == before


def _inc_df_with(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_daily_increment_schema_evolution_add_column(spark, tmp_path):
    """r13 verdict ask #4: an increment arriving with an added nullable
    column evolves the standing corpus schema — old runs back-fill NULL,
    the evolved schema persists, increment≡rebuild holds across the
    evolution boundary, and re-running a PRE-evolution day converges."""
    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b = _fixture(spark)
    state = str(tmp_path / "state")
    pipelines.run_daily_increment(spark, state, inc_a, "d1", model)
    # day 2 ships a new nullable metadata column
    inc_b_url = _inc_df_with(
        spark,
        [
            (r.doc_id, r.source, r.text, f"https://x/{r.doc_id}")
            for r in inc_b.collect()
        ],
        "doc_id long, source string, text string, url string",
    )
    pipelines.run_daily_increment(spark, state, inc_b_url, "d2", model)
    seen = spark.read.schema(
        "doc_id long, source string, text string, url string, __run string"
    ).parquet(f"{state}/seen")
    by_run = {
        (r.doc_id, r["__run"]): r.url for r in seen.collect()
    }
    assert all(v is None for (d, rn), v in by_run.items() if rn == "d1")
    assert all(
        v == f"https://x/{d}" for (d, rn), v in by_run.items() if rn == "d2"
    )
    stored = pipelines._load_state_schema(state)
    assert [f.name for f in stored.fields] == [
        "doc_id", "source", "text", "url",
    ]
    # the accepted corpus carries the evolved column too — through the
    # schema-aware state reader (a plain root read adopts one arbitrary
    # footer's schema and would drop it)
    corpus = pipelines.read_corpus_state(spark, state)
    assert "url" in corpus.columns
    urls = {r.doc_id: r.url for r in corpus.collect()}
    assert urls[202] == "https://x/202"  # d2 acceptee carries its value
    assert urls[101] is None             # d1 rows back-fill NULL
    # increment≡rebuild across the boundary (union aligned the same way)
    union = inc_a.unionByName(inc_b_url, allowMissingColumns=True)
    got = sorted(
        tuple(r)
        for r in corpus.select(
            "doc_id", "source", "log_odds", "split", "n_tokens"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in pipelines.rebuild_corpus(spark, union, model)
        .select("doc_id", "source", "log_odds", "split", "n_tokens")
        .collect()
    )
    assert got == want and len(got) == 4
    # re-running the PRE-evolution day with its ORIGINAL schema aligns
    # (url -> NULL) and converges to the identical standing state
    before = _state_rows(spark, state)
    pipelines.run_daily_increment(spark, state, inc_a, "d1", model)
    assert _state_rows(spark, state) == before
    assert pipelines._load_state_schema(state).fieldNames() == stored.fieldNames()


def test_daily_increment_schema_evolution_widened_type(spark, tmp_path):
    """A widenable type change (int -> bigint) widens the standing schema
    in place: old runs read through the parquet reader's type promotion,
    new runs write the wide type, one read covers both."""
    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b = _fixture(spark)
    state = str(tmp_path / "state")
    inc_a_i = _inc_df_with(
        spark,
        [(r.doc_id, r.source, r.text, int(r.doc_id) * 10) for r in inc_a.collect()],
        "doc_id long, source string, text string, score int",
    )
    inc_b_l = _inc_df_with(
        spark,
        [(r.doc_id, r.source, r.text, int(r.doc_id) * 10) for r in inc_b.collect()],
        "doc_id long, source string, text string, score bigint",
    )
    pipelines.run_daily_increment(spark, state, inc_a_i, "d1", model)
    assert (
        pipelines._load_state_schema(state)["score"].dataType.simpleString()
        == "int"
    )
    pipelines.run_daily_increment(spark, state, inc_b_l, "d2", model)
    stored = pipelines._load_state_schema(state)
    assert stored["score"].dataType.simpleString() == "bigint"
    seen = spark.read.schema(
        "doc_id long, source string, text string, score bigint, __run string"
    ).parquet(f"{state}/seen")
    vals = {r.doc_id: r.score for r in seen.collect()}
    assert vals and all(v == d * 10 for d, v in vals.items())


def test_daily_increment_schema_flip_refuses(spark, tmp_path):
    """An incompatible type flip refuses loudly BEFORE any state is
    written — the standing state and schema stay untouched."""
    import pytest

    from snowflake_to_bq_pipeline_spark import pipelines
    from snowflake_to_bq_pipeline_spark.operators.schema_drift import (
        SchemaDriftError,
    )

    model, inc_a, inc_b = _fixture(spark)
    state = str(tmp_path / "state")
    inc_a_i = _inc_df_with(
        spark,
        [(r.doc_id, r.source, r.text, 1) for r in inc_a.collect()],
        "doc_id long, source string, text string, score int",
    )
    pipelines.run_daily_increment(spark, state, inc_a_i, "d1", model)
    before = _state_rows(spark, state)
    schema_before = pipelines._load_state_schema(state)
    inc_b_s = _inc_df_with(
        spark,
        [(r.doc_id, r.source, r.text, "high") for r in inc_b.collect()],
        "doc_id long, source string, text string, score string",
    )
    with pytest.raises(SchemaDriftError, match="incompatible"):
        pipelines.run_daily_increment(spark, state, inc_b_s, "d2", model)
    assert _state_rows(spark, state) == before
    assert (
        pipelines._load_state_schema(state).jsonValue()
        == schema_before.jsonValue()
    )
    # a required pipeline column missing is its own loud failure
    with pytest.raises(ValueError, match="missing required"):
        pipelines.run_daily_increment(
            spark, state,
            spark.createDataFrame([(900, "raw")], "doc_id long, source string"),
            "d3", model,
        )


def test_compact_corpus_preserves_reads_and_idempotence(spark, tmp_path):
    """r13 verdict ask #5: per-partition compaction drops file counts
    while reads stay identical, __run/audit provenance survives, and a
    post-compaction re-run of an OLD day still converges (idempotence
    survives compaction)."""
    import glob

    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b = _fixture(spark)
    state = str(tmp_path / "state")
    # fragment the run partitions deliberately (the daily-writer shape)
    pipelines.run_daily_increment(
        spark, state, inc_a.repartition(6), "d1", model
    )
    pipelines.run_daily_increment(
        spark, state, inc_b.repartition(6), "d2", model
    )
    before_state = _state_rows(spark, state)
    before_audit = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{state}/audit")
        .select("doc_id", "reason", "__run")
        .collect()
    )
    rep = pipelines.compact_corpus(spark, state)
    assert set(rep) == {"seen", "corpus", "audit"}
    assert all(v["files_after"] >= 1 for v in rep.values())
    total_before = sum(v["files_before"] for v in rep.values())
    total_after = sum(v["files_after"] for v in rep.values())
    assert total_after < total_before, rep
    # reads identical, provenance intact
    assert _state_rows(spark, state) == before_state
    after_audit = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{state}/audit")
        .select("doc_id", "reason", "__run")
        .collect()
    )
    assert after_audit == before_audit
    # __run directories survive as directories (the delete+insert unit)
    assert glob.glob(f"{state}/corpus/__run=d1") and glob.glob(
        f"{state}/corpus/__run=d2"
    )
    # idempotence survives compaction: re-run an OLD day, state converges
    s2_again = pipelines.run_daily_increment(spark, state, inc_b, "d2", model)
    assert s2_again["appended"] == 1
    assert _state_rows(spark, state) == before_state


def test_compact_corpus_heals_dangling_swap_and_skips_compact(spark, tmp_path):
    """A crash-dangling `__run=<id>.old.<hex>` directory is healed via its
    BASE partition (never treated as a partition of its own), and a
    second maintenance pass leaves already-compact partitions untouched."""
    import os
    import shutil

    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b = _fixture(spark)
    state = str(tmp_path / "state")
    pipelines.run_daily_increment(spark, state, inc_a.repartition(5), "d1", model)
    pipelines.run_daily_increment(spark, state, inc_b.repartition(5), "d2", model)
    before_state = _state_rows(spark, state)

    # crash AFTER the swap: target exists, .old leftover must drop
    cdir = f"{state}/corpus"
    shutil.copytree(f"{cdir}/__run=d1", f"{cdir}/__run=d1.old.deadbeef")
    # crash BEFORE the re-rename: target missing, data parked in .old
    os.rename(f"{cdir}/__run=d2", f"{cdir}/__run=d2.old.cafebabe")

    pipelines.compact_corpus(spark, state)
    entries = sorted(os.listdir(cdir))
    assert not any(".old." in e for e in entries), entries
    assert {"__run=d1", "__run=d2"} <= set(entries)
    assert _state_rows(spark, state) == before_state

    # second pass: everything already compact — no file is rewritten
    def mtimes():
        return {
            os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
            for r, _d, files in os.walk(state)
            for f in files
            if f.endswith(".parquet")
        }

    before_m = mtimes()
    rep2 = pipelines.compact_corpus(spark, state)
    assert mtimes() == before_m
    assert all(
        v["files_before"] == v["files_after"] for v in rep2.values()
    )


# --- span-grain (ExactSubstr) cutting in the daily pipeline ------------

SPAN_A = "alpha beta gamma delta epsilon zeta eta theta"      # 45 chars
SPAN_B = "iota kappa lam mu nu xi omicron pi rho sigma"       # 44 chars


def _span_fixture(spark):
    """Model + two increments where docs SHARE >=40-char spans (cross-run
    and within-run) without being whole-doc near-dups: each doc is mostly
    unique filler words around one shared CUR-order span, so jaccard
    stays far under tau while the ExactSubstr guarantee length is met."""
    from snowflake_to_bq_pipeline_spark.operators import curation

    base = _inc_df(
        spark,
        [(i, "cur", CUR) for i in range(1, 21)]
        + [(i, "raw", GARBAGE) for i in range(21, 41)],
    )
    model = curation.train_nbq_model(base, ("cur",))

    def filler(tag):
        return " ".join(f"{tag}{i}" for i in range(6))

    d301 = f"{filler('wa')} {SPAN_A} {filler('wb')}"  # canonical of SPAN_A
    inc_a = _inc_df(
        spark,
        [
            (301, "web", d301),
            (302, "web", CUR3),                        # clean control
        ],
    )
    inc_b = _inc_df(
        spark,
        [
            (401, "web", f"{filler('xa')} {SPAN_A} {filler('xb')}"),
            (402, "web", f"{filler('ya')} {SPAN_B} {filler('yb')}"),
            (403, "web", f"{filler('za')} {SPAN_B} {filler('zb')}"),
            (404, "web", GARBAGE),                     # quality reject
            (405, "web", d301.replace("wa0", "vv0")),  # whole-doc near-dup
        ],
    )
    return model, inc_a, inc_b, d301


def test_daily_span_cut_increments_equal_rebuild_and_conserve(
    spark, tmp_path
):
    """cut_spans=True: increment-then-increment equals one batch rebuild
    with cutting (text INCLUDED in the compare — the cut boundaries must
    match exactly), canonical carriers keep their copy verbatim, the
    later carrier loses it, and the span_cuts accounting conserves every
    character."""
    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b, d301 = _span_fixture(spark)
    state = str(tmp_path / "state")
    s1 = pipelines.run_daily_increment(
        spark, state, inc_a, "d1", model, cut_spans=True
    )
    assert s1["spans_cut"] == 0 and s1["chars_removed"] == 0
    s2 = pipelines.run_daily_increment(
        spark, state, inc_b, "d2", model, cut_spans=True
    )
    # 401 loses SPAN_A (carrier 301, standing), 403 loses SPAN_B
    # (carrier 402, same increment); 405 was dropped whole-doc first
    assert s2["dup_vs_standing"] == 1          # 405
    assert s2["spans_cut"] == 2
    assert s2["chars_removed"] >= len(SPAN_A) + len(SPAN_B)

    corpus = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{state}/corpus").collect()
    }
    assert set(corpus) == {301, 302, 401, 402, 403}
    # canonical carriers keep their copy verbatim
    assert corpus[301]["text"] == d301
    assert SPAN_B in corpus[402]["text"]
    # later carriers lose exactly their duplicated span
    assert SPAN_A not in corpus[401]["text"]
    assert SPAN_B not in corpus[403]["text"]
    assert "xa0" in corpus[401]["text"] and "xb5" in corpus[401]["text"]

    # conservation via the span_cuts accounting table: for every
    # accepted doc, orig_chars - chars_removed == len(written text)
    cuts = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{state}/span_cuts").collect()
    }
    assert set(cuts) == set(corpus)
    originals = {
        r["doc_id"]: r["text"]
        for r in inc_a.unionByName(inc_b).collect()
    }
    for did, row in cuts.items():
        assert row["orig_chars"] == len(originals[did])
        assert (
            row["orig_chars"] - row["chars_removed"]
            == len(corpus[did]["text"])
        )

    # increment-then-increment == batch rebuild WITH cutting, text and
    # token counts included (n_tokens counts the CUT text)
    cols = ["doc_id", "source", "text", "log_odds", "split", "n_tokens"]
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{state}/corpus").select(*cols).collect()
    )
    want = sorted(
        tuple(r)
        for r in pipelines.rebuild_corpus(
            spark, inc_a.unionByName(inc_b), model, cut_spans=True
        )
        .select(*cols)
        .collect()
    )
    assert got == want and len(got) == 5

    # idempotent re-run of the later day converges (stats AND state,
    # span tables included)
    def snap():
        return (
            sorted(
                tuple(r)
                for r in spark.read.parquet(f"{state}/corpus")
                .select(*cols, "shard_id")
                .collect()
            ),
            sorted(
                tuple(r)
                for r in spark.read.parquet(f"{state}/span_cuts").collect()
            ),
            sorted(
                tuple(r)
                for r in spark.read.parquet(f"{state}/span_anchors")
                .select("doc_id", "i", "__h")
                .collect()
            ),
        )

    before = snap()
    s2_again = pipelines.run_daily_increment(
        spark, state, inc_b, "d2", model, cut_spans=True
    )
    assert s2_again == s2
    assert snap() == before


def test_daily_span_cut_refuses_mixed_mode_state(spark, tmp_path):
    """Span cutting is a property of the state dir: a cut run over uncut
    history (no standing anchors to probe) and an uncut run over cut
    history both refuse loudly instead of silently diverging from the
    rebuild."""
    import pytest

    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b, _ = _span_fixture(spark)
    uncut = str(tmp_path / "uncut")
    pipelines.run_daily_increment(spark, uncut, inc_a, "d1", model)
    with pytest.raises(ValueError, match="WITHOUT span cutting"):
        pipelines.run_daily_increment(
            spark, uncut, inc_b, "d2", model, cut_spans=True
        )
    cut = str(tmp_path / "cut")
    pipelines.run_daily_increment(
        spark, cut, inc_a, "d1", model, cut_spans=True
    )
    with pytest.raises(ValueError, match="WITH span cutting"):
        pipelines.run_daily_increment(spark, cut, inc_b, "d2", model)


def test_daily_span_cut_compaction_covers_span_tables(spark, tmp_path):
    """compact_corpus treats the span state tables like every other
    __run-partitioned table: file counts drop, reads stay identical, and
    an old-day re-run still converges post-compaction."""
    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b, _ = _span_fixture(spark)
    state = str(tmp_path / "state")
    pipelines.run_daily_increment(
        spark, state, inc_a.repartition(5), "d1", model, cut_spans=True
    )
    s2 = pipelines.run_daily_increment(
        spark, state, inc_b.repartition(5), "d2", model, cut_spans=True
    )

    def span_rows():
        return (
            sorted(
                tuple(r)
                for r in spark.read.parquet(f"{state}/span_cuts").collect()
            ),
            sorted(
                tuple(r)
                for r in spark.read.parquet(f"{state}/span_anchors")
                .select("doc_id", "i", "__h")
                .collect()
            ),
        )

    before_state = _state_rows(spark, state)
    before_span = span_rows()
    rep = pipelines.compact_corpus(spark, state)
    assert {"span_anchors", "span_cuts"} <= set(rep)
    assert sum(v["files_after"] for v in rep.values()) < sum(
        v["files_before"] for v in rep.values()
    )
    assert _state_rows(spark, state) == before_state
    assert span_rows() == before_span
    s2_again = pipelines.run_daily_increment(
        spark, state, inc_b, "d2", model, cut_spans=True
    )
    assert s2_again == s2
    assert span_rows() == before_span


def test_export_packed_corpus_conserves_and_reconstructs(spark, tmp_path):
    """The packed LM-training export: every pack but a split's last
    holds exactly `budget` tokens, token mass is conserved per split,
    pack-order tokens reconstruct doc-order tokens exactly, and the
    doc_spans provenance tiles each pack."""
    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b, _ = _span_fixture(spark)
    state = str(tmp_path / "state")
    pipelines.run_daily_increment(
        spark, state, inc_a, "d1", model, cut_spans=True
    )
    pipelines.run_daily_increment(
        spark, state, inc_b, "d2", model, cut_spans=True
    )
    out = str(tmp_path / "packed")
    budget = 7
    stats = pipelines.export_packed_corpus(spark, state, out, budget=budget)

    corpus = spark.read.parquet(f"{state}/corpus").collect()
    doc_toks = {
        r["doc_id"]: r["text"].split(" ") for r in corpus
    }
    by_split: dict[str, list[int]] = {}
    for r in corpus:
        by_split.setdefault(r["split"], []).append(r["doc_id"])

    packs = spark.read.parquet(out).collect()
    assert stats["packs"] == len(packs)
    assert stats["tokens"] == sum(len(p["tokens"]) for p in packs)
    assert stats["tokens"] == sum(len(t) for t in doc_toks.values())

    for split, ids in by_split.items():
        want = [t for d in sorted(ids) for t in doc_toks[d]]
        split_packs = sorted(
            (p for p in packs if p["split"] == split),
            key=lambda p: p["pack_id"],
        )
        assert [p["pack_id"] for p in split_packs] == list(
            range(len(split_packs))
        )
        got = [t for p in split_packs for t in p["tokens"]]
        assert got == want, f"reconstruction failed for split {split}"
        # exact budget everywhere but the last pack
        for p in split_packs[:-1]:
            assert len(p["tokens"]) == budget
        assert 0 < len(split_packs[-1]["tokens"]) <= budget
        # doc_spans tile each pack: contiguous, in order, correct docs
        for p in split_packs:
            spans = sorted(p["doc_spans"], key=lambda s: s["start"])
            assert spans[0]["start"] == 0
            assert spans[-1]["end"] == len(p["tokens"])
            for a, b in zip(spans, spans[1:]):
                assert a["end"] == b["start"]
            for s in spans:
                seg = p["tokens"][s["start"]:s["end"]]
                # the segment is a contiguous slice of that doc's tokens
                joined = " ".join(seg)
                assert joined in " ".join(doc_toks[s["doc_id"]])

    # determinism: a second export reproduces the identical packs
    out2 = str(tmp_path / "packed2")
    stats2 = pipelines.export_packed_corpus(
        spark, state, out2, budget=budget
    )
    assert stats2 == stats
    a = sorted(
        (p["split"], p["pack_id"], tuple(p["tokens"]))
        for p in spark.read.parquet(out2).collect()
    )
    b = sorted(
        (p["split"], p["pack_id"], tuple(p["tokens"])) for p in packs
    )
    assert a == b


def test_span_cut_report_rolls_up_per_run(spark, tmp_path):
    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b, _ = _span_fixture(spark)
    state = str(tmp_path / "state")
    # uncut / not-yet-run state dir: empty frame, stable schema
    empty = pipelines.span_cut_report(spark, state)
    assert empty.count() == 0 and "removed_frac" in empty.columns

    pipelines.run_daily_increment(
        spark, state, inc_a, "d1", model, cut_spans=True
    )
    s2 = pipelines.run_daily_increment(
        spark, state, inc_b, "d2", model, cut_spans=True
    )
    rep = {r["__run"]: r for r in pipelines.span_cut_report(spark, state).collect()}
    assert set(rep) == {"d1", "d2"}
    assert rep["d1"]["spans_cut"] == 0 and rep["d1"]["chars_removed"] == 0
    assert rep["d2"]["spans_cut"] == s2["spans_cut"] == 2
    assert rep["d2"]["chars_removed"] == s2["chars_removed"]
    assert rep["d2"]["docs_touched"] == 2          # 401 and 403
    for r in rep.values():
        assert r["chars_in"] == r["chars_kept"] + r["chars_removed"]


def test_daily_increment_refuses_reserved_columns_and_uri_state(
    spark, tmp_path
):
    """Self-review fixes: an increment carrying a pipeline-reserved
    column (schema evolution would admit it and corrupt the standing
    schema) and a URI-scheme state dir (the local-file metadata probes
    would silently no-op) both refuse loudly."""
    import pytest

    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, _ = _fixture(spark)
    state = str(tmp_path / "state")
    bad = inc_a.withColumn("log_odds", F.lit(1.0))
    with pytest.raises(ValueError, match="pipeline-reserved"):
        pipelines.run_daily_increment(spark, state, bad, "d1", model)
    bad2 = inc_a.withColumn("n_tokens", F.lit(7))
    with pytest.raises(ValueError, match="pipeline-reserved"):
        pipelines.run_daily_increment(spark, state, bad2, "d1", model)
    with pytest.raises(ValueError, match="URI scheme"):
        pipelines.run_daily_increment(
            spark, "s3a://bucket/state", inc_a, "d1", model
        )
    with pytest.raises(ValueError, match="URI scheme"):
        pipelines.read_corpus_state(spark, "hdfs://nn/state")
    with pytest.raises(ValueError, match="URI scheme"):
        pipelines.compact_corpus(spark, "s3a://bucket/state")


def test_rejected_run_leaves_standing_schema_untouched(spark, tmp_path):
    """Self-review fix: the evolved schema persists only after every
    contract guard passes — a run rejected by the id-interval contract
    must not leave its new column in _schema.json."""
    import pytest

    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b = _fixture(spark)
    state = str(tmp_path / "state")
    pipelines.run_daily_increment(spark, state, inc_a, "d1", model)
    schema_before = pipelines._load_state_schema(state)
    # new run BELOW the seen interval AND carrying a new column: the
    # interval contract rejects it — the column must not persist
    low_ids = inc_b.withColumn(
        "doc_id", F.col("doc_id") - 200
    ).withColumn("url", F.lit("http://x"))
    with pytest.raises(ValueError, match="must take ids above"):
        pipelines.run_daily_increment(spark, state, low_ids, "d9", model)
    schema_after = pipelines._load_state_schema(state)
    assert schema_after.jsonValue() == schema_before.jsonValue()
    assert "url" not in [f.name for f in schema_after.fields]


def test_validate_corpus_state_healthy_and_corrupted(spark, tmp_path):
    """The state-dir integrity audit: healthy cut and uncut states
    report no violations; each seeded corruption (orphaned anchor run,
    tampered corpus text, drifted split, corpus doc missing from seen)
    is caught by its own check, and strict mode raises."""
    import os
    import shutil

    import pytest

    from snowflake_to_bq_pipeline_spark import pipelines

    model, inc_a, inc_b, _ = _span_fixture(spark)
    state = str(tmp_path / "state")
    pipelines.run_daily_increment(
        spark, state, inc_a, "d1", model, cut_spans=True
    )
    pipelines.run_daily_increment(
        spark, state, inc_b, "d2", model, cut_spans=True
    )
    assert all(
        not v
        for v in pipelines.validate_corpus_state(spark, state).values()
    )

    m2, a2, b2 = _fixture(spark)
    uncut = str(tmp_path / "uncut")
    pipelines.run_daily_increment(spark, uncut, a2, "d1", m2)
    pipelines.run_daily_increment(spark, uncut, b2, "d2", m2)
    assert all(
        not v
        for v in pipelines.validate_corpus_state(spark, uncut).values()
    )

    # corruption 1: a span_anchors run vanishes (partial delete)
    broken1 = str(tmp_path / "b1")
    shutil.copytree(state, broken1)
    shutil.rmtree(f"{broken1}/span_anchors/__run=d1")
    rep = pipelines.validate_corpus_state(spark, broken1)
    assert any("span_anchors missing run 'd1'" in v for v in rep["runs"])
    with pytest.raises(ValueError, match="span_anchors missing"):
        pipelines.validate_corpus_state(spark, broken1, strict=True)

    # corruption 2: corpus text tampered after the cut — conservation
    broken2 = str(tmp_path / "b2")
    shutil.copytree(state, broken2)
    cdir = f"{broken2}/corpus/__run=d2"
    df = spark.read.parquet(cdir)
    tampered = df.withColumn(
        "text", F.concat(F.col("text"), F.lit(" extra"))
    )
    tampered.write.mode("overwrite").parquet(f"{cdir}.tmp")
    shutil.rmtree(cdir)
    os.rename(f"{cdir}.tmp", cdir)
    rep = pipelines.validate_corpus_state(spark, broken2)
    assert any("violating chars_kept" in v for v in rep["conservation"])

    # corruption 3: a stored split flipped — split stability
    broken3 = str(tmp_path / "b3")
    shutil.copytree(state, broken3)
    cdir = f"{broken3}/corpus/__run=d1"
    df = spark.read.parquet(cdir)
    flipped = df.withColumn(
        "split",
        F.when(F.col("split") == "train", "test").otherwise("train"),
    )
    flipped.write.mode("overwrite").parquet(f"{cdir}.tmp")
    shutil.rmtree(cdir)
    os.rename(f"{cdir}.tmp", cdir)
    rep = pipelines.validate_corpus_state(spark, broken3)
    assert rep["splits"], rep

    # corruption 4: seen slice deleted — corpus orphans + run check
    broken4 = str(tmp_path / "b4")
    shutil.copytree(state, broken4)
    shutil.rmtree(f"{broken4}/seen/__run=d1")
    rep = pipelines.validate_corpus_state(spark, broken4)
    assert any("no seen slice" in v for v in rep["runs"])
    assert any("absent from the seen index" in v for v in rep["membership"])
