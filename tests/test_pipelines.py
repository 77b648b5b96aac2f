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

    # Written docs are a subset of the input with text intact.
    back = spark.read.parquet(out)
    src = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("src_text")
    )
    joined = back.join(src, "doc_id")
    assert joined.count() == stats["written"]
    assert joined.filter(F.col("text") != F.col("src_text")).count() == 0

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
