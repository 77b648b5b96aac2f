"""Dataset-accounting queries added in r9: per-source dedup token
savings, NTILE length-curriculum buckets (two-phase, no one-task
window), and the per-label embedding norm profile."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.registry import QUERIES


def _write_docs(spark, path, rows):
    """rows = (doc_id, source, text)."""
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, s, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_embeddings(spark, path, rows):
    """rows = (vec_id, [floats], label)."""
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet"
    )


def test_token_savings_by_source_exact(spark, tmp_path):
    d = str(tmp_path)
    # srcA: "aa bb cc" twice (one dup, 3 tokens each) + a unique 2-token
    # doc; srcB: a third copy of the same text — its canonical lives in
    # srcA, so srcB keeps nothing of it.
    _write_docs(
        spark,
        d,
        [
            (1, "srcA", "aa bb cc"),
            (2, "srcA", "aa bb cc"),
            (3, "srcA", "dd ee"),
            (4, "srcB", "aa bb cc"),
        ],
    )
    rows = {
        r["source"]: r.asDict()
        for r in QUERIES["dedup_token_savings_by_source"](spark, d).collect()
    }
    assert rows["srcA"] == {
        "source": "srcA",
        "n_docs": 3,
        "n_dup_docs": 1,
        "tokens_total": 8,
        "tokens_kept": 5,
        "dup_token_pct": 37.5,
    }
    assert rows["srcB"] == {
        "source": "srcB",
        "n_docs": 1,
        "n_dup_docs": 1,
        "tokens_total": 3,
        "tokens_kept": 0,
        "dup_token_pct": 100.0,
    }


@pytest.mark.parametrize("n", [1, 3, 4, 7, 8, 9, 23])
def test_curriculum_buckets_match_spark_ntile(spark, tmp_path, n):
    """The two-phase bucket id must equal Spark's own NTILE(4) for every
    fill shape (n % 4 = 0..3 and n < k)."""
    d = str(tmp_path)
    _write_docs(
        spark,
        d,
        [(i, "s", "tok " * (1 + (i * 7) % 5)) for i in range(n)],
    )
    got = {
        (r["bucket"], r["n_docs"])
        for r in QUERIES["length_curriculum_buckets"](spark, d).collect()
    }
    docs = spark.read.parquet(f"{d}/documents.parquet")
    toks = F.array_size(
        F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)
    ).cast("long")
    from pyspark.sql import Window

    ref = (
        docs.select("doc_id", toks.alias("n_tokens"))
        .withColumn(
            "bucket",
            F.ntile(4).over(
                Window.orderBy(F.col("n_tokens"), F.col("doc_id"))
            ).cast("long"),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    want = {(r["bucket"], r["n_docs"]) for r in ref.collect()}
    assert got == want


def test_curriculum_buckets_are_ordered_by_length(spark, tmp_path):
    d = str(tmp_path)
    _write_docs(
        spark, d, [(i, "s", "w " * (i + 1)) for i in range(20)]
    )
    rows = QUERIES["length_curriculum_buckets"](spark, d).collect()
    assert [r["bucket"] for r in rows] == [1, 2, 3, 4]
    # quartile boundaries must not overlap: max of stage i < min of i+1
    for a, b in zip(rows, rows[1:]):
        assert a["max_tokens"] <= b["min_tokens"]
    assert sum(r["n_docs"] for r in rows) == 20


def test_curriculum_plan_has_no_single_task_window(spark, sf_dir):
    """The scale contract: the bucket id must come from the two-phase
    rank, never a global NTILE/ROW_NUMBER window — every Window node in
    the executed plan must be partitioned by the range-partition id."""
    plan = (
        QUERIES["length_curriculum_buckets"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ntile" not in plan.lower()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "__pid" in line, f"unpartitioned window:\n{line}"


def test_embedding_norm_profile_exact(spark, tmp_path):
    d = str(tmp_path)
    _write_embeddings(
        spark,
        d,
        [
            (1, [3.0, 4.0], 0),   # norm 5
            (2, [6.0, 8.0], 0),   # norm 10
            (3, [0.0, 0.0], 1),   # degenerate zero vector
            (4, [1.0, 1.0], 1),   # norm sqrt(2)
        ],
    )
    rows = {
        r["label"]: r.asDict()
        for r in QUERIES["embedding_norm_profile"](spark, d).collect()
    }
    assert rows[0]["n_vecs"] == 2
    assert rows[0]["min_norm"] == 5.0
    assert rows[0]["max_norm"] == 10.0
    assert rows[0]["avg_norm"] == 7.5
    assert rows[1]["min_norm"] == 0.0  # catches the zero-vector failure
    r2 = round(math.sqrt(2.0), 6)
    assert rows[1]["max_norm"] == r2
    assert rows[1]["avg_norm"] == round(r2 / 2, 6)
