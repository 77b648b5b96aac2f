"""Semantic properties of the round-4 analytics additions (SCD2,
retention/funnel, skew profile, rolling window, priority sampling,
exact percentiles) beyond the oracle hash gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.catalog import load_table
from snowflake_to_bq_pipeline_spark.operators import curation, scd, skew
from snowflake_to_bq_pipeline_spark.operators.quality import (
    group_percentiles_exact,
)
from snowflake_to_bq_pipeline_spark.plans import engagement
from snowflake_to_bq_pipeline_spark.plans.dashboard import rolling_revenue_7d


def test_scd2_intervals_tile(spark, sf_dir):
    hist = scd.scd2_history(
        load_table(spark, sf_dir, "orders"),
        key_cols=["o_custkey"],
        attr_col="o_orderstatus",
        ts_col="o_orderdate",
        tiebreak_cols=["o_orderkey"],
    ).cache()
    # Exactly one open (is_current) interval per key.
    open_counts = (
        hist.groupBy("o_custkey")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
        .filter(F.col("n_open") != 1)
        .count()
    )
    assert open_counts == 0
    # Consecutive versions chain: version k's valid_to == version k+1's
    # valid_from (intervals tile with no gaps or overlaps).
    nxt = hist.alias("a").join(
        hist.alias("b"),
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.version") + 1 == F.col("b.version")),
    )
    broken = nxt.filter(F.col("a.valid_to") != F.col("b.valid_from")).count()
    assert broken == 0
    # Adjacent runs always change the attribute (maximal runs).
    same_attr = nxt.filter(
        F.col("a.o_orderstatus") == F.col("b.o_orderstatus")
    ).count()
    assert same_attr == 0
    # Every source row is folded into exactly one interval.
    total_obs = hist.agg(F.sum("n_observations")).collect()[0][0]
    assert total_obs == load_table(spark, sf_dir, "orders").count()
    hist.unpersist()


def test_funnel_monotone_and_retention_week0(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    rows = (
        engagement.funnel_conversion(events)
        .orderBy("stage_idx")
        .collect()
    )
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0]["conv_from_first"] == 1.0

    week0 = (
        engagement.retention_cohorts(events)
        .filter(F.col("week_offset") == 0)
        .collect()
    )
    assert week0 and all(r["retention_rate"] == 1.0 for r in week0)
    assert all(r["n_active"] == r["cohort_size"] for r in week0)


def test_key_skew_profile_shape(spark, sf_dir):
    prof = skew.key_skew_profile(
        load_table(spark, sf_dir, "lineitem"), "l_suppkey", top_k=10
    ).collect()
    assert len(prof) == 10
    assert [r["key_rank"] for r in prof] != []
    by_rank = sorted(prof, key=lambda r: r["key_rank"])
    counts = [r["n_rows"] for r in by_rank]
    assert counts == sorted(counts, reverse=True)
    assert all(0 < r["share"] < 1 for r in prof)
    assert all(r["skew_vs_mean"] > 0 for r in prof)


def test_rolling_revenue_window_bounds(spark, sf_dir):
    out = rolling_revenue_7d(load_table(spark, sf_dir, "orders"))
    bad = out.filter(
        (F.col("days_in_window") < 1)
        | (F.col("days_in_window") > 7)
        | (F.col("revenue_7d") < F.col("revenue"))
    ).count()
    assert bad == 0


def test_priority_sample_deterministic_and_weight_biased(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = curation.priority_sample(docs, "doc_id", "n_chars", "source", k=10)
    b = curation.priority_sample(
        docs.repartition(7), "doc_id", "n_chars", "source", k=10
    )
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b  # partitioning-independent selection
    per_stratum = a.groupBy("source").count().collect()
    assert all(r["count"] == 10 for r in per_stratum)
    # Weighted sampling must skew toward heavy docs: sampled mean weight
    # above the corpus mean weight.
    sampled_mean = a.agg(F.avg("weight")).collect()[0][0]
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert sampled_mean > corpus_mean


def test_group_percentiles_ordered(spark, sf_dir):
    out = group_percentiles_exact(
        load_table(spark, sf_dir, "events"), "event_type", "value"
    ).collect()
    assert out
    for r in out:
        assert r["p50"] <= r["p95"] <= r["p99"]
