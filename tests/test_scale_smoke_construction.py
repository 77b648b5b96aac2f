"""Guards for the scale-smoke corpus construction (tools/scale_smoke.py).

The smoke's linearity claims rest on two data-construction invariants;
if either silently broke, the smoke would measure the data, not the
engine: word-suffixed document replicas must share no shingles, and
sign-flipped embedding replicas must preserve within-replica cosines
EXACTLY while collapsing cross-replica similarity.
"""

from __future__ import annotations

import math
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_sign_flip_is_orthogonal_map(spark):
    from tools.scale_smoke import _sign_flip

    rows = [
        (1, [1.0, 2.0, -3.0, 0.5, 4.0, -1.5, 2.5, 0.25]),
        (2, [0.5, -1.0, 2.0, 3.5, -2.0, 1.0, -0.5, 2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    flipped = {
        r.vec_id: list(r.embedding)
        for r in df.withColumn(
            "embedding", F.transform(F.col("embedding"), _sign_flip(3))
        ).collect()
    }
    orig = dict(rows)
    # diagonal +-1 map: same magnitudes, within-replica cosine EXACT
    for vid in orig:
        assert [abs(x) for x in flipped[vid]] == pytest.approx(
            [abs(x) for x in orig[vid]], abs=1e-6
        )
    assert _cos(flipped[1], flipped[2]) == pytest.approx(
        _cos(orig[1], orig[2]), abs=1e-6
    )
    # the map actually flips something and differs between replicas
    from tools.scale_smoke import _sign_flip as sf

    f5 = {
        r.vec_id: list(r.embedding)
        for r in df.withColumn(
            "embedding", F.transform(F.col("embedding"), sf(5))
        ).collect()
    }
    assert flipped[1] != orig[1] or f5[1] != orig[1]
    assert flipped[1] != f5[1]


def test_skew_smoke_corpus_has_the_claimed_hot_keys(spark, tmp_path):
    """The skew torture corpus must actually contain the hot keys it
    advertises: ~30% of orders on custkey 1, ~30% of events on user 1,
    ~50% of events on one type — otherwise the <=3x assertions pass
    vacuously against a uniform corpus."""
    from tools.skew_smoke import build_skewed

    src, dst = str(tmp_path / "u"), str(tmp_path / "s")
    spark.createDataFrame(
        [(i, i % 97 + 2, float(i)) for i in range(1000)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.mode("overwrite").parquet(f"{src}/orders.parquet")
    spark.createDataFrame(
        [(i, i % 89 + 2, f"t{i % 7}") for i in range(1000)],
        "event_id long, user_id long, event_type string",
    ).write.mode("overwrite").parquet(f"{src}/events.parquet")
    spark.createDataFrame(
        [(i, f"unique words for document number {i} go here") for i in range(1000)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(f"{src}/documents.parquet")
    build_skewed(spark, src, dst)
    orders = spark.read.parquet(f"{dst}/orders.parquet")
    events = spark.read.parquet(f"{dst}/events.parquet")
    docs = spark.read.parquet(f"{dst}/documents.parquet")
    hot_orders = orders.filter(F.col("o_custkey") == 1).count() / 1000
    hot_users = events.filter(F.col("user_id") == 1).count() / 1000
    hot_type = events.filter(F.col("event_type") == "hot").count() / 1000
    hot_docs = docs.filter(F.col("text").endswith("zzz stop phrase")).count() / 1000
    assert 0.25 <= hot_orders <= 0.35, hot_orders
    assert 0.25 <= hot_users <= 0.35, hot_users
    assert 0.45 <= hot_type <= 0.55, hot_type
    assert 0.45 <= hot_docs <= 0.55, hot_docs
    # the injected stop-phrase really is ONE shingle in half the corpus
    # (the df-cap guard's trigger condition — not just a suffix string)
    from snowflake_to_bq_pipeline_spark.operators.neardup import hashed_shingles

    max_df = (
        hashed_shingles(docs)
        .groupBy("__h")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_df >= 450, max_df
    assert orders.count() == 1000 and events.count() == 1000
    assert docs.count() == 1000


def test_word_suffix_kills_cross_replica_shingles(spark, tmp_path):
    from snowflake_to_bq_pipeline_spark.operators.neardup import (
        hashed_shingles,
    )
    from tools.scale_smoke import build_big

    src = str(tmp_path / "src")
    big = str(tmp_path / "big")
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    spark.createDataFrame(
        [(i, text, "en", "s", len(text)) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{src}/documents.parquet")
    spark.createDataFrame(
        [(i, [float(i), 1.0, -2.0]) for i in range(4)],
        "vec_id long, embedding array<float>",
    ).write.mode("overwrite").parquet(f"{src}/embeddings.parquet")
    key_schemas = {
        "region": "r_regionkey long",
        "nation": "n_nationkey long",
        "customer": "c_custkey long",
        "supplier": "s_suppkey long",
        "part": "p_partkey long",
        "orders": "o_orderkey long, o_custkey long",
        "lineitem": "l_orderkey long, l_partkey long, l_suppkey long",
        "events": "event_id long, user_id long",
    }
    for t, schema in key_schemas.items():
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            f"{src}/{t}.parquet"
        )
    build_big(spark, src, big, replicas=3)
    docs = spark.read.parquet(f"{big}/documents.parquet")
    sh = hashed_shingles(docs)
    # within a replica every doc duplicates its replica-mates (same
    # text), but NO shingle may span replicas: each shingle's docs all
    # fall in one replica's key range
    span = (
        sh.groupBy("__h")
        .agg(
            (F.max(F.floor(F.col("doc_id") / F.lit(1_000_000_000)))
             - F.min(F.floor(F.col("doc_id") / F.lit(1_000_000_000))))
            .alias("span")
        )
        .agg(F.max("span").alias("m"))
        .collect()[0]["m"]
    )
    assert span == 0
