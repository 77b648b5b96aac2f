"""Bloom-filter semi-join pruning: no false negatives, real pruning, and
join-result equality when composed with the exact join."""

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.operators import bloom

SF_DIR = "/root/testdata/sf0.001"


def test_no_false_negatives(spark):
    build = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    probe = spark.range(0, 5000).select(F.col("id").alias("k"))
    kept = set(
        r["k"]
        for r in bloom.bloom_prefilter(probe, "k", build, "k").collect()
    )
    members = set(r["k"] for r in build.collect()) & set(
        r["k"] for r in probe.collect()
    )
    assert members <= kept  # every true member survives


def test_pruning_is_real(spark):
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    probe = spark.range(0, 100_000).select(F.col("id").alias("k"))
    kept = bloom.bloom_prefilter(probe, "k", build, "k").count()
    # 100 members + FP; at 2^20 bits / 100 keys the FP rate is ~0, so the
    # filter should prune ~all non-members.
    assert kept < 1_000


def test_join_result_equality(spark):
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plain = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    pruned_li = bloom.bloom_prefilter(
        lineitem, "l_orderkey", orders, "o_orderkey"
    )
    with_bloom = (
        pruned_li.join(orders, pruned_li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, with_bloom))


def test_bits_for_keys_sizing_ladder():
    from snowflake_to_bq_pipeline_spark.operators.bloom import (
        N_BITS_DEFAULT,
        bits_for_keys,
    )

    # floor holds for small builds
    assert bits_for_keys(0) == N_BITS_DEFAULT
    assert bits_for_keys(1000) == N_BITS_DEFAULT
    # 10 bits/key, next power of two, once past the floor
    assert bits_for_keys(200_000) == 1 << 21  # 2e6 bits -> 2^21
    assert bits_for_keys(1_000_000) == 1 << 24  # 1e7 bits -> 2^24
    # custom floor (the incremental-dedup memo's 2^23)
    assert bits_for_keys(1000, floor_bits=1 << 23) == 1 << 23
    # always 64-divisible (a power of two >= 2^20 trivially is)
    assert bits_for_keys(123_456_789) % 64 == 0
