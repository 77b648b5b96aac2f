"""Schema drift: every drift class must be detected and resolved per the
documented policy (add nullable / keep dropped / widen / refuse flips)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from snowflake_to_bq_pipeline_spark.operators import schema_drift as sd


def _schema(*fields):
    return StructType([StructField(n, t, True) for n, t in fields])


TARGET = _schema(
    ("id", LongType()), ("name", StringType()), ("qty", IntegerType())
)


def test_new_column_appends_nullable(spark):
    incoming = _schema(
        ("id", LongType()),
        ("name", StringType()),
        ("qty", IntegerType()),
        ("email", StringType()),
    )
    evolved, rep = sd.evolve_schema(TARGET, incoming)
    assert rep.added == ["email"]
    assert not rep.incompatible
    assert [f.name for f in evolved.fields] == ["id", "name", "qty", "email"]
    assert evolved["email"].nullable

    df = spark.createDataFrame([(1, "a", 2, "x@y.z")], incoming)
    aligned = sd.align_to_schema(df, evolved)
    assert aligned.schema == evolved


def test_dropped_column_kept_nullable_filled_null(spark):
    incoming = _schema(("id", LongType()), ("name", StringType()))
    evolved, rep = sd.evolve_schema(TARGET, incoming)
    assert rep.dropped == ["qty"]
    assert [f.name for f in evolved.fields] == ["id", "name", "qty"]
    df = spark.createDataFrame([(1, "a")], incoming)
    row = sd.align_to_schema(df, evolved).collect()[0]
    assert row.qty is None


def test_widened_type_evolves_in_place(spark):
    incoming = _schema(
        ("id", LongType()), ("name", StringType()), ("qty", LongType())
    )
    evolved, rep = sd.evolve_schema(TARGET, incoming)
    assert rep.widened == [("qty", "int", "bigint")]
    assert isinstance(evolved["qty"].dataType, LongType)
    # Old target data (int) reads fine under the widened schema after align.
    old = spark.createDataFrame([(1, "a", 2)], TARGET)
    assert sd.align_to_schema(old, evolved).collect()[0].qty == 2


def test_incompatible_flip_raises_by_default():
    incoming = _schema(
        ("id", LongType()), ("name", LongType()), ("qty", IntegerType())
    )
    with pytest.raises(sd.SchemaDriftError, match="name"):
        sd.evolve_schema(TARGET, incoming)


def test_incompatible_keep_target_casts_with_null_fallback(spark):
    incoming = _schema(
        ("id", LongType()), ("name", LongType()), ("qty", IntegerType())
    )
    evolved, rep = sd.evolve_schema(
        TARGET, incoming, on_incompatible="keep_target"
    )
    assert rep.incompatible == [("name", "string", "bigint")]
    assert isinstance(evolved["name"].dataType, StringType)
    df = spark.createDataFrame([(1, 42, 2)], incoming)
    assert sd.align_to_schema(df, evolved).collect()[0].name == "42"


def test_full_sync_evolve_no_target_passthrough(spark, sf_dir):
    from snowflake_to_bq_pipeline_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    out, rep = sd.full_sync_evolve(orders, None)
    assert not rep.has_drift
    assert out.schema == orders.schema


def test_full_sync_evolve_roundtrip_with_drift(spark, sf_dir, tmp_path):
    """End-to-end: target written, source gains a column and widens one —
    the evolved reload keeps old rows readable and lands the new column."""
    from pyspark.sql import functions as F

    from snowflake_to_bq_pipeline_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").cast("int").alias("cust")
    )
    target = str(tmp_path / "t")
    orders.write.parquet(target)

    incoming = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.col("o_custkey").cast("long").alias("cust"),
            F.col("o_orderpriority").alias("note"),
        )
    )
    tgt_schema = spark.read.parquet(target).schema
    aligned, rep = sd.full_sync_evolve(incoming, tgt_schema)
    assert rep.widened and rep.added == ["note"]
    assert [f.name for f in aligned.schema.fields] == [
        "o_orderkey", "cust", "note",
    ]
    assert aligned.count() == incoming.count()
