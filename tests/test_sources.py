"""Source-reader matrix: round-trips per format, pushdown reaching the
columnar scans, and clear gating errors for absent optional modules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.sources import readers


def _sample(spark):
    return spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
    )


def test_parquet_round_trip_and_pushdown(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    _sample(spark).write.parquet(p)
    df = readers.read_parquet(spark, p).filter(F.col("k") > 90)
    assert df.count() == 9
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,90)]" in plan


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    p = str(tmp_path / "t.orc")
    _sample(spark).write.orc(p)
    df = readers.read_orc(spark, p).filter(F.col("k") > 90)
    assert df.count() == 9
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,90)]" in plan


def test_csv_json_round_trips(spark, tmp_path):
    want = sorted(map(tuple, _sample(spark).collect()))
    pc = str(tmp_path / "t.csv")
    _sample(spark).write.option("header", "true").csv(pc)
    assert sorted(map(tuple, readers.read_csv(spark, pc).collect())) == want
    pj = str(tmp_path / "t.json")
    _sample(spark).write.json(pj)
    got = sorted(
        map(
            tuple,
            readers.read_json(spark, pj).select("k", "grp", "s").collect(),
        )
    )
    assert got == want


def test_avro_gating_error_when_module_absent(spark, tmp_path):
    try:
        readers.read_avro(spark, str(tmp_path / "none.avro"))
    except RuntimeError as e:
        assert "spark-avro" in str(e)  # module absent here: clear gate
    except Exception:
        pytest.fail("expected the gated RuntimeError")
    else:  # module present in some environments: reading nothing is fine
        pass


def test_jdbc_gating_error_without_driver(spark):
    with pytest.raises(RuntimeError, match="JDBC"):
        readers.read_jdbc(
            spark, "jdbc:postgresql://localhost:1/none", "t"
        )
