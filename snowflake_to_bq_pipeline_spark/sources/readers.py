"""Source connectors.

The reference extracts from Snowflake over its Python connector and loads
BigQuery via its client library (e.g. client_dimension_pipeline/
client_dimension_sync_full/main.py). Spark-native equivalents:

- Columnar lake formats (parquet/orc/csv/json, avro when the module is
  deployed) — the primary path at 100 TB; warehouse data lands in object
  storage and is read directly with predicate pushdown and partition
  pruning.
- Generic JDBC — the direct-connection path; works with any warehouse
  exposing a JDBC driver (Snowflake/BigQuery both do). Partitioned reads
  parallelize the extract across executors exactly where the reference
  hand-rolled OFFSET/LIMIT pagination (main_paginated.py).

JDBC drivers are not bundled in this environment, so ``read_jdbc`` raises
a clear error when the driver jar is absent rather than failing deep in
the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC read — same pushdown/pruning properties as parquet (columnar
    footer stats); the common interchange format out of Hive-era lakes."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_avro(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Avro read (row-major interchange, the common Kafka/connect landing
    format). The ``avro`` data source is an external Spark module; when
    the jar is not deployed this raises a clear error instead of failing
    deep in the JVM (same contract as ``read_jdbc``)."""
    reader = spark.read.format("avro")
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.load(path)
    except Exception as e:
        if "Failed to find data source: avro" in str(e):
            raise RuntimeError(
                "Avro source requires the spark-avro module on the "
                "classpath (--packages org.apache.spark:spark-avro_*)"
            ) from e
        raise


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | None = None,
) -> DataFrame:
    """XML read via Spark 4's built-in ``xml`` source (the donated
    spark-xml module) — ``row_tag`` names the repeating element that
    becomes one row.  The remaining feed format legacy enterprise
    exports actually arrive in (the reference's Snowflake stages accept
    XML stages the same way).  Self-describing like JSON: schema is
    inferred unless pinned, and attributes land as ``_attr`` columns."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned JDBC extract (replaces hand-rolled pagination).

    With ``partition_column`` + bounds, Spark issues ``num_partitions``
    range-predicated queries in parallel — the scalable version of the
    reference's OFFSET/LIMIT loop.

    Skew note — stride vs bounds: Spark derives a fixed stride
    ``(upper_bound - lower_bound) / num_partitions`` and the FIRST/LAST
    partition predicates are unbounded (``< lo+stride`` / ``>= hi-stride``),
    so under-covering bounds never lose rows (pinned by the live Derby
    round-trip test) but DO pile every out-of-range key onto the two edge
    partitions, and a non-uniform key distribution skews the middle ones.
    At warehouse scale pick bounds from ``MIN()/MAX()`` of the key (one
    cheap aggregate push-down) and a roughly uniform key (a sequence id,
    not a hot tenant id); filters and projections still push to the
    relation per-partition (``PushedFilters``/``ReadSchema`` on the scan,
    asserted live in tests/test_sources.py).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    try:
        return reader.load()
    except Exception as e:  # driver jar missing in this environment
        raise RuntimeError(
            "JDBC read failed — ensure the warehouse JDBC driver jar is on "
            "spark.jars and the URL/credentials are valid"
        ) from e
