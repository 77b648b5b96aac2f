"""Table registry: load the test/bench parquet tables as DataFrames.

Mirrors the reference's implicit catalog (Snowflake source tables /
BigQuery target tables, e.g. WORK_ITEM_DETAILS, USER_TIME_ENTRY_BQ,
CLIENT_DIMENSION — see /root/reference/README.md) as a parquet-backed
star schema. One ``spark.read.parquet`` per table keeps column pruning
and predicate pushdown available to every downstream plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that are always broadcast-joined against facts.
DIMENSIONS = frozenset({"region", "nation", "customer", "supplier", "part"})


# Columns written as parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
# natively. Depending on how a given testdata generation wrote the files,
# these arrive as raw nanos (legacy conf), as TIMESTAMP_NTZ (parquet
# timestamp[us] with isAdjustedToUTC=false), or already as TIMESTAMP_LTZ.
# All three normalize to microsecond TIMESTAMP_LTZ under the UTC session
# timezone — the same wall-clock values DuckDB sees in its naive TIMESTAMP,
# so oracle comparisons stay bit-identical and downstream epoch math
# (``unix_micros``) always sees the type it requires.
NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    nano_cols = NANO_TS_COLS.get(name, ())
    if nano_cols:
        # Runtime-settable; required whether or not the session factory set it
        # (the correctness driver hands us its own SparkSession).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in nano_cols:
        dt = df.schema[c].dataType
        if isinstance(dt, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        elif isinstance(dt, TimestampNTZType):
            # Wall-clock-exact under the UTC session timezone.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table in the scale-factor dir keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register them as temp views for spark.sql plans."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Spread a CPU-bound scan across cores when input splits < cores.

    Parquet can only parallelize down to row-group granularity; a
    single-row-group file therefore feeds every downstream ROW-LOCAL
    stage (gram explosion, shingling, Arrow encode passes) from ONE
    task no matter how many cores exist. Operators whose pre-shuffle
    compute dominates call this to buy an explicit round-robin exchange
    (deterministic: Spark sorts batches before round-robin since
    SPARK-23207) in return for full-width parallelism — measured 7× on
    the char-LM trigram pass at sf0.1 (7.4s → 1.1s on local[32]).

    CONDITIONAL: when the plan already has at least ``partitions``
    input partitions (any real cluster read — data arrives pre-split),
    this is a no-op and adds nothing to the plan, so corpus-scale runs
    never pay a gratuitous full-table exchange.
    """
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= partitions:
        return df
    return df.repartition(partitions)
