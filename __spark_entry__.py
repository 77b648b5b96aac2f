"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the v5 individual-budget-tracking
analog) at sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from snowflake_to_bq_pipeline_spark.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["individual_budget_tracking"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (rows-only ops omitted)."""
    return dict(ORACLES)
