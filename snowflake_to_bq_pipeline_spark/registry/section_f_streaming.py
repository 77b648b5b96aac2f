"""SURVEY §2-F — batch twins of the streaming pipelines.

Split from the monolithic registry.py (r9); every query body is
unchanged — registration still flows through registry._core.query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from ..catalog import load_table
from ..streaming import incremental
from ._core import query


@query(
    "events_windowed_counts",
    oracle="""
    SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 300000000)
             AS window_start,
           make_timestamp(epoch_us(ts) - epoch_us(ts) % 300000000 + 300000000)
             AS window_end,
           event_type,
           COUNT(*) AS event_count
    FROM events
    GROUP BY 1, 2, event_type
    """,
)
def events_windowed_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windowed counts — batch twin of the streaming
    incremental sync (streaming/incremental.py); the streaming path is
    asserted equal to this in tests/test_streaming.py."""
    return incremental.windowed_counts_batch(load_table(spark, sf_dir, "events"))
