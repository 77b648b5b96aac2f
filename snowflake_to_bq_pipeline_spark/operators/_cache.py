"""Managed persist for multi-consumer intermediates.

Spark does not reliably reuse exchanges across the consumers of a shared
subplan: the round-2 executed plans for the near-dup and TF-IDF operators
showed 0 ReusedExchange nodes — every consumer recomputed the expensive
explode/aggregate subtree (3-5x), costing 2x wall-time and large
run-to-run variance. Operators route such intermediates through
``swap_cache``: MEMORY_AND_DISK persist (spills, never OOMs), keyed so the
next invocation of the same operator releases the previous handle — a
long-lived session holds at most one cached table per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE_CACHE: dict[str, DataFrame] = {}


def swap_cache(key: str, df: DataFrame) -> DataFrame:
    """Persist ``df``, releasing the previous persisted handle for ``key``."""
    prev = _LIVE_CACHE.get(key)
    if prev is not None:
        prev.unpersist(blocking=False)
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE_CACHE[key] = df
    return df
