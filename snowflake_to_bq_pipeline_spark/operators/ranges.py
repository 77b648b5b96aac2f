"""Interval (range) join: match point rows into interval rows WITHOUT an
equality key.

Spark has no native band-join operator; the naive formulation
(``p.ts BETWEEN i.start AND i.end`` as the only join condition) planifies
as BroadcastNestedLoopJoin / CartesianProduct — quadratic and a
100 TB-killer. This operator applies the standard bin decomposition used
by every warehouse range-join implementation: quantize time into
fixed-width bins, explode each interval over the bins it touches, tag
each point with its single containing bin, equi-join on the bin, and
re-check the exact range as a residual predicate.

Each (point, interval) match shares exactly one bin — the point's — so
the equi-join emits no duplicates and needs no post-dedup. Bin width
should be on the order of the typical interval length: wider bins mean
fewer exploded rows but fatter buckets; narrower bins the reverse.
Intervals are half-open ``[start, end)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 300,
) -> DataFrame:
    """Inner-join points into containing intervals via bin decomposition.

    Returns all columns of ``intervals`` followed by all columns of
    ``points``. Column names must not collide (alias beforehand).
    """
    bin_us = int(bin_seconds) * 1_000_000
    pbin = F.floor(F.unix_micros(F.col(point_col)) / F.lit(bin_us))
    ibins = F.sequence(
        F.floor(F.unix_micros(F.col(start_col)) / F.lit(bin_us)),
        F.floor((F.unix_micros(F.col(end_col)) - 1) / F.lit(bin_us)),
    )
    p = points.withColumn("__bin", pbin)
    i = intervals.withColumn("__bin", F.explode(ibins))
    return (
        i.join(p, "__bin")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bin")
    )
