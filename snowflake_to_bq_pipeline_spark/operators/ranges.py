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


def open_intervals_by_day(
    intervals: DataFrame,
    open_col: str,
    close_col: str,
) -> DataFrame:
    """Sweep-line interval counting: how many intervals are open per day.

    The naive formulation (day-spine × interval with a BETWEEN predicate)
    is the same quadratic nested-loop this module's interval_join exists
    to avoid — and it materializes every (day, open interval) pair. The
    sweep-line fold is the scale-correct shape: each interval emits two
    delta rows (+1 at open, −1 the day after close), one hash aggregation
    collapses them per day, and a running sum over the DISTINCT-day table
    (O(days) rows, deliberately tiny like backfill_progress) yields the
    open count. O(2·intervals) shuffled rows regardless of interval
    length — an interval spanning years costs the same two deltas.

    Inclusive close: an interval is open on every day in
    ``[open_day, close_day]``.
    """
    from pyspark.sql import Window

    opens = intervals.select(
        F.col(open_col).alias("day"),
        F.lit(1).alias("__delta"),
        F.lit(1).alias("__opened"),
        F.lit(0).alias("__closed"),
    )
    closes = intervals.select(
        F.date_add(F.col(close_col), 1).alias("day"),
        F.lit(-1).alias("__delta"),
        F.lit(0).alias("__opened"),
        F.lit(1).alias("__closed"),
    )
    days = (
        opens.unionByName(closes)
        .groupBy("day")
        .agg(
            F.sum("__delta").alias("__d"),
            F.sum("__opened").cast("bigint").alias("n_opened"),
            F.sum("__closed").cast("bigint").alias("n_closed"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return days.select(
        "day",
        "n_opened",
        "n_closed",
        F.sum("__d").over(w).cast("bigint").alias("open_intervals"),
    )
