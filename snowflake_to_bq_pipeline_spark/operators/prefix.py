"""Scalable order-statistics primitives: two-phase grouped prefix sums.

``SUM(x) OVER (PARTITION BY g ORDER BY k)`` executes each group in ONE
task — fine when groups are plentiful and small, fatal when one group
is most of the table (a single dominant document source, one hot
tenant). This module provides the two-phase alternative, the same shape
as :func:`..operators.sync.global_row_number` (its prefix-COUNT special
case):

1. range-partition on ``(group, order)`` — partitions hold disjoint,
   ordered slices; a giant group spans MANY partitions;
2. one small job computes per-(partition, group) sums; the driver turns
   them into exclusive prefix offsets per group in partition order
   (O(partitions + groups) state);
3. a window partitioned by ``(partition_id, group)`` — parallel even
   within one group — computes local running sums, plus the broadcast
   offset.

Exact for integer/decimal values (offset addition is associative); for
doubles the result is a well-defined but partitioning-dependent
summation order, same as any distributed float sum.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._cache import swap_cache


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "__cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group running sum of ``value_col`` without per-group tasks.

    Returns ``df``'s columns plus ``out_col`` = inclusive prefix sum
    within the group under ``order_cols``. ``(group_cols, order_cols)``
    must be a total order for a deterministic result (the usual window
    requirement).
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    part_exprs = [F.col(c) for c in (*group_cols, *order_cols)]
    ranged = swap_cache(
        "prefix.grouped_prefix_sum",
        df.repartitionByRange(n, *part_exprs).withColumn(
            "__pid", F.spark_partition_id()
        ),
    )
    # Phase 2: per-(pid, group) totals -> exclusive per-group offsets in
    # pid order. Driver state is O(partitions + groups).
    part_sums = (
        ranged.groupBy("__pid", *group_cols)
        .agg(F.sum(F.col(value_col)).alias("__s"))
        .collect()
    )
    part_sums.sort(key=lambda r: (tuple(r[c] for c in group_cols), r["__pid"]))
    offsets = []
    prev_group: tuple | None = None
    acc = 0
    for r in part_sums:
        g = tuple(r[c] for c in group_cols)
        if g != prev_group:
            prev_group, acc = g, 0
        offsets.append((*g, r["__pid"], acc))
        acc += r["__s"] or 0
    # Phase 3: local running sums + broadcast offsets. The window key
    # includes __pid, so even a single giant group fans out across tasks.
    w = (
        Window.partitionBy("__pid", *[F.col(c) for c in group_cols])
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if not offsets:  # empty input: schema-stable local window, no rows
        return ranged.withColumn(
            out_col, F.sum(F.col(value_col)).over(w)
        ).drop("__pid")
    off_df = spark.createDataFrame(
        offsets, schema=[*group_cols, "__pid", "__off"]
    ).withColumn("__pid", F.col("__pid").cast("int"))
    return (
        ranged.join(F.broadcast(off_df), ["__pid", *group_cols])
        .withColumn(
            out_col, F.sum(F.col(value_col)).over(w) + F.col("__off")
        )
        .drop("__pid", "__off")
    )
