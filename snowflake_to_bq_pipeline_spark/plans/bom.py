"""Bill-of-materials per-case consumption — the reference's BOM converter.

Reference parity: `Kelvin BOM creater/Code.gs:310-360` converts production
batch data into a BOM import: for each raw material of a batch,
``perCase = totalConsumed / batchYield`` rounded to 6 decimals
(Code.gs:352, ``toFixed(6)``), emitting one import row per material with a
positive per-case quantity (Code.gs:423-432: component, per-case qty).

Schema mapping onto the test star schema: an order is a production batch;
its line with ``l_linenumber = 1`` is the finished-good row whose quantity
is the batch yield (the spreadsheet's Dashboard B6 cell); every other line
consumes ``l_quantity`` of part ``l_partkey``. Consumption aggregates per
(batch, material) because a material can appear on several lines.

Scale: one partial aggregation keyed (l_orderkey, l_partkey), one shuffle
join to the per-order yield row on l_orderkey (both sides already reduced),
and a broadcast join to the part dimension for the import row's material
name. No windows, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bom_per_case(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Per-case material consumption rows for every production batch.

    Output: (batch_key, material_key, material_name, total_consumed,
    batch_yield, per_case_qty) — the BOM import format, one row per
    (batch, material) with per_case_qty > 0.
    """
    yields = lineitem.filter(F.col("l_linenumber") == 1).select(
        F.col("l_orderkey").alias("batch_key"),
        F.col("l_quantity").cast("double").alias("batch_yield"),
    )
    consumed = (
        lineitem.filter(F.col("l_linenumber") > 1)
        .groupBy(
            F.col("l_orderkey").alias("batch_key"),
            F.col("l_partkey").alias("material_key"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_consumed"))
    )
    per_case = F.round(
        F.col("total_consumed").cast("double") / F.col("batch_yield"), 6
    )
    return (
        consumed.join(yields, "batch_key")
        .filter(F.col("batch_yield") > 0)
        .join(
            F.broadcast(
                part.select(
                    F.col("p_partkey").alias("material_key"),
                    F.col("p_name").alias("material_name"),
                )
            ),
            "material_key",
        )
        .select(
            "batch_key",
            "material_key",
            "material_name",
            "total_consumed",
            "batch_yield",
            per_case.alias("per_case_qty"),
        )
        .filter(F.col("per_case_qty") > 0)
    )
