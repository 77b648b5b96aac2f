"""Dimension-enrichment and rollup views.

Reference parity:
- ``work_item_enriched``: the v4/v5 views' dimension join block
  (work_item_individual_budget_time_tracking_view_v5.sql:422-450) — fact
  rows left-joined to client / client-group / team / user dimensions.
- ``utilization_rollup``: the dashboard's team/region budget-vs-actual
  aggregations (dashboard/main.py).
- ``monthly_pivot``: the v5 view's hours_logged_<month> columns (L23-34)
  generalized to any year.

Scale: every dimension join carries an explicit ``broadcast()`` hint —
dimensions are orders of magnitude smaller than facts and must never
shuffle the fact side. The rollup aggregates the fact once (partial agg)
before touching dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import (
    dec,
    money,
    money_from_micros_sum,
    money_micros,
    month_bucket_sum,
    net_price,
)


def work_item_enriched(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Fact rows enriched with the customer→nation→region dimension chain."""
    dims = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left"
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select(
            "c_custkey", "c_name", "c_mktsegment", "c_acctbal", "n_name", "r_name"
        )
    )
    joined = orders.join(
        F.broadcast(dims), orders.o_custkey == dims.c_custkey, "left"
    )
    return joined.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderdate").alias("order_date"),
        F.col("o_orderstatus").alias("order_status"),
        F.col("o_orderpriority").alias("order_priority"),
        money(F.col("o_totalprice")).alias("budget_amount"),
        F.col("c_custkey").alias("customer_key"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("market_segment"),
        F.col("c_acctbal").alias("customer_acctbal"),
        F.col("n_name").alias("nation_name"),
        F.col("r_name").alias("region_name"),
    )


def utilization_rollup(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    li_rollup: DataFrame | None = None,
) -> DataFrame:
    """Budget vs actual rolled up to (region, nation).

    Pass ``li_rollup`` (the budget family's shared (order, contributor)
    cube, plans/budget.line_rollup) to derive the per-order actual from
    its exact integer micros partials instead of re-scanning the fact —
    identical output (integer partials re-aggregate exactly), one fewer
    full fact scan when the family runs together.

    The fact-fact aggregate (lineitem per order) happens before any
    dimension join. Money sums are long micros (bit-identical to the
    decimal path, functions.money_micros) — but (region, nation) is a
    COARSE grain (25 groups regardless of corpus size), so a single-level
    long sum would silently wrap around sf1000. The rollup therefore sums
    in two phases: long partials per (nation, pmod(o_orderkey, 4096))
    salt bucket — each bucket holds ~1/4096 of a nation's orders, keeping
    the long below ~2^63 up to ~exabyte scale — then an exact
    decimal(38,0) sum over the ≤25*4096 partial rows. The second
    aggregate is O(groups*salts), effectively free, and the hot per-row
    path stays a primitive long add.
    """
    if li_rollup is not None:
        li = li_rollup.groupBy("l_orderkey").agg(
            F.sum("net_mic").alias("__actual_mic")
        )
    else:
        li = lineitem.groupBy("l_orderkey").agg(
            F.sum(
                money_micros(
                    net_price(F.col("l_extendedprice"), F.col("l_discount"))
                )
            ).alias("__actual_mic")
        )
    dims = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    joined = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
    )
    partial = joined.groupBy(
        "r_name", "n_name", F.pmod(F.col("o_orderkey"), F.lit(4096)).alias("__salt")
    ).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(money_micros(F.col("o_totalprice"))).alias("__bud_mic"),
        F.sum(
            F.coalesce(F.col("__actual_mic"), F.lit(0).cast("long"))
        ).alias("__act_mic"),
    )
    grouped = partial.groupBy(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(
        F.sum("__cnt").alias("order_count"),
        money_from_micros_sum(
            F.sum(F.col("__bud_mic").cast("decimal(38,0)"))
        ).alias("budget_total"),
        money_from_micros_sum(
            F.sum(F.col("__act_mic").cast("decimal(38,0)"))
        ).alias("actual_total"),
    )
    return grouped.select(
        "region_name",
        "nation_name",
        "order_count",
        "budget_total",
        "actual_total",
        money(F.col("budget_total") - F.col("actual_total")).alias("variance_total"),
        F.when(
            F.col("budget_total") > 0,
            F.round(F.col("actual_total") / F.col("budget_total") * 100, 2),
        ).alias("utilization_pct"),
    )


def monthly_pivot(
    lineitem: DataFrame, supplier: DataFrame, year: int
) -> DataFrame:
    """Per-contributor monthly activity pivot for one year (v5 L23-34)."""
    qty = F.col("l_quantity")
    ship = F.col("l_shipdate")
    aggs = [
        F.round(month_bucket_sum(qty, ship, year, m), 2).alias(f"qty_m{m:02d}")
        for m in range(1, 13)
    ]
    aggs.append(
        F.count(F.when(F.year(ship) == year, F.lit(1))).alias("entries_in_year")
    )
    grouped = lineitem.groupBy("l_suppkey").agg(*aggs)
    out = grouped.join(
        F.broadcast(supplier), grouped.l_suppkey == supplier.s_suppkey, "left"
    )
    return out.select(
        F.col("l_suppkey").alias("contributor_key"),
        F.col("s_name").alias("contributor_name"),
        *[F.col(f"qty_m{m:02d}") for m in range(1, 13)],
        "entries_in_year",
    )
