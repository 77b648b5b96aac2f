"""Shared budget-family cube (plans/budget.line_rollup): the *_from
consumers must be ROW-IDENTICAL to their one-pass twins — on real data and
on an adversarial frame exercising every null/one-sided edge the
conditional aggregates have (alloc-only contributors, time-only
contributors, zero-tax billables, single-line orders).

Also covers the registry-level memo (_budget_rollup_for): all four family
queries are declared memo consumers, and the digest/alerts pair shares one
alert dataset build (_alerts_for).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark import registry
from snowflake_to_bq_pipeline_spark.catalog import load_table
from snowflake_to_bq_pipeline_spark.plans import budget, dashboard


def _rows(df):
    return sorted(
        tuple(repr(v) for v in r) for r in df.collect()
    )


def _adversarial_lineitem(spark):
    """Edge-shaped entry lines: contributors with only allocation rows,
    only time rows, both, zero-tax time rows, and a single-line order."""
    d = datetime.datetime
    rows = [
        # (ok, sk, qty, extprice, disc, tax, flag, shipdate)
        (1, 10, 5.0, 1000.0, 0.1, 0.05, "N", d(1997, 1, 1)),
        (1, 10, 3.0, 500.0, 0.0, 0.0, "N", d(1997, 2, 1)),   # zero-tax time
        (1, 10, 2.0, 800.0, 0.2, 0.08, "A", d(1997, 1, 15)),
        (1, 20, 1.0, 300.0, 0.05, 0.0, "A", d(1997, 3, 1)),  # alloc-only
        (1, 30, 4.0, 400.0, 0.0, 0.07, "N", d(1997, 4, 1)),  # time-only
        (2, 10, 7.0, 900.0, 0.3, 0.0, "R", d(1996, 6, 1)),   # alloc-only ord
        (3, 40, 2.5, 123.45, 0.13, 0.04, "N", d(1998, 1, 1)),  # single line
        (4, 50, 6.0, 777.0, 0.0, 0.0, "A", d(1995, 5, 5)),
        (4, 50, 1.0, 111.0, 0.5, 0.5, "N", d(1995, 6, 6)),
    ]
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_shipdate timestamp",
    )


def _adversarial_orders(spark):
    d = datetime.datetime
    rows = [
        (1, "O", "1-URGENT", 2000.0, d(1997, 1, 1)),
        (2, "F", "3-MEDIUM", 0.0, d(1996, 5, 1)),   # zero budget
        (3, "O", "5-LOW", 100.0, d(1998, 1, 1)),
        (4, "P", "2-HIGH", 888.0, d(1995, 5, 1)),
        (5, "O", "4-NOT SPECIFIED", 50.0, d(1998, 2, 2)),  # no lines at all
    ]
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderstatus string, o_orderpriority string, "
        "o_totalprice double, o_orderdate timestamp",
    )


def _dims(spark):
    supplier = spark.createDataFrame(
        [(10, "Sup#10", 1), (20, "Sup#20", 1), (30, "Sup#30", 2),
         (40, "Sup#40", 2)],  # 50 intentionally missing (left-join edge)
        "s_suppkey long, s_name string, s_nationkey long",
    )
    nation = spark.createDataFrame(
        [(1, "ALPHA"), (2, "BETA")], "n_nationkey long, n_name string"
    )
    return supplier, nation


def test_from_variants_equal_one_pass_adversarial(spark):
    li = _adversarial_lineitem(spark)
    orders = _adversarial_orders(spark)
    supplier, nation = _dims(spark)
    cube = budget.line_rollup(li)

    assert _rows(budget.budget_vs_actual_from(orders, cube)) == _rows(
        budget.budget_vs_actual(orders, li)
    )
    assert _rows(
        budget.individual_budget_tracking_from(orders, cube)
    ) == _rows(budget.individual_budget_tracking(orders, li))
    assert _rows(
        budget.budget_fallback_allocation_from(orders, cube)
    ) == _rows(budget.budget_fallback_allocation(orders, li))
    assert _rows(
        dashboard.contributor_utilization_rollup_from(cube, supplier, nation)
    ) == _rows(
        dashboard.contributor_utilization_rollup(li, supplier, nation)
    )
    customer = spark.createDataFrame(
        [(100, "Cust#100")], "c_custkey long, c_name string"
    )
    orders_c = orders.withColumn("o_custkey", F.lit(100))
    assert _rows(
        dashboard.client_budget_rollup_from(orders_c, cube, customer)
    ) == _rows(dashboard.client_budget_rollup(orders_c, li, customer))
    assert _rows(dashboard.view_variance_detection_from(cube)) == _rows(
        dashboard.view_variance_detection(li)
    )
    from snowflake_to_bq_pipeline_spark.plans import enrichment

    cust_dim = spark.createDataFrame(
        [(100, 1)], "c_custkey long, c_nationkey long"
    )
    nation = spark.createDataFrame(
        [(1, "ALPHA", 7)], "n_nationkey long, n_name string, n_regionkey long"
    )
    region = spark.createDataFrame(
        [(7, "R7")], "r_regionkey long, r_name string"
    )
    assert _rows(
        enrichment.utilization_rollup(
            orders_c, li, cust_dim, nation, region, li_rollup=cube
        )
    ) == _rows(
        enrichment.utilization_rollup(orders_c, li, cust_dim, nation, region)
    )


def test_from_variants_equal_one_pass_real_data(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cube = budget.line_rollup(li)
    assert _rows(budget.budget_vs_actual_from(orders, cube)) == _rows(
        budget.budget_vs_actual(orders, li)
    )
    assert _rows(
        budget.individual_budget_tracking_from(orders, cube)
    ) == _rows(budget.individual_budget_tracking(orders, li))


def test_budget_family_declared_memo_consumers():
    family = {
        "budget_vs_actual",
        "individual_budget_tracking",
        "budget_fallback_allocation",
        "contributor_utilization_rollup",
        "client_budget_rollup",
        "utilization_rollup",
        "view_variance_detection",
    }
    for name in family:
        assert registry.MEMO_CONSUMERS.get(name) == ("_budget_rollup_for",)
    for name in ("pipeline_alerts", "alert_digest"):
        assert registry.MEMO_CONSUMERS.get(name) == ("_alerts_for",)


def test_budget_rollup_memo_single_build(spark, sf_dir):
    """Second family consumer must reuse the SAME persisted cube handle."""
    registry.clear_model_caches()
    registry._budget_rollup_for(spark, sf_dir)
    assert len(registry._BUDGET_ROLLUP_CACHE) == 1
    handle = next(iter(registry._BUDGET_ROLLUP_CACHE.values()))
    again = registry._budget_rollup_for(spark, sf_dir)
    assert again is handle
    assert len(registry._BUDGET_ROLLUP_CACHE) == 1
    registry.clear_model_caches()


def test_alerts_memo_single_build(spark, sf_dir):
    registry.clear_model_caches()
    a = registry._alerts_for(spark, sf_dir)
    b = registry._alerts_for(spark, sf_dir)
    assert a is b
    assert len(registry._ALERTS_CACHE) == 1
    registry.clear_model_caches()
