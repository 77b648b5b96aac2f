"""Unit tests for shared column expressions and the SQL surface."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark import catalog, functions as fn


def test_safe_divide_null_on_zero(spark):
    df = spark.createDataFrame([(10.0, 2.0), (5.0, 0.0)], "num double, den double")
    out = df.select(fn.safe_divide(F.col("num"), F.col("den")).alias("q")).collect()
    assert out[0].q == 5.0
    assert out[1].q is None


def test_budget_status_boundaries(spark):
    rows = [(100.0, 101.0), (100.0, 81.0), (100.0, 80.0), (0.0, 50.0)]
    df = spark.createDataFrame(rows, "b double, a double")
    got = [
        r.s
        for r in df.select(
            fn.budget_status(F.col("b"), F.col("a")).alias("s")
        ).collect()
    ]
    assert got == [
        "OVER_BUDGET", "APPROACHING_BUDGET", "WITHIN_BUDGET", "NO_BUDGET_SET"
    ]


def test_schedule_status(spark):
    now = dt.datetime(2020, 1, 10)
    rows = [
        (dt.datetime(2020, 1, 5), False),   # past due, open -> OVERDUE
        (dt.datetime(2020, 1, 12), False),  # within 3 days -> DUE_SOON
        (dt.datetime(2020, 2, 1), False),   # far out -> ON_TRACK
        (dt.datetime(2020, 1, 5), True),    # past due but completed -> ON_TRACK
        (None, False),                      # no due date -> ON_TRACK
    ]
    df = spark.createDataFrame(rows, "due timestamp, done boolean")
    got = [
        r.s
        for r in df.select(
            fn.schedule_status(
                F.col("due"), F.col("done"), F.lit(now).cast("timestamp")
            ).alias("s")
        ).collect()
    ]
    assert got == ["OVERDUE", "DUE_SOON", "ON_TRACK", "ON_TRACK", "ON_TRACK"]


def test_money_decimal_roundtrip(spark):
    df = spark.createDataFrame([(1.005,), (2.675,)], "x double")
    out = df.select(fn.money(fn.dec(F.col("x"))).alias("m")).collect()
    assert all(isinstance(r.m, float) for r in out)


def test_coarse_rollup_micros_sum_survives_long_overflow(spark):
    """Regression: utilization_rollup's coarse (region, nation) grain must
    not wrap when the nation-level micros sum exceeds 2^63. 12 orders of
    9e11 currency units sum to 1.08e19 micros — past long max — so a
    single-level long sum would silently go negative; the salted
    two-phase sum (long partials per pmod(o_orderkey, 4096) bucket, then
    decimal(38,0) final) must return the exact total."""
    from snowflake_to_bq_pipeline_spark.plans.enrichment import utilization_rollup

    n_orders = 12
    per_order = 9e11  # currency units; 9e17 micros per row fits a long
    orders = spark.createDataFrame(
        [(i, 1, per_order) for i in range(n_orders)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    lineitem = spark.createDataFrame(
        [(i, per_order, 0.0) for i in range(n_orders)],
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    customer = spark.createDataFrame([(1, 7)], "c_custkey long, c_nationkey long")
    nation = spark.createDataFrame(
        [(7, "N7", 3)], "n_nationkey long, n_name string, n_regionkey long"
    )
    region = spark.createDataFrame([(3, "R3")], "r_regionkey long, r_name string")
    row = utilization_rollup(orders, lineitem, customer, nation, region).collect()[0]
    expect = float(n_orders) * per_order
    assert row.order_count == n_orders
    assert row.budget_total == expect, row.budget_total
    assert row.actual_total == expect, row.actual_total
    assert row.budget_total > 0  # the wrapped long path goes negative


def test_sql_surface_via_registered_views(spark, sf_dir):
    catalog.register_views(spark, sf_dir)
    out = spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )
    rows = out.collect()
    assert sum(r.n_customers for r in rows) == spark.table("customer").count()


def test_flatten_json_typed_extraction(spark):
    from snowflake_to_bq_pipeline_spark.operators.semistructured import (
        flatten_json,
    )

    df = spark.createDataFrame(
        [
            (1, '{"k": 5, "s": "x"}'),
            (2, '{"k": "notanint"}'),
            (3, '{"other": 1}'),
            (4, None),
        ],
        "id long, props string",
    )
    out = flatten_json(
        df, "props", [("k", "$.k", "long"), ("s", "$.s", "string")]
    )
    rows = {r["id"]: (r["k"], r["s"]) for r in out.collect()}
    assert rows[1] == (5, "x")
    assert rows[2] == (None, None)
    assert rows[3] == (None, None)
    assert rows[4] == (None, None)
