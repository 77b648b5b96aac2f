"""Interval-join semantics: bin-boundary points, multi-bin intervals,
no duplicate matches, and the no-nested-loop plan guarantee."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.operators import ranges


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_interval_join_matches_and_boundaries(spark):
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(10)), (2, _ts(30), _ts(31))],
        "iid long, s timestamp, e timestamp",
    )
    points = spark.createDataFrame(
        [
            (100, _ts(0)),        # start inclusive -> iid 1
            (101, _ts(9, 59)),    # inside -> iid 1
            (102, _ts(10)),       # end exclusive -> no match
            (103, _ts(30, 30)),   # inside short interval -> iid 2
            (104, _ts(29, 59)),   # just before -> no match
        ],
        "pid long, ts timestamp",
    )
    got = {
        (r.iid, r.pid)
        for r in ranges.interval_join(
            points, intervals, "ts", "s", "e", bin_seconds=60
        ).collect()
    }
    assert got == {(1, 100), (1, 101), (2, 103)}


def test_interval_spanning_many_bins_no_duplicates(spark):
    # 10-minute interval vs 1-minute bins: interval explodes over 10 bins,
    # but each matched point must appear exactly once.
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(10))], "iid long, s timestamp, e timestamp"
    )
    points = spark.createDataFrame(
        [(i, _ts(i)) for i in range(10)], "pid long, ts timestamp"
    )
    rows = ranges.interval_join(
        points, intervals, "ts", "s", "e", bin_seconds=60
    ).collect()
    assert len(rows) == 10
    assert len({r.pid for r in rows}) == 10


def test_interval_join_plan_has_no_nested_loop(spark, sf_dir):
    from snowflake_to_bq_pipeline_spark.registry import QUERIES

    plan = (
        QUERIES["error_window_events"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_open_intervals_conservation(spark, sf_dir):
    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.registry import QUERIES

    out = QUERIES["open_orders_by_day"](spark, sf_dir).orderBy("day").collect()
    orders_n = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_opened"] for r in out) == orders_n
    assert sum(r["n_closed"] for r in out) == orders_n
    # Running count never negative; everything eventually closes.
    assert all(r["open_intervals"] >= 0 for r in out)
    assert out[-1]["open_intervals"] == 0
