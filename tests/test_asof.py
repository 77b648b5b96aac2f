"""as-of join semantics, incl. the NULL-payload case: the whole payload
must come from the single matched right row (never stitched across rows)."""

from __future__ import annotations

import datetime as dt

from snowflake_to_bq_pipeline_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_null_payload_not_backfilled_from_older_row(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "click")],
        "user_id int, ts timestamp, kind string",
    )
    # Newest preceding right row (09:30) has price=NULL, qty=7. A per-column
    # carry would pull price=5.0 from the 09:00 row — wrong row's value.
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 5.0, 3),
            (1, _ts("2024-01-01T09:30:00"), None, 7),
        ],
        "user_id int, rts timestamp, price double, qty int",
    )
    row = asof_join(
        left, right, ["user_id"], "ts", "rts", ["price", "qty"]
    ).collect()[0]
    assert row.asof_qty == 7
    assert row.asof_price is None


def test_asof_no_preceding_right_row_gives_null_payload(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T08:00:00"), "early")],
        "user_id int, ts timestamp, kind string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 5.0, 3)],
        "user_id int, rts timestamp, price double, qty int",
    )
    row = asof_join(
        left, right, ["user_id"], "ts", "rts", ["price", "qty"]
    ).collect()[0]
    assert row.asof_price is None and row.asof_qty is None


def test_asof_equal_timestamp_matches(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), "same")],
        "user_id int, ts timestamp, kind string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 5.0, 3)],
        "user_id int, rts timestamp, price double, qty int",
    )
    row = asof_join(
        left, right, ["user_id"], "ts", "rts", ["price", "qty"]
    ).collect()[0]
    assert row.asof_price == 5.0 and row.asof_qty == 3
