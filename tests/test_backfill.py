"""Resumable progressive backfill: interrupt-and-resume must converge to
the uninterrupted full sync, steps must be idempotent, and the tracker
must advance monotonically."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.catalog import load_table
from snowflake_to_bq_pipeline_spark.operators import backfill


def _rows(df, cols=("o_orderkey",)):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_resumed_backfill_equals_uninterrupted(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")

    # Uninterrupted run.
    t_full = str(tmp_path / "t_full")
    s_full = str(tmp_path / "s_full")
    done_full = backfill.run_backfill(
        spark, orders, "o_orderdate", t_full, s_full, chunk_days=60
    )
    assert len(done_full) >= 2, "need multiple chunks for a meaningful test"

    # Interrupted run: stop after 1 step, then resume to completion.
    t_int = str(tmp_path / "t_int")
    s_int = str(tmp_path / "s_int")
    first = backfill.run_backfill(
        spark, orders, "o_orderdate", t_int, s_int, chunk_days=60, max_steps=1
    )
    assert len(first) == 1
    assert len(backfill.pending_chunks(spark, s_int)) == len(done_full) - 1
    resumed = backfill.run_backfill(
        spark, orders, "o_orderdate", t_int, s_int, chunk_days=60
    )
    # Resume picks up AFTER the completed chunk — no re-extraction.
    assert sorted(first + resumed) == sorted(done_full)
    assert set(first).isdisjoint(resumed)

    full_rows = _rows(spark.read.parquet(t_full))
    int_rows = _rows(spark.read.parquet(t_int))
    src_rows = _rows(orders)
    assert int_rows == full_rows == src_rows


def test_backfill_step_is_idempotent(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    target = str(tmp_path / "target")
    state = str(tmp_path / "state")
    backfill.init_backfill_state(
        spark, orders, "o_orderdate", state, chunk_days=60
    )
    first = backfill.run_backfill_step(
        spark, orders, "o_orderdate", target, state
    )
    count_after_first = spark.read.parquet(target).count()

    # Simulate the crash-replay window: data written, state not committed —
    # re-running the same chunk must overwrite its own partitions, not
    # duplicate them. Reset the chunk to PENDING and re-run.
    st = spark.read.parquet(state)
    reset = st.withColumn(
        "status",
        F.when(
            F.col("chunk_id") == first, F.lit(backfill.STATUS_PENDING)
        ).otherwise(F.col("status")),
    )
    backfill._write_state_atomic(reset, state)
    replay = backfill.run_backfill_step(
        spark, orders, "o_orderdate", target, state
    )
    assert replay == first
    assert spark.read.parquet(target).count() == count_after_first


def test_backfill_state_survives_and_advances(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    state = str(tmp_path / "state")
    target = str(tmp_path / "target")
    st0 = backfill.init_backfill_state(
        spark, orders, "o_orderdate", state, chunk_days=30
    )
    n_chunks = st0.count()
    assert n_chunks >= 2
    # init on existing state is a no-op load (the resume contract).
    assert (
        backfill.init_backfill_state(
            spark, orders, "o_orderdate", state, chunk_days=30
        ).count()
        == n_chunks
    )
    done = []
    while True:
        c = backfill.run_backfill_step(
            spark, orders, "o_orderdate", target, state, step_no=len(done)
        )
        if c is None:
            break
        done.append(c)
    assert done == sorted(done), "chunks must advance in order"
    assert len(done) == n_chunks
    final = spark.read.parquet(state)
    assert final.filter(F.col("status") == backfill.STATUS_PENDING).count() == 0
    steps = {
        r.chunk_id: r.synced_in_step
        for r in final.select("chunk_id", "synced_in_step").collect()
    }
    assert sorted(steps.values()) == list(range(n_chunks))


def test_backfill_progress_covers_all_rows(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    prog = backfill.backfill_progress(orders, "o_orderdate", chunk_days=30)
    rows = prog.orderBy("chunk_id").collect()
    assert rows[-1].rows_cum == orders.count()
    assert abs(rows[-1].coverage_frac - 1.0) < 1e-9
    assert all(
        rows[i].rows_cum < rows[i + 1].rows_cum for i in range(len(rows) - 1)
    )
