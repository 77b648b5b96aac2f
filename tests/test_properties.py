"""Property-based tests (hypothesis) for the order-statistics and diff
primitives: random inputs, algebraic invariants, Python references.

Examples are capped low — each example runs real Spark jobs — but every
run explores fresh corners (hypothesis shrinks failures to minimal
cases, which is exactly what windowed/diff edge bugs need: ties, empty
groups, single-row groups)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.operators import cdc, scd
from snowflake_to_bq_pipeline_spark.operators.prefix import grouped_prefix_sum

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # group
        st.integers(min_value=0, max_value=20),  # order key
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=0,
    max_size=40,
)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_grouped_prefix_sum_matches_window(spark, rows):
    # Unique (group, order) pairs — a total order, the documented
    # requirement shared with any window cumsum.
    uniq = {(g, o): v for g, o, v in rows}
    data = [(g, o, v) for (g, o), v in sorted(uniq.items())]
    if not data:
        return
    df = spark.createDataFrame(data, "g int, o int, v long")
    got = {
        (r["g"], r["o"]): r["cs"]
        for r in grouped_prefix_sum(
            df, ["g"], ["o"], "v", out_col="cs", num_partitions=3
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["g"], r["o"]): r["cs"]
        for r in df.withColumn("cs", F.sum("v").over(w)).collect()
    }
    assert got == want


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_scd2_matches_python_reference(spark, rows):
    # (key, ts, attr) stream; tiebreak by a unique sequence number.
    data = [
        (g, o, str(v % 3), i) for i, (g, o, v) in enumerate(rows)
    ]
    if not data:
        return
    df = spark.createDataFrame(data, "k int, ts int, attr string, seq int")
    got = sorted(
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["version"],
         r["n_observations"], r["is_current"])
        for r in scd.scd2_history(
            df, ["k"], "attr", "ts", tiebreak_cols=["seq"]
        ).collect()
    )
    # Python reference: sort per key by (ts, seq), collapse runs.
    per_key: dict[int, list[tuple[int, int, str]]] = {}
    for k, ts, attr, seq in data:
        per_key.setdefault(k, []).append((ts, seq, attr))
    want = []
    for k, evs in per_key.items():
        evs.sort()
        runs: list[list] = []
        for ts, seq, attr in evs:
            if runs and runs[-1][0] == attr:
                runs[-1][2] += 1
            else:
                runs.append([attr, ts, 1])
        for i, (attr, vf, n) in enumerate(runs):
            vt = runs[i + 1][1] if i + 1 < len(runs) else None
            want.append((k, attr, vf, vt, i + 1, n, vt is None))
    assert got == sorted(want)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_snapshot_diff_changelog_replays_to_new(spark, rows):
    # Build old/new snapshots from random rows: key -> value; even keys
    # only in old beyond a cutoff, etc. — hypothesis supplies the shapes.
    old_rows = {g * 21 + o: v for g, o, v in rows[: len(rows) // 2]}
    new_rows = {g * 21 + o: v for g, o, v in rows[len(rows) // 2 :]}
    old = spark.createDataFrame(
        [(k, v) for k, v in sorted(old_rows.items())] or [(None, None)],
        "k long, v long",
    ).filter(F.col("k").isNotNull())
    new = spark.createDataFrame(
        [(k, v) for k, v in sorted(new_rows.items())] or [(None, None)],
        "k long, v long",
    ).filter(F.col("k").isNotNull())
    log = cdc.snapshot_diff(old, new, ["k"], ["v"]).collect()
    # Replay the changelog onto old: delete D, upsert I/U -> must equal new.
    state = dict(old_rows)
    for r in log:
        if r["change_op"] == "DELETE":
            state.pop(r["k"], None)
        else:
            state[r["k"]] = r["new_v"]
    assert state == new_rows
    # Changelog is minimal: no UNCHANGED rows emitted.
    for r in log:
        if r["change_op"] == "UPDATE":
            assert old_rows[r["k"]] != new_rows[r["k"]]


def test_multivariate_anomaly_partitioning_invariant(spark, sf_dir):
    """The exact-decimal sufficient statistics make the distance (and the
    flag set) a pure function of the data — any repartitioning of the
    input must produce identical rows."""
    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.operators import anomaly

    events = load_table(spark, sf_dir, "events")
    a = sorted(map(tuple, anomaly.multivariate_anomaly(events).collect()))
    b = sorted(
        map(
            tuple,
            anomaly.multivariate_anomaly(events.repartition(13)).collect(),
        )
    )
    assert a == b


def test_utilization_rollup_partitioning_invariant(spark, sf_dir):
    """The salted two-phase coarse money sum partials key on
    pmod(o_orderkey, 4096) — a pure function of the data, not of task
    layout — and both sum levels are exact (long, then decimal(38,0)),
    so any repartitioning must produce identical rollup rows."""
    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.plans.enrichment import (
        utilization_rollup,
    )

    t = {
        n: load_table(spark, sf_dir, n)
        for n in ("orders", "lineitem", "customer", "nation", "region")
    }
    a = sorted(
        map(
            tuple,
            utilization_rollup(
                t["orders"], t["lineitem"], t["customer"],
                t["nation"], t["region"],
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            utilization_rollup(
                t["orders"].repartition(13), t["lineitem"].repartition(7),
                t["customer"].repartition(3), t["nation"], t["region"],
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_alert_digest_partitioning_invariant(spark, sf_dir):
    """Worst-offender and top-action picks ride deterministic tie-breaks,
    so the digest must not depend on partitioning."""
    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.operators import alerts

    ev = load_table(spark, sf_dir, "events")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = sorted(map(tuple, alerts.alert_digest(ev, od, li).collect()))
    b = sorted(
        map(
            tuple,
            alerts.alert_digest(
                ev.repartition(17), od.repartition(5), li.repartition(7)
            ).collect(),
        )
    )
    assert a == b


def test_cross_split_contamination_partitioning_invariant(spark, sf_dir):
    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(
        map(tuple, curation.cross_split_contamination(docs).collect())
    )
    b = sorted(
        map(
            tuple,
            curation.cross_split_contamination(docs.repartition(11)).collect(),
        )
    )
    assert a == b
