"""Seeded-outlier fixture for the multivariate anomaly score: a day whose
features are each individually in range but break the volume↔value
correlation must dominate the Mahalanobis ranking (the case univariate
z-scores structurally miss)."""

from __future__ import annotations

import datetime as dt

from snowflake_to_bq_pipeline_spark.operators import anomaly


def _mk_events(spark):
    rows = []
    eid = 0
    base = dt.datetime(2025, 1, 1, 0, 0, 0)
    for i in range(40):
        day = base + dt.timedelta(days=i)
        if i == 20:
            # seeded correlation break: HIGH volume (68 = top of range)
            # paired with the LOW-volume day's value level (35.0, normal
            # for n=50 days) — both features individually inside history
            n, value = 68, 35.0
        else:
            n = 50 + (i % 7) * 3
            value = 10.0 + 0.5 * n + ((i % 5) - 2) * 0.3
        hour = 8 + (i % 5)
        for j in range(n):
            ts = day + dt.timedelta(hours=hour, seconds=j)
            rows.append((eid, ts, 1000 + j, "s1", value, "{}"))
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_correlation_break_dominates_ranking(spark):
    out = anomaly.multivariate_anomaly(_mk_events(spark)).collect()
    assert len(out) == 40
    by_day = {r.day.isoformat(): r for r in out}
    seed = by_day["2025-01-21"]
    assert seed.md_rank == 1
    assert seed.is_anomaly
    # univariate features of the seeded day sit INSIDE history
    counts = sorted(r.event_count for r in out)
    values = sorted(r.avg_value for r in out)
    assert counts[0] <= seed.event_count <= counts[-1]
    assert values[0] <= seed.avg_value <= values[-1]
    # the joint score separates decisively from the runner-up
    second = next(r for r in out if r.md_rank == 2)
    assert seed.mahalanobis > 2 * second.mahalanobis
    # contamination fraction: floor(0.1 * 40) = 4 days flagged
    assert sum(1 for r in out if r.is_anomaly) == 4


def test_singular_covariance_yields_null_not_garbage(spark):
    """Perfectly collinear features (zero residual) make the covariance
    singular: distances must be NULL and nothing may flag."""
    import datetime as dt

    rows = []
    eid = 0
    base = dt.datetime(2025, 1, 1, 0, 0, 0)
    for i in range(10):
        day = base + dt.timedelta(days=i)
        n = 50 + (i % 7) * 3
        for j in range(n):
            # value and hour are exact functions of volume -> rank-1 cov
            ts = day + dt.timedelta(hours=8, seconds=j)
            rows.append((eid, ts, 1, "s1", float(n), "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = anomaly.multivariate_anomaly(events).collect()
    assert len(out) == 10
    assert all(r.mahalanobis is None for r in out)
    assert not any(r.is_anomaly for r in out)
