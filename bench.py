"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is materialized through the noop sink — every column is computed
and shipped through the full physical plan, but nothing is written, so the
number is plan execution, not disk bandwidth.

Per-query timings are BEST-OF-N (N = $BENCH_REPS, default 3) with every
rep recorded: single-shot runs on this VM showed a 157-184s same-code
total spread and multi-second phantom spikes on random queries (the r5
volume_anomaly 4.18s that re-measured at 0.65s), so round-over-round
deltas are only readable from a best-of series plus its spread.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.registry import (
    MEMO_CONSUMERS,
    QUERIES,
    clear_model_caches,
)
from snowflake_to_bq_pipeline_spark.session import get_spark

# Every registry query is benched (sorted for stable ordering) so
# per-query deltas are comparable round over round and no registered
# operator escapes the perf signal.
BENCH_QUERIES = sorted(QUERIES)

#: Rows in the VM-calibration probe. Module-level so tests can shrink it.
CALIBRATION_ROWS = 20_000_000


def calibration_probe(spark, n_rows: int = CALIBRATION_ROWS):
    """Fixed, code-independent probe (range → hash-agg → shuffle → sort)
    whose best-of-3 time calibrates the VM: the r7 control experiment
    showed whole-run bench totals swing ~30% between benching DAYS on
    identical code, so cross-round totals must be normalized by the
    calibration ratio before a delta is read as an engine change
    (tools/bench_diff.py does this when both artifacts carry it)."""
    return (
        spark.range(0, n_rows, 1, 32)
        # modulo BEFORE summing: raw xxhash64 longs overflow ANSI long
        # addition over tens of millions of rows
        .selectExpr("id % 9973 AS k", "xxhash64(id) % 1000003 AS h")
        .groupBy("k")
        .sum("h")
        .orderBy("k")
    )


def calibration_probe_mc(spark, n_rows: int = CALIBRATION_ROWS):
    """Second, SHUFFLE-heavy probe: a global sort of ``n_rows`` hashed
    longs — a full range-partitioned exchange (~160 MB of shuffle write
    + read across all cores) where the hash-agg probe above collapses to
    9,973 groups map-side and barely touches the shuffle machinery.
    Motivation (r9, README): three same-code benches in one day slowed
    monotonically (93.7 → 111.9s) while the agg probe stayed flat — the
    drift lives in I/O / multi-core contention the first probe never
    exercises. Recording both lets bench_diff adjudicate which regime a
    cross-round delta comes from."""
    return spark.range(0, n_rows, 1, 32).orderBy(F.xxhash64("id"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("BENCH_REPS", "3")))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    # Warm each query's codegen/JIT at the smallest SF so timings measure
    # steady-state execution, not one-time compilation — only needed for
    # single-shot runs: with reps >= 2 the first timed rep absorbs the
    # compilation and best-of-N discards it, so the separate warm pass
    # (~5 min of wall clock per bench run) is pure overhead.
    warm_dir = "/root/testdata/sf0.001"
    if reps < 2:
        for name in BENCH_QUERIES:
            fn = QUERIES.get(name)
            if fn is not None and os.path.isdir(warm_dir):
                fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
    # Prime the OS page cache for the benched SF's parquet files so the
    # one-time cold read doesn't land on whichever query alphabetically
    # touches each table first (it distorted early b*-queries by ~2-3s).
    for fname in sorted(os.listdir(sf_dir)):
        if fname.endswith(".parquet"):
            with open(os.path.join(sf_dir, fname), "rb") as f:
                while f.read(1 << 22):
                    pass

    calib = None
    for _ in range(3):
        t0 = time.perf_counter()
        calibration_probe(spark).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        calib = dt if calib is None else min(calib, dt)
    calib = round(calib, 3)
    print(f"# vm_calibration: {calib}s", file=sys.stderr)
    calib_mc = None
    for _ in range(3):
        t0 = time.perf_counter()
        calibration_probe_mc(spark).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        calib_mc = dt if calib_mc is None else min(calib_mc, dt)
    calib_mc = round(calib_mc, 3)
    print(f"# vm_calibration_mc: {calib_mc}s", file=sys.stderr)

    # Memo provenance, computed up front: queries riding a cross-query
    # fingerprint memo record warm-memo bests — the shared build cost
    # (shingle index, tok counts, k-means model, ...) lands only in the
    # first rep of that memo's first benched consumer (the "cold
    # carrier"). Each carrier gets an EXPLICIT clear_model_caches()
    # before its rep loop so its first rep is a guaranteed-cold measure
    # (recorded as cold_best below) instead of depending on bench
    # ordering; best-of-N still discards it, so `queries` stays the warm
    # best it has always been.
    cold_carriers: dict[str, str] = {}
    for name in BENCH_QUERIES:
        for helper in MEMO_CONSUMERS.get(name, ()):
            cold_carriers.setdefault(helper, name)
    carrier_queries = set(cold_carriers.values())

    bests: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    cold_bests: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        # Collect garbage OUTSIDE the timed region: accumulated noop-write
        # garbage otherwise lands a multi-second GC pause on whichever
        # query happens to trigger it — one collection per query (not per
        # rep) keeps the fixed System.gc() cost off the rep loop.
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        if name in carrier_queries and reps >= 2:
            # cold carrier: drop every memo so rep 1 pays this query's
            # full memo build — the honest cold time for its cohort.
            # (Any other memo cleared here rebuilds in its next
            # consumer's rep 1, which best-of-N >= 2 discards.)
            # With reps == 1 there is no later rep to absorb the cold
            # build, so clearing would silently turn every carrier's ONLY
            # recorded time into a cold-build time and spray memo rebuilds
            # into downstream consumers' single rep — skip, matching the
            # cold_bests gate below.
            clear_model_caches()
        ts: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        # Stall-window guard (r15, additive): this VM exhibits recurring
        # multi-second stall windows; when all N reps land inside one,
        # the rep series is still strictly descending at rep N and
        # best-of-N records a number that never reached steady state
        # (r14: cross_source_ngram_overlap [8.76, 5.85, 3.88]).  Extend
        # the series — only while the LAST rep is both the minimum and
        # still >=5% below the previous rep — up to $BENCH_MAX_REPS
        # (default 6) total, so the recorded best is a warm steady-state
        # number.  Flat or rebounding series never extend, and the
        # cold_best capture below still reads ts[0].
        max_reps = max(reps, int(os.environ.get("BENCH_MAX_REPS", "6")))
        while (
            reps >= 2
            and len(ts) < max_reps
            and ts[-1] == min(ts)
            and ts[-1] < 0.95 * ts[-2]
        ):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        bests[name] = min(ts)
        all_reps[name] = ts
        if name in carrier_queries and reps >= 2:
            cold_bests[name] = ts[0]
        print(
            f"# {name}: best {bests[name]}s of {ts}", file=sys.stderr
        )

    total = round(sum(bests.values()), 3)
    spreads = {n: round(max(ts) - min(ts), 3) for n, ts in all_reps.items()}
    # The full per-query map outgrew the driver's tail capture in round 2
    # (BENCH_r02 "parsed": null) — keep complete timings (best + every rep
    # + spread per query) in a sidecar file and print a compact one-line
    # JSON that fits any tail window: total, sf, rep count, and only the 5
    # slowest queries.
    details_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_details.json"
    )
    with open(details_path, "w") as f:
        json.dump(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "reps": reps,
                "queries": bests,
                "rep_times": all_reps,
                "spreads": spreads,
                "memo_consumers": {
                    n: list(hs) for n, hs in sorted(MEMO_CONSUMERS.items())
                },
                "memo_cold_carriers": cold_carriers,
                # carrier query -> its guaranteed-cold rep-1 time (memos
                # explicitly cleared first): the honest full-build cost
                # of that query's memo cohort, vs its warm best above
                "cold_best": cold_bests,
                "vm_calibration_sec": calib,
                # shuffle-heavy multi-core probe: adjudicates I/O /
                # contention drift the CPU probe misses (README r9 note)
                "vm_calibration_mc_sec": calib_mc,
                "sf": sf,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    slowest = dict(
        sorted(bests.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "sf": sf,
                "n_queries": len(bests),
                "reps": reps,
                "max_spread_sec": max(spreads.values()) if spreads else 0.0,
                "vm_calibration_sec": calib,
                "vm_calibration_mc_sec": calib_mc,
                "details": "bench_details.json",
            }
        )
    )


if __name__ == "__main__":
    main()
