"""Split each query's cost into plan-construct vs execute time (guide §1).

Construct = calling the registry function (Python DataFrame composition +
py4j roundtrips + any driver-side model work / memo builds).
Exec = the noop-sink write of the already-built DataFrame (Catalyst
analysis/optimization + job execution).

Usage: python tools/profile_construct.py q1 q2 ...   [BENCH_REPS, default 2]
Reports best-of-N for each phase; rep 1 of a memo carrier pays the memo
build inside "construct", so read the WARM numbers for steady state.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from snowflake_to_bq_pipeline_spark.registry import QUERIES
from snowflake_to_bq_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("BENCH_REPS", "2"))
    names = sys.argv[1:]
    spark = get_spark(app_name="profile-construct")
    warm = "/root/testdata/sf0.001"
    for name in names:
        QUERIES[name](spark, warm).write.format("noop").mode(
            "overwrite"
        ).save()
    print(f"{'query':34s} {'construct':>10s} {'exec':>10s} {'total':>10s}")
    for name in names:
        bc = be = None
        for _ in range(reps):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            bc = t1 - t0 if bc is None else min(bc, t1 - t0)
            be = t2 - t1 if be is None else min(be, t2 - t1)
        print(f"{name:34s} {bc:9.3f}s {be:9.3f}s {bc + be:9.3f}s")


if __name__ == "__main__":
    main()
