"""Time a subset of registry queries at sf0.1 (dev loop for perf work).

Usage: python tools/bench_some.py q1 q2 ...  [repeats via BENCH_REPS env]
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
    spark = get_spark(app_name="bench-some")
    warm = "/root/testdata/sf0.001"
    for name in names:
        QUERIES[name](spark, warm).write.format("noop").mode("overwrite").save()
    for name in names:
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{best:6.2f}s  {name}")


if __name__ == "__main__":
    main()
