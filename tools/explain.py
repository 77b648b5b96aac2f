"""Dump the executed physical plan of any registry query — the audit loop
behind the plan-shape tests (pushdown / broadcast / no-cartesian claims
should be READ, not assumed).

Usage: python tools/explain.py QUERY [QUERY ...] [--sf-dir DIR] [--mode M]
  mode: formatted (default) | extended | codegen | cost
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from snowflake_to_bq_pipeline_spark.registry import QUERIES
from snowflake_to_bq_pipeline_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--mode", default="formatted")
    args = ap.parse_args()

    spark = get_spark(app_name="explain")
    rc = 0
    for name in args.queries:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"unknown query: {name}", file=sys.stderr)
            rc = 2
            continue
        print(f"==== {name} ({args.mode}) ====")
        fn(spark, args.sf_dir).explain(args.mode)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
