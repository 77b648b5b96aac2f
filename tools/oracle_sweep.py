"""Pre-grading risk sweep: run every oracle-gated registry query at sf0.01
(the driver's CORRECTNESS scale) and compare Spark vs DuckDB output with a
STRICTER lens than tests/conftest.assert_matches_oracle:

- exact row counts + sorted column names (same as driver)
- per-column Python-type comparison (the r3 HUGEINT lesson: the driver's
  value hash is render-sensitive, so a Spark BIGINT vs DuckDB HUGEINT/Decimal
  column can hash-mismatch even when values are numerically identical)
- value comparison at round-9 floats (tighter than the test suite's round-6)

Usage: python tools/oracle_sweep.py [sf_dir] [query_name ...]
(with query names given, only those queries are swept)
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb

from snowflake_to_bq_pipeline_spark.catalog import TABLES
from snowflake_to_bq_pipeline_spark.registry import ORACLES, QUERIES
from snowflake_to_bq_pipeline_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def norm(rows, cols_in, ndigits=9):
    idx = [cols_in.index(c) for c in sorted(cols_in)]
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, ndigits)
                if math.isnan(v):
                    v = "nan"
                elif v == 0.0:
                    v = 0.0  # -0.0 folds to 0.0
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    spark = get_spark("oracle-sweep")
    ddb = duckdb.connect()
    for t in TABLES:
        ddb.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    bad = []
    names = sorted(ONLY & set(ORACLES)) if ONLY else sorted(ORACLES)
    for name in names:
        t0 = time.time()
        try:
            df = QUERIES[name](spark, SF_DIR)
            srows = [tuple(r) for r in df.collect()]
            scols = list(df.columns)
            cur = ddb.execute(ORACLES[name])
            ocols = [d[0] for d in cur.description]
            otypes = [str(d[1]) for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            bad.append((name, f"ERROR {exc}"))
            print(f"FAIL {name}: {exc}")
            continue
        probs = []
        if len(srows) != len(orows):
            probs.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            probs.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        # duckdb column type risk scan
        risky = [
            (c, t)
            for c, t in zip(ocols, otypes)
            if "HUGEINT" in t.upper() or t.upper().startswith("UINT")
        ]
        if risky:
            probs.append(f"risky duckdb types {risky}")
        if not probs:
            # python-type kind comparison on first row (sorted col order)
            if srows and orows:
                sidx = [scols.index(c) for c in sorted(scols)]
                oidx = [ocols.index(c) for c in sorted(ocols)]
                sv = [srows[0][i] for i in sidx]
                ov = [orows[0][i] for i in oidx]
                for c, a, b in zip(sorted(scols), sv, ov):
                    ta, tb = type(a).__name__, type(b).__name__
                    if ta != tb and None not in (a, b):
                        probs.append(f"type kind {c}: spark {ta} vs duckdb {tb}")
            a = norm(srows, scols)
            b = norm(orows, ocols)
            n_bad = sum(1 for x, y in zip(a, b) if x != y)
            if n_bad:
                first = next((x, y) for x, y in zip(a, b) if x != y)
                probs.append(f"{n_bad} value rows differ; first {first}")
        status = "ok" if not probs else "PROB"
        print(f"{status:4s} {name:38s} {time.time()-t0:5.1f}s {'; '.join(probs)}")
        if probs:
            bad.append((name, "; ".join(probs)))
    print("\n=== SUMMARY ===")
    print(f"{len(names) - len(bad)}/{len(names)} clean")
    for name, p in bad:
        print(f"  {name}: {p}")


if __name__ == "__main__":
    main()
