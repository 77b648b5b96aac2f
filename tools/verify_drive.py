"""Driver-style end-to-end verification, one command.

Drives `__spark_entry__.py` exactly the way the correctness driver does —
a PLAIN SparkSession (no engine-tuned conf, catching hidden dependencies
on the session factory), every `queries()` entry executed at sf0.01 and
compared row-for-row against its `oracle_sql()` in DuckDB (columns
sorted by name, floats rounded to 6, NaN-safe). Rows-only ops are run
and row-counted.

Usage: python tools/verify_drive.py [sf_dir]   (default /root/testdata/sf0.01)
Exit 0 = clean; nonzero prints the mismatched query names.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    return v


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    print("entry rows:", len(E.entry(spark).collect()))

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    fails = []
    for name, fn in sorted(qs.items()):
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        if name not in oracles:
            print(f"{name} rows-only {len(srows)}")
            continue
        cur = con.execute(oracles[name])
        orows = cur.fetchall()
        ocols = [d[0] for d in cur.description]
        scols = list(sdf.columns)
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        a = sorted(tuple(repr(norm(r[i])) for i in sidx) for r in srows)
        b = sorted(tuple(repr(norm(r[i])) for i in oidx) for r in orows)
        ok = sorted(scols) == sorted(ocols) and a == b
        print(name, len(srows), "vs", len(orows), "OK" if ok else "MISMATCH")
        if not ok:
            fails.append(name)
    if fails:
        print("FAILED:", fails)
        return 1
    print("VERIFY DRIVE CLEAN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
