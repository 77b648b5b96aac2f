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


#: committed evidence artifact -> the sources that generate it.  An
#: artifact older than its newest generator change is STALE EVIDENCE —
#: r8 shipped exactly that (new smoke sections committed, JSONs never
#: regenerated), so the drive now fails on it (VERDICT r8 item 6).
_ARTIFACT_GENERATORS = {
    "SKEW_SMOKE.json": (
        "tools/skew_smoke.py",
        "snowflake_to_bq_pipeline_spark/operators/neardup.py",
    ),
    "SCALE_SMOKE.json": (
        "tools/scale_smoke.py",
        "snowflake_to_bq_pipeline_spark/operators/neardup.py",
    ),
    # Bench numbers depend on every plan under test, not just the harness:
    # a registry/operator change that never touches bench.py still
    # invalidates the recorded timings (ADVICE r9). Directory generators
    # resolve to the newest change across their tree.
    "bench_details.json": (
        "bench.py",
        "snowflake_to_bq_pipeline_spark/registry",
        "snowflake_to_bq_pipeline_spark/operators",
        "snowflake_to_bq_pipeline_spark/plans",
    ),
}


def _effective_ts(repo: str, rel: str) -> int:
    """Last-commit unix time of ``rel``; falls back to filesystem mtime
    when the working tree carries uncommitted changes to it (so an
    in-round regenerate counts as fresh before the snapshot commit).
    Directories resolve to the newest timestamp across their ``*.py``
    tree. Timestamps are committer times (%ct), which assume the linear
    append-only history this repo uses — an amend/rebase could reorder
    them; if history rewriting ever enters the flow, compare topological
    order (git merge-base --is-ancestor) instead (ADVICE r9)."""
    import subprocess

    path = os.path.join(repo, rel)
    if os.path.isdir(path):
        ts = 0
        for root, _dirs, files in os.walk(path):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    sub = os.path.relpath(os.path.join(root, f), repo)
                    ts = max(ts, _effective_ts(repo, sub))
        return ts
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--", rel],
        cwd=repo, capture_output=True, text=True,
    ).stdout.strip()
    if dirty:
        return int(os.stat(path).st_mtime)
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--", rel],
        cwd=repo, capture_output=True, text=True,
    ).stdout.strip()
    return int(out) if out else 0


def check_artifact_freshness(repo: str) -> list[str]:
    """Names of committed evidence artifacts older than their newest
    generator change (empty = all fresh)."""
    stale = []
    for artifact, gens in _ARTIFACT_GENERATORS.items():
        if not os.path.exists(os.path.join(repo, artifact)):
            continue
        a_ts = _effective_ts(repo, artifact)
        for g in gens:
            g_ts = _effective_ts(repo, g)
            if g_ts > a_ts:
                stale.append(f"{artifact} (older than {g})")
                break
    return stale


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
    # Freshness gate LAST so a stale-artifact state still yields the full
    # correctness diagnostics above before failing the drive.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stale = check_artifact_freshness(repo)
    if stale:
        print("STALE EVIDENCE ARTIFACTS (regenerate before snapshot):")
        for s in stale:
            print(" ", s)
        return 2
    print("VERIFY DRIVE CLEAN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
