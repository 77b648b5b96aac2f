"""CLI surface: the runnable entry point a reference user has.

Runs main(argv) in-process (get_spark reuses the active test session via
getOrCreate), so these are real end-to-end invocations of the argparse
surface without a second JVM.
"""

from __future__ import annotations

import json

from snowflake_to_bq_pipeline_spark.__main__ import main
from snowflake_to_bq_pipeline_spark.registry import ORACLES, QUERIES


def test_cli_list_names_every_query(spark, capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == len(QUERIES)
    markers = dict(line.split("\t") for line in out)
    assert set(markers) == set(QUERIES)
    assert all(
        m == ("oracle" if n in ORACLES else "rows-only")
        for n, m in markers.items()
    )


def test_cli_run_writes_parquet(spark, sf_dir, tmp_path, capsys):
    out_dir = str(tmp_path / "q1_out")
    rc = main(
        ["run", "q1_pricing_summary", "--sf-dir", sf_dir, "--out", out_dir]
    )
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["query"] == "q1_pricing_summary"
    assert payload["rows"] > 0
    assert spark.read.parquet(out_dir).count() == payload["rows"]


def test_cli_run_unknown_query_fails_loudly(spark, capsys):
    assert main(["run", "no_such_query"]) == 2
    assert "unknown query" in capsys.readouterr().err
