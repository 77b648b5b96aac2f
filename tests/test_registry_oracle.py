"""Every registered query with an oracle must hash-match DuckDB at sf0.001 —
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from snowflake_to_bq_pipeline_spark.registry import ORACLES, QUERIES

from .conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, ddb):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ddb, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
