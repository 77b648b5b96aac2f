"""Suite-wide physical-plan hygiene: EVERY registered query must plan
without the two classic scale-killers, regardless of which operator file
it came from:

- ``CartesianProduct`` — an unbroadcast cross join (all-pairs work). The
  1-row stats joins used across the repo plan as BroadcastNestedLoopJoin,
  which is fine and stays allowed.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan. Arrow
  paths (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas /
  FlatMapGroupsWithState) are the sanctioned Python boundary.

The spot plan tests in test_plans.py pin specific shapes; this sweep is
the regression net for every NEW query added later.
"""

from __future__ import annotations

import pytest

from snowflake_to_bq_pipeline_spark.registry import QUERIES

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_or_rowwise_python(name, spark, sf_dir):
    plan = (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in FORBIDDEN:
        assert marker not in plan, f"{name} plans a {marker}:\n{plan[:1500]}"
