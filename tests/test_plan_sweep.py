"""Engine-wide plan sweep: anti-pattern assertions over EVERY catalog
query's physical plan at the smallest fixture SF.

Two classes of plan node must never appear uninvited:

- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan. The
  engine's contract is Arrow-vectorized Python only (ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas are fine).
- ``CartesianProduct`` — an unbounded all-pairs join. Zero exceptions:
  even the theta-join queries (levenshtein pairs, range joins) ride a
  BroadcastNestedLoopJoin over a fixed-size broadcast side.

Construction-only (no execution): ``executedPlan`` triggers analysis +
physical planning, not jobs — except the fuzzy-dedup operators' eager
signature checkpoints, which is why the sweep runs at sf0.001.
"""

from __future__ import annotations

import pytest

from insurance_helper_spark.queries import catalog

SWEEP_SF = "/root/testdata/sf0.001"


def _all_names():
    catalog.load_all()
    return sorted(catalog.QUERIES)


@pytest.mark.parametrize("name", _all_names())
def test_no_rowwise_python_and_no_unbounded_cartesian(spark, name):
    df = catalog.QUERIES[name](spark, SWEEP_SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    assert "CartesianProduct" not in plan, f"{name}: unbounded cartesian"
