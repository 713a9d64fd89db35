"""Engine-wide plan sweep: anti-pattern assertions over EVERY catalog
query's physical plan at the smallest fixture SF.

Two classes of plan node must never appear uninvited:

- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan. The
  engine's contract is Arrow-vectorized Python only (ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas are fine).
- ``CartesianProduct`` — an unbounded all-pairs join. The only
  sanctioned occurrence is the levenshtein name-pair query, which
  cross-joins two TINY pre-limited relations by design (and says so).

Construction-only (no execution): ``executedPlan`` triggers analysis +
physical planning, not jobs — except the fuzzy-dedup operators' eager
signature checkpoints, which is why the sweep runs at sf0.001.
"""

from __future__ import annotations

import pytest

from insurance_helper_spark.queries import catalog

SWEEP_SF = "/root/testdata/sf0.001"

# query → plan fragment it is allowed to contain, with the reason.
CARTESIAN_ALLOWED = {
    # bounded theta-join over two ≤60-row name relations (query limits
    # both sides before the product; see relational_ext docstring)
    "levenshtein_name_pairs",
}


def _all_names():
    catalog.load_all()
    return sorted(catalog.QUERIES)


@pytest.mark.parametrize("name", _all_names())
def test_no_rowwise_python_and_no_unbounded_cartesian(spark, name):
    df = catalog.QUERIES[name](spark, SWEEP_SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in CARTESIAN_ALLOWED:
        assert "CartesianProduct" not in plan, f"{name}: unbounded cartesian"
