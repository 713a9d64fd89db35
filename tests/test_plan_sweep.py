"""Engine-wide plan sweep: anti-pattern assertions over EVERY catalog
query's physical plan at the smallest fixture SF.

Two classes of plan node must never appear uninvited:

- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan. The
  engine's contract is Arrow-vectorized Python only (ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas are fine).
- ``CartesianProduct`` — an unbounded all-pairs join. Zero exceptions:
  even the theta-join queries (levenshtein pairs, range joins) ride a
  BroadcastNestedLoopJoin over a fixed-size broadcast side.
- An **UnboundedFollowing window frame with a non-unbounded lower
  bound** (``X .. UNBOUNDED FOLLOWING``). Spark evaluates this with
  ``UnboundedFollowingWindowFunctionFrame``, which re-aggregates from
  the current row to the partition end FOR EVERY ROW — O(n^2) per
  partition. An unpartitioned one over an unreduced relation is a
  scale-killer (this exact shape made ``ml_pr_curve_thresholds`` take
  ~550 s at sf0.1 in round 8). Full-partition frames
  (``UNBOUNDED PRECEDING .. UNBOUNDED FOLLOWING`` →
  ``UnboundedWindowFunctionFrame``, computed once per partition) and
  running frames (``UNBOUNDED PRECEDING .. X``) stay allowed.
  Suffix aggregates must be derived as total-minus-exclusive-prefix.

Construction-only (no execution): ``executedPlan`` triggers analysis +
physical planning, not jobs — except the fuzzy-dedup operators' eager
signature checkpoints, which is why the sweep runs at sf0.001.
"""

from __future__ import annotations

import re

import pytest

from insurance_helper_spark.queries import catalog

SWEEP_SF = "/root/testdata/sf0.001"

# Queries allowed to carry an X..UNBOUNDED FOLLOWING frame because the
# window is PARTITIONED onto a small, bounded relation (document why):
# - events_interp_gapfill (analytics_ext.py:1562): next-known-value
#   lookup partitioned per event key over the reduced daily series —
#   partitions are O(days), bounded by the calendar, not by data size.
UNBOUNDED_FOLLOWING_ALLOWLIST = {"events_interp_gapfill"}

# specifiedwindowframe(RowFrame|RangeFrame, <lower>, unboundedfollowing$())
# — offending iff the captured lower bound is NOT unboundedpreceding$()
# (a negative lookahead regex alone backtracks through \s* and
# false-positives on the legal full-partition frame).
_UF_FRAME = re.compile(
    r"specifiedwindowframe\((?:RowFrame|RangeFrame),\s*([^,]*?),\s*"
    r"unboundedfollowing\$\(\)\)"
)


def _offending_uf_frame(plan: str):
    for m in _UF_FRAME.finditer(plan):
        if m.group(1).strip() != "unboundedpreceding$()":
            return m.group(0)
    return None


def _all_names():
    catalog.load_all()
    return sorted(catalog.QUERIES)


def _assert_plan_clean(name: str, plan: str):
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    assert "CartesianProduct" not in plan, f"{name}: unbounded cartesian"
    if name not in UNBOUNDED_FOLLOWING_ALLOWLIST:
        offending = _offending_uf_frame(plan)
        assert offending is None, (
            f"{name}: O(n^2) UnboundedFollowing window frame ({offending!r}) — "
            "derive suffix aggregates as total minus exclusive prefix, or add to "
            "UNBOUNDED_FOLLOWING_ALLOWLIST with a partitioning justification"
        )


@pytest.mark.parametrize("name", _all_names())
def test_no_rowwise_python_and_no_unbounded_cartesian(spark, name):
    df = catalog.QUERIES[name](spark, SWEEP_SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    _assert_plan_clean(name, plan)


def test_pca_precollect_plans_swept(spark):
    """embedding_pca_power_iteration collects its two distributed
    passes at construction and returns a LocalTableScan, so the
    catalog-wide sweep above only ever sees the local result. Sweep the
    pre-collect frames explicitly (ADVICE r9) so the guard covers the
    query's real distributed plans."""
    from insurance_helper_spark.queries.similarity_queries import pca_plan_sweep_frames

    frames = pca_plan_sweep_frames(spark, SWEEP_SF)
    assert len(frames) == 2
    for i, df in enumerate(frames):
        plan = df._jdf.queryExecution().executedPlan().toString()
        _assert_plan_clean(f"embedding_pca_power_iteration[pass{i}]", plan)
