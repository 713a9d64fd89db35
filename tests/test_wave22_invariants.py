"""Invariants for wave 22: SMA crossover census, cross-price
elasticity grid, nation flow matrix."""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="fixture data absent"
)


def _rows(spark, name, sf=SF_DIR):
    from insurance_helper_spark.queries import catalog

    catalog.load_all()
    return catalog.QUERIES[name](spark, sf).collect()


def test_sma_crossover_alternates(spark):
    rows = _rows(spark, "finance_sma_crossover")
    # crossings must strictly alternate golden/death in day order
    for a, b in zip(rows, rows[1:]):
        assert a.cross_type != b.cross_type
        assert a.day < b.day
    for r in rows:
        # on a golden cross the 5-day SMA sits above the 20-day
        if r.cross_type == "golden":
            assert r.sma5 > r.sma20
        else:
            assert r.sma5 <= r.sma20


def test_cross_elasticity_grid_shape(spark):
    rows = _rows(spark, "part_cross_elasticity")
    assert rows
    pairs = {(r.brand_q, r.brand_p) for r in rows}
    assert len(pairs) == len(rows)  # no duplicate pairs
    for r in rows:
        assert r.brand_q != r.brand_p
        assert r.n_months >= 12
    brands = {r.brand_q for r in rows} | {r.brand_p for r in rows}
    assert len(brands) <= 5  # top-5 grid only


def test_nation_flow_shares_sum_to_one(spark):
    rows = _rows(spark, "trade_nation_flow_matrix")
    assert rows
    total_share = sum(r.world_share for r in rows)
    assert total_share == pytest.approx(1.0, abs=1e-3)
    for r in rows:
        assert r.revenue > 0 and r.n_lines > 0
        assert 0.0 < r.world_share <= 1.0
