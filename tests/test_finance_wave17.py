"""Invariants for wave 17: Bollinger breakouts, beta/Sharpe, VWAP,
McNemar, CUPED, position-based attribution."""

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


def test_bollinger_breakouts_exceed_band(spark):
    rows = _rows(spark, "finance_bollinger_breakout")
    for r in rows:
        assert abs(r.z) > 2.0
        assert (r.direction == "up") == (r.z > 0)
        # an 'up' breakout sits above its moving average
        if r.direction == "up":
            assert r.revenue > r.ma20
        else:
            assert r.revenue < r.ma20


def test_beta_sharpe_correlation_bounded(spark):
    rows = _rows(spark, "finance_beta_sharpe")
    assert rows
    for r in rows:
        assert r.n_months >= 12
        assert -1.0 <= r.corr_mkt <= 1.0
        # beta and correlation share a sign (same covariance numerator)
        if r.corr_mkt != 0:
            assert (r.beta > 0) == (r.corr_mkt > 0)


def test_vwap_premium_identity(spark):
    rows = _rows(spark, "finance_vwap_monthly")
    assert rows
    for r in rows[:200]:
        assert r.volume > 0 and r.n_lines > 0
        assert r.vwap > 0 and r.mean_price > 0
        assert r.vwap_premium == pytest.approx(
            r.vwap - r.mean_price, abs=2e-4
        )
        assert 1 <= r.mon <= 12


def test_mcnemar_cells_consistent(spark):
    (r,) = _rows(spark, "stat_mcnemar_paired")
    assert r.n_pairs >= r.discordant_b + r.discordant_c
    assert r.mcnemar_chi2 >= 0.0
    # continuity correction can only shrink the statistic
    assert r.mcnemar_corrected <= r.mcnemar_chi2 + 1e-9


def test_cuped_variance_reduction_bounded(spark):
    (r,) = _rows(spark, "stat_cuped_adjustment")
    assert r.n_users > 0
    assert 0.0 <= r.rho_squared <= 1.0
    assert r.var_y > 0.0
    # adjusted variance = var_y * (1 - rho^2), never negative/larger
    assert 0.0 <= r.var_y_adjusted <= r.var_y + 1e-9
    assert r.var_y_adjusted == pytest.approx(
        r.var_y * (1 - r.rho_squared), rel=1e-3
    )


def test_position_attribution_credit_conserved(spark):
    rows = _rows(spark, "events_attribution_position")
    assert rows
    # total credit across touch types must equal the total value of
    # attributed purchases: recompute from the linear sibling, which
    # shares the same join window and therefore the same purchases
    linear = _rows(spark, "events_attribution_linear")
    total_pos = sum(r.total_credit for r in rows)
    total_lin = sum(r.total_credit for r in linear)
    assert total_pos == pytest.approx(total_lin, rel=1e-3)
    for r in rows:
        assert r.n_first <= r.n_credited_touches
        assert r.n_last <= r.n_credited_touches
