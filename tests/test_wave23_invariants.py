"""Invariants for wave 23: Anderson-Darling normality, Benford
second-digit screen."""

from __future__ import annotations

import math
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


def test_anderson_darling_positive_and_adjusted(spark):
    (r,) = _rows(spark, "stat_anderson_darling_normal")
    assert r.n_days > 20
    assert r.ad_stat > 0.0  # A^2 is non-negative for real data
    # the case-3 adjustment inflates the statistic
    assert r.ad_adjusted >= r.ad_stat
    assert r.normal_5pct in ("reject", "fail_to_reject")
    assert (r.normal_5pct == "reject") == (r.ad_adjusted > 0.787)


def test_benford_second_digit_law(spark):
    rows = _rows(spark, "stat_benford_second_digit")
    assert len(rows) == 10
    assert [r.digit for r in rows] == list(range(10))
    # expected probabilities match the closed form and sum to 1
    for r in rows:
        want = sum(
            math.log10(1 + 1 / (10 * k + r.digit)) for k in range(1, 10)
        )
        assert r.expected_p == pytest.approx(want, abs=1e-5)
        assert r.chi2_term >= 0.0
    assert sum(r.expected_p for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r.observed_p for r in rows) == pytest.approx(1.0, abs=1e-4)
    # second-digit law is monotone decreasing in the digit
    exps = [r.expected_p for r in rows]
    assert exps == sorted(exps, reverse=True)


def test_g_test_nonnegative_matches_chi2_scale(spark):
    (r,) = _rows(spark, "stat_g_test_independence")
    assert r.g_statistic >= 0.0
    assert r.n_cells >= 2
    # G and Pearson chi2 agree asymptotically on the same table:
    # same order of magnitude on real data
    chi = _rows(spark, "stat_chi2_priority_status")
    chi2_val = chi[0].chi2 if hasattr(chi[0], "chi2") else None
    if chi2_val is not None and chi2_val > 1:
        assert 0.1 < r.g_statistic / chi2_val < 10


def test_runs_up_down_bounds(spark):
    (r,) = _rows(spark, "stat_runs_up_down")
    assert r.n_days > 20
    # runs count is between 1 and n-1
    assert 1 <= r.n_runs <= r.n_days - 1
    assert r.expected_runs == pytest.approx((2 * r.n_days - 1) / 3, abs=1e-3)


def test_wilcoxon_rank_sum_bounds(spark):
    (r,) = _rows(spark, "stat_wilcoxon_signed_rank")
    assert r.n_pairs > 10
    # W+ is bounded by the total rank sum n(n+1)/2
    assert 0.0 <= r.w_plus <= r.n_pairs * (r.n_pairs + 1) / 2


def test_sign_test_agrees_with_wilcoxon_direction(spark):
    (s,) = _rows(spark, "stat_sign_test")
    assert s.n_pairs == s.n_up + s.n_down
    assert 0.0 <= s.frac_up <= 1.0
    assert s.z_score >= 0.0  # continuity-corrected |z|
    # both tests see the same pair frame
    (w,) = _rows(spark, "stat_wilcoxon_signed_rank")
    assert w.n_pairs == s.n_pairs
