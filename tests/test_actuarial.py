"""Invariants for the actuarial shelf (chain-ladder, BF, frequency-
severity, Buhlmann, log-rank) — structural properties that must hold
for ANY input, complementing the oracle hash gate."""

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


def test_chain_ladder_development_monotone(spark):
    rows = _rows(spark, "actuarial_chain_ladder")
    assert rows
    for r in rows:
        # age-to-age factors are >= 1, so every CDF is >= 1 and the
        # projected ultimate can never sit below the observed latest
        assert r.cdf_to_ultimate >= 1.0
        assert r.ultimate >= r.latest_cum - 0.01
        assert r.ibnr_reserve == pytest.approx(
            r.ultimate - r.latest_cum, abs=0.02
        )
    # the most-developed cohort has no remaining factors: CDF == 1
    oldest = max(rows, key=lambda r: r.dev_age)
    assert oldest.cdf_to_ultimate == pytest.approx(1.0, abs=1e-9)
    assert oldest.ibnr_reserve == pytest.approx(0.0, abs=0.01)
    # older cohorts have weakly smaller CDFs (fewer factors remain)
    by_age = sorted(rows, key=lambda r: r.dev_age)
    for a, b in zip(by_age, by_age[1:]):
        assert b.cdf_to_ultimate <= a.cdf_to_ultimate + 1e-9


def test_bf_reserve_bounded_and_consistent(spark):
    rows = _rows(spark, "actuarial_bf_reserve")
    assert rows
    for r in rows:
        assert 0.0 < r.pct_developed <= 1.0 + 1e-9
        assert r.bf_reserve >= -0.01
        assert r.bf_ultimate == pytest.approx(
            r.latest_cum + r.bf_reserve, abs=0.02
        )
        # fully developed -> both methods agree on zero reserve
        if r.pct_developed == pytest.approx(1.0, abs=1e-9):
            assert r.bf_reserve == pytest.approx(0.0, abs=0.01)
            assert r.cl_reserve == pytest.approx(0.0, abs=0.01)


def test_freq_severity_compound_identity(spark):
    rows = _rows(spark, "actuarial_freq_severity")
    assert rows
    for r in rows:
        assert r.n_orders >= r.n_cust > 0
        assert r.freq_lambda >= 1.0  # every customer has >= 1 order
        # collective-risk identity: E[S] = lambda * E[X]
        assert r.agg_loss_mean == pytest.approx(
            r.freq_lambda * r.sev_mean, rel=1e-3
        )
        # compound SD >= severity-only scaling of a single claim
        assert r.agg_loss_sd > 0.0
        assert r.sev_cv > 0.0


def test_buhlmann_z_in_unit_premium_between(spark):
    rows = _rows(spark, "actuarial_buhlmann_credibility")
    assert rows
    for r in rows:
        assert 0.0 <= r.z_cred <= 1.0
        lo = min(r.class_mean, r.grand_mean) - 0.01
        hi = max(r.class_mean, r.grand_mean) + 0.01
        # credibility premium is a convex blend of the two means
        assert lo <= r.cred_premium <= hi


def test_logrank_chi2_nonnegative_expected_positive(spark):
    (r,) = _rows(spark, "actuarial_logrank_test")
    assert r.observed_g1 >= 0 and r.observed_g2 >= 0
    assert r.observed_g1 + r.observed_g2 > 0
    assert r.expected_g1 > 0.0
    assert r.logrank_chi2 >= 0.0
    # E1 can never exceed the total number of events
    assert r.expected_g1 <= r.observed_g1 + r.observed_g2
