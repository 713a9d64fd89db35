"""Invariants for wave 21: fixed-effect meta-analysis, burstiness/
memory, funnel time-to-convert, n-gram coverage curve, PK audit."""

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


def test_meta_analysis_ci_brackets_effect(spark):
    (r,) = _rows(spark, "stat_meta_analysis_fixed_effect")
    assert r.n_studies > 1
    assert r.ci_low <= r.pooled_effect <= r.ci_high
    assert r.cochran_q >= 0.0
    assert 0.0 <= r.i_squared <= 1.0


def test_burstiness_bounded(spark):
    rows = _rows(spark, "events_burstiness_memory")
    assert rows
    for r in rows:
        assert r.mean_gap_s > 0.0
        # B = (s-m)/(s+m) is bounded to (-1, 1)
        assert -1.0 < r.burstiness < 1.0
        assert -1.0 <= r.memory_coeff <= 1.0


def test_funnel_time_ordered_percentiles(spark):
    (r,) = _rows(spark, "events_funnel_time_to_convert")
    assert 0 < r.n_converted <= r.n_signup
    assert 0.0 < r.conversion_rate <= 1.0
    assert 0 <= r.p50_delay_s <= r.p90_delay_s


def test_coverage_curve_monotone(spark):
    rows = _rows(spark, "text_ngram_coverage_curve")
    assert [r.top_k for r in rows] == [10, 100, 1000]
    covs = [r.coverage for r in rows]
    assert covs == sorted(covs)  # more terms cover weakly more mass
    for r in rows:
        assert 0.0 < r.coverage <= 1.0
        assert r.covered_tokens <= r.total_tokens
    # if the vocab fits inside a cut, that cut covers everything
    for r in rows:
        if r.vocab_size <= r.top_k:
            assert r.coverage == pytest.approx(1.0, abs=1e-9)


def test_primary_keys_unique_in_fixture(spark):
    rows = _rows(spark, "dq_primary_key_audit")
    assert len(rows) == 8
    for r in rows:
        assert r.n_rows >= r.n_distinct_keys
        assert r.n_dup_rows == r.n_rows - r.n_distinct_keys
        # the generated fixture's single-column keys are clean;
        # lineitem's composite (orderkey, linenumber) genuinely
        # collides in the synthetic data — the audit must REPORT
        # that, not hide it
        if r.table_name != "lineitem":
            assert r.n_dup_rows == 0
    li = next(r for r in rows if r.table_name == "lineitem")
    assert li.n_dup_rows > 0
