"""Invariants for wave 19: shuffle-balance audit, Friedman test,
Wilson CI, CCNet perplexity buckets, CLV heuristic."""

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


def test_shuffle_balance_audit_bounds(spark):
    (r,) = _rows(spark, "ops_shuffle_balance_audit")
    assert r.n_buckets <= 32
    assert r.max_bucket * r.n_buckets >= r.n_rows  # max >= mean
    assert r.imbalance_factor >= 1.0
    assert 0.0 <= r.gini < 1.0
    assert r.cv >= 0.0
    # a portable hash over ~random keys should balance decently
    assert r.imbalance_factor < 3.0


def test_friedman_rank_sums_conserved(spark):
    rows = _rows(spark, "stat_friedman_test")
    k = len(rows)
    assert k == 5
    n = rows[0].n_blocks
    # rank sums over all treatments total n*k(k+1)/2 exactly
    assert sum(r.rank_sum for r in rows) == n * k * (k + 1) // 2
    chi2 = rows[0].friedman_chi2
    assert chi2 >= 0.0
    for r in rows:
        assert r.friedman_chi2 == chi2
        assert 1.0 <= r.mean_rank <= k


def test_wilson_ci_brackets_p_hat(spark):
    rows = _rows(spark, "stat_wilson_ci")
    assert rows
    for r in rows:
        assert 0.0 <= r.wilson_low <= r.p_hat <= r.wilson_high <= 1.0
        assert r.n_returned <= r.n_orders


def test_perplexity_buckets_cover_corpus(spark):
    rows = _rows(spark, "corpus_perplexity_buckets")
    assert rows
    buckets = {r.bucket for r in rows}
    assert buckets <= {"head", "middle", "tail"}
    assert len(buckets) == 3
    # head has lower surprisal than tail within any language that
    # has both
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, d in by_lang.items():
        if "head" in d and "tail" in d:
            assert d["head"].avg_surprisal < d["tail"].avg_surprisal
    total = sum(r.n_docs for r in rows)
    assert total > 0


def test_clv_positive_and_composed(spark):
    rows = _rows(spark, "customer_clv_heuristic")
    assert rows
    for r in rows:
        assert r.aov > 0 and r.orders_per_cust_year > 0
        assert 0.0 < r.churn_rate <= 1.0
        assert r.clv_estimate == pytest.approx(
            r.aov * r.orders_per_cust_year / r.churn_rate, rel=1e-3
        )
