"""Invariants for wave 18: Fellegi-Sunter weights, blocking quality,
Gumbel block maxima, Cochran-Armitage trend, MMR rerank."""

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


def test_fellegi_sunter_weights_sane(spark):
    rows = _rows(spark, "linkage_fellegi_sunter_weights")
    assert len(rows) == 3  # lang / source / len_bin
    for r in rows:
        assert r.n_match_pairs > 0
        assert 0.0 <= r.m_prob <= 1.0
        assert 0.0 < r.u_prob < 1.0
        # near-dup pairs agree on every field at least as often as
        # random pairs -> positive evidence weight when defined
        if r.agree_weight is not None and r.m_prob > r.u_prob:
            assert r.agree_weight > 0.0
        if r.disagree_weight is not None and r.m_prob > r.u_prob:
            assert r.disagree_weight < 0.0


def test_blocking_quality_bounded(spark):
    (r,) = _rows(spark, "linkage_blocking_quality")
    assert r.n_docs > 0 and r.n_blocks > 0
    assert 0.0 <= r.reduction_ratio <= 1.0
    assert 0.0 <= r.pairs_completeness <= 1.0
    assert r.n_true_pairs > 0  # non-vacuous at fixture scale
    assert r.cand_pairs < r.n_docs * (r.n_docs - 1) // 2


def test_gumbel_fit_sane(spark):
    (r,) = _rows(spark, "stat_gumbel_block_maxima")
    assert r.n_blocks >= 12
    assert r.gumbel_beta > 0.0
    assert 0.0 < r.p_exceed_historic < 1.0
    # the historical max lies above the location parameter
    assert r.historic_max > r.gumbel_mu


def test_cochran_armitage_consistent(spark):
    (r,) = _rows(spark, "stat_cochran_armitage_trend")
    assert r.chi2_trend >= 0.0
    assert r.n_events < r.n_orders
    if r.trend_t > 0:
        assert r.direction == "increasing"
    elif r.trend_t < 0:
        assert r.direction == "decreasing"


def test_mmr_rerank_structure(spark):
    rows = _rows(spark, "similarity_mmr_rerank")
    assert [r.pos for r in rows] == list(range(1, 11))
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == 10  # no repeats
    # the seed is the globally most relevant candidate
    assert rows[0].relevance == max(r.relevance for r in rows)
    assert rows[0].max_sim_to_selected is None
    for r in rows[1:]:
        assert r.max_sim_to_selected is not None
        assert -1.0001 <= r.max_sim_to_selected <= 1.0001
        assert -1.0001 <= r.relevance <= 1.0001
