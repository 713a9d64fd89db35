"""Invariants for wave 16: cluster-quality indices (silhouette /
Davies-Bouldin / Calinski-Harabasz) and graph HITS / label
propagation — structural properties the oracle hash can't express."""

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


def test_silhouette_bounded(spark):
    rows = _rows(spark, "ml_silhouette_simplified")
    assert len(rows) == 10  # one per embedding label
    for r in rows:
        assert -1.0 <= r.min_silhouette <= r.avg_silhouette <= 1.0
        assert r.n_vecs > 0


def test_davies_bouldin_consistent(spark):
    rows = _rows(spark, "ml_davies_bouldin")
    assert len(rows) == 10
    db = rows[0].db_index
    for r in rows:
        assert r.dispersion > 0.0
        assert r.worst_ratio > 0.0
        assert r.worst_neighbor != r.label
        assert r.db_index == db  # scalar repeated per row
    # DB index is the mean of the per-cluster worst ratios
    mean_r = sum(r.worst_ratio for r in rows) / len(rows)
    assert db == pytest.approx(mean_r, abs=1e-3)


def test_calinski_harabasz_positive(spark):
    (r,) = _rows(spark, "ml_calinski_harabasz")
    assert r.k_clusters == 10
    assert r.n_vecs > r.k_clusters
    assert r.between_ss > 0.0 and r.within_ss > 0.0
    expected = (r.between_ss / (r.k_clusters - 1)) / (
        r.within_ss / (r.n_vecs - r.k_clusters)
    )
    assert r.ch_index == pytest.approx(expected, rel=1e-3)


def test_hits_scores_normalized(spark):
    rows = _rows(spark, "graph_hits_hubs_authorities")
    assert rows
    assert rows[0].hub_score == pytest.approx(1.0)  # max-normalized
    for r in rows:
        assert 0.0 < r.hub_score <= 1.0
        assert 0.0 < r.auth_score <= 1.0
    # ranked by hub score descending
    hubs = [r.hub_score for r in rows]
    assert hubs == sorted(hubs, reverse=True)


def test_label_propagation_communities(spark):
    rows = _rows(spark, "graph_label_propagation")
    assert rows
    sizes = [r.size for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    for r in rows:
        assert r.size >= 1
        # min_member is a node id and can never exceed the community
        # label (the label is itself the id of some member's vote,
        # and ids are non-negative)
        assert r.min_member >= 0
