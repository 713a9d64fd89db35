"""Invariants for wave 20: ABC migration, Poisson rate test, Jaccard
link prediction, tokenizer fertility, lift/gains table."""

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


def test_abc_migration_classes_valid(spark):
    rows = _rows(spark, "orders_abc_migration")
    assert rows
    valid = {"A", "B", "C", "N"}
    for r in rows:
        assert r.class_from in valid and r.class_to in valid
        assert not (r.class_from == "N" and r.class_to == "N")
        assert r.n_parts > 0
        # revenue only accrues to parts present in the 'to' year
        if r.class_to == "N":
            assert r.to_year_revenue == 0.0


def test_poisson_rate_test_consistent(spark):
    (r,) = _rows(spark, "stat_poisson_rate_test")
    assert r.days_first_half > 0 and r.days_second_half > 0
    assert r.rate1 == pytest.approx(
        r.events_first_half / r.days_first_half, rel=1e-3
    )
    # z sign matches which half is busier per unit time
    if r.rate1 > r.rate2:
        assert r.z_score > 0


def test_jaccard_links_bounded(spark):
    rows = _rows(spark, "graph_jaccard_link_prediction")
    assert rows
    for r in rows:
        assert r.id_a < r.id_b
        assert 0 < r.common_neighbors <= r.union_size
        assert 0.0 < r.jaccard <= 1.0
        assert r.jaccard == pytest.approx(
            r.common_neighbors / r.union_size, abs=1e-5
        )


def test_tokenizer_fertility_at_least_one(spark):
    rows = _rows(spark, "text_tokenizer_fertility")
    assert rows
    for r in rows:
        # a whitespace word yields >= 1 BPE-ish token
        assert r.bpe_tokens >= r.ws_tokens
        assert r.corpus_fertility >= 1.0
        assert r.mean_doc_fertility >= 1.0


def test_lift_gains_monotone_capture(spark):
    rows = _rows(spark, "ml_lift_gains_table")
    assert 1 <= len(rows) <= 10
    caps = [r.cum_capture for r in rows]
    assert caps == sorted(caps)  # capture accumulates
    assert caps[-1] == pytest.approx(1.0, abs=1e-6)
    # the final row's lift is exactly the base rate ratio = 1
    assert rows[-1].cum_lift == pytest.approx(1.0, abs=1e-3)
    total = sum(r.n_orders for r in rows)
    assert total > 0
