"""Mathematical invariants for the round-5 statistics queries — bounds
that must hold for ANY input, checked on the fixture (complements the
oracle hash check, which pins values but not meaning)."""

from __future__ import annotations

import math
import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="fixture data absent"
)


def _rows(spark, name):
    from insurance_helper_spark.queries import catalog

    catalog.load_all()
    return catalog.QUERIES[name](spark, SF_DIR).collect()


def test_gini_in_unit_interval(spark):
    for r in _rows(spark, "stat_gini_order_values"):
        assert 0.0 <= r.gini < 1.0, r


def test_entropy_bounded_by_log_k(spark):
    # evenness = H / ln(k) must be in [0, 1]; entropy non-negative.
    for r in _rows(spark, "stat_entropy_priority_mix"):
        assert r.entropy_nats >= 0.0
        assert 0.0 <= r.evenness <= 1.0 + 1e-9, r


def test_auc_in_unit_interval_and_counts(spark):
    (r,) = _rows(spark, "stat_auc_mann_whitney")
    assert 0.0 <= r.auc <= 1.0
    assert r.n_pos > 0 and r.n_neg > 0


def test_benford_fracs_sum_to_one(spark):
    rows = _rows(spark, "stat_benford_first_digit")
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.obs_frac for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert abs(r.benford_frac - math.log10(1 + 1 / r.digit)) < 1e-5
        assert r.chi2_term >= 0.0


def test_welch_df_bounds(spark):
    # Welch–Satterthwaite df lies between min(n_i)-1 and n_hi+n_lo-2.
    for r in _rows(spark, "stat_welch_ttest_segments"):
        assert min(r.n_hi, r.n_lo) - 1 <= r.welch_df <= r.n_hi + r.n_lo - 2, r


def test_js_divergence_bounds(spark):
    # JS divergence in nats is bounded by ln 2; KL non-negative.
    for r in _rows(spark, "stat_js_divergence_sources"):
        assert r.kl_src_corpus >= -1e-9
        assert -1e-9 <= r.js_divergence <= math.log(2) + 1e-9, r


def test_winsorized_mean_between_bounds(spark):
    for r in _rows(spark, "stat_winsorized_event_values"):
        assert r.p10 <= r.winsorized_mean <= r.p90, r


def test_pagerank_mass_conserved(spark):
    # Mean-normalized ranks: the average must be ~1 (PageRank sums to 1
    # before the ×N scaling; a symmetric graph has no dangling leak).
    rows = _rows(spark, "graph_pagerank_copurchase")
    mean = sum(r.rank_norm for r in rows) / len(rows)
    assert abs(mean - 1.0) < 0.01, mean


def test_mixing_weights_sum_to_one(spark):
    rows = _rows(spark, "corpus_mixing_weights")
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r.epochs > 0


def test_quantization_error_within_half_step(spark):
    rows = _rows(spark, "embedding_quantization_error")
    assert rows and all(r.within_half_step for r in rows)


def test_attribution_linear_credit_conserved(spark):
    """Σ credit over touch types == Σ value of purchases that had at
    least one touch (exact by construction; recomputed independently)."""
    from pyspark.sql import functions as F

    from insurance_helper_spark.queries import catalog
    from insurance_helper_spark.sources.tables import load_table

    catalog.load_all()
    rows = _rows(spark, "events_attribution_linear")
    total_credit = sum(r.total_credit for r in rows)

    events = load_table(spark, SF_DIR, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        F.col("ts").alias("pts"), "value",
    )
    t = events.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("tu"), F.col("ts").alias("tts")
    )
    touched = (
        p.join(
            t,
            (F.col("user_id") == F.col("tu"))
            & (F.col("tts") <= F.col("pts"))
            & (F.col("tts") > F.col("pts") - F.expr("INTERVAL 7 DAYS")),
            "left_semi",
        )
        .agg(F.sum("value"))
        .first()[0]
    )
    assert abs(total_credit - float(touched)) < 0.05 * len(rows)
