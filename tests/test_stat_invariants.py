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


# ---- round-7 statistical operators ----


def test_spearman_rho_in_unit_interval(spark):
    rows = _rows(spark, "stat_spearman_corr")
    assert rows
    for r in rows:
        assert -1.0 <= r.spearman_rho <= 1.0, r
        assert r.n_lines > 0


def test_theil_sen_and_mann_kendall_agree_on_direction(spark):
    """Sign of the Theil-Sen slope must agree with the Mann-Kendall S
    statistic whenever both are decisive (same pair relation)."""
    slopes = {r.event_type: r.theil_sen_slope
              for r in _rows(spark, "stat_theil_sen_slope")}
    mk = {r.event_type: r for r in _rows(spark, "stat_mann_kendall_trend")}
    assert set(slopes) == set(mk)
    for et, s in slopes.items():
        r = mk[et]
        assert -1e9 < r.mk_z < 1e9
        if r.direction == "increasing":
            assert s >= 0, (et, s, r)
        elif r.direction == "decreasing":
            assert s <= 0, (et, s, r)


def test_acf_bounds_and_lag_zero_excluded(spark):
    rows = _rows(spark, "events_acf_lags")
    assert [r.lag_k for r in rows] == list(range(1, 8))
    for r in rows:
        # Cauchy-Schwarz: |acf| <= 1 (subset numerator keeps it there).
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9, r
        assert r.n_pairs > 0


def test_kmv_estimate_within_theoretical_error(spark):
    """KMV relative error is ~1/sqrt(k-2); allow 6 sigma. Exact scopes
    (n < k) must report zero error."""
    rows = _rows(spark, "agg_kmv_distinct_union")
    scopes = {r.scope for r in rows}
    assert "ALL" in scopes
    sigma = 1.0 / math.sqrt(64 - 2)
    for r in rows:
        if r.n_exact < 64:
            assert r.kmv_est == float(r.n_exact) and r.rel_err == 0.0, r
        else:
            assert r.rel_err <= 6 * sigma, r


def test_kmv_all_row_bounded_by_source_sum(spark):
    rows = {r.scope: r for r in _rows(spark, "agg_kmv_distinct_union")}
    all_exact = rows.pop("ALL").n_exact
    per_source = [r.n_exact for r in rows.values()]
    assert max(per_source) <= all_exact <= sum(per_source)


def test_referential_integrity_clean_fixture(spark):
    rows = _rows(spark, "dq_referential_integrity")
    assert len(rows) == 7
    for r in rows:
        assert r.n_child > 0
        assert r.n_orphan == 0 and r.n_null_fk == 0, r


def test_compound_growth_index_telescopes(spark):
    """growth_index must equal revenue_t / revenue_first per priority."""
    rows = _rows(spark, "orders_compound_growth")
    by_p = {}
    for r in rows:
        by_p.setdefault(r.priority, []).append(r)
    for p, rs in by_p.items():
        rs.sort(key=lambda r: r.month)
        first = rs[0].revenue
        assert rs[0].growth_index == 1.0
        assert rs[0].mom_growth is None
        for r in rs[1:]:
            assert abs(r.growth_index - r.revenue / first) < 5e-4, (p, r)


def test_kmeans_step_partitions_corpus(spark):
    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "ml_kmeans_lloyd_step")
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_vecs
    for r in rows:
        assert r.inertia >= 0.0


def test_flesch_components_sane(spark):
    for r in _rows(spark, "text_readability_flesch"):
        assert r.n_docs > 0
        assert r.avg_words_per_sentence > 0
        assert r.avg_syllables_per_word >= 1.0  # floored at 1 per word


def test_bootstrap_ci_brackets_point_estimate(spark):
    """Decile bootstrap CI must contain the full-sample mean (20
    replicates of a mean on thousands of rows concentrate tightly)."""
    for r in _rows(spark, "stat_poisson_bootstrap_ci"):
        assert r.boot_lo <= r.boot_hi
        assert r.boot_lo <= r.mean_price <= r.boot_hi, r


def test_ks_d_in_unit_interval(spark):
    (r,) = _rows(spark, "stat_ks_two_sample")
    assert 0.0 <= r.ks_d <= 1.0
    assert 0.0 <= r.p_approx <= 2.0  # one-term bound can exceed 1 slightly
    assert r.n_hi > 0 and r.n_lo > 0


def test_pca_loading_vector_normalized(spark):
    rows = _rows(spark, "embedding_pca_power_iteration")
    assert len(rows) == 8
    # Top-8 of a 64-dim unit vector: partial sum of squares <= 1.
    assert sum(r.loading ** 2 for r in rows) <= 1.0 + 1e-6
    assert all(r.eigenvalue_est == rows[0].eigenvalue_est for r in rows)
    assert rows[0].eigenvalue_est > 0


def test_reorder_gap_percentile_ordering(spark):
    for r in _rows(spark, "orders_reorder_gap_percentiles"):
        assert 0 <= r.median_gap_days <= r.p90_gap_days
        assert r.n_gaps > 0 and r.mean_gap_days > 0


def test_weighted_median_between_min_max(spark):
    from insurance_helper_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, SF_DIR, "lineitem")
    bounds = {
        r.flag: r
        for r in li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
        .collect()
    }
    for r in _rows(spark, "stat_weighted_median_price"):
        b = bounds[r.flag]
        assert b.lo <= r.weighted_median_price <= b.hi, r


def test_nmi_and_purity_in_unit_interval(spark):
    (r,) = _rows(spark, "ml_cluster_label_nmi")
    assert 0.0 < r.purity <= 1.0
    assert r.mutual_info >= -1e-9
    assert -1e-4 <= r.nmi <= 1.0 + 1e-4
    assert r.n_clusters <= 8 and r.n_labels >= 2


def test_hill_alpha_positive(spark):
    (r,) = _rows(spark, "stat_hill_tail_index")
    assert 2 <= r.k <= 100 and r.x_k >= 1
    assert r.mean_log_excess >= 0.0  # top-k counts >= x_k
    if r.mean_log_excess > 0:
        assert r.hill_alpha > 0


def test_markov_entropy_rate_bounded(spark):
    (r,) = _rows(spark, "events_markov_entropy_rate")
    assert 0.0 <= r.entropy_rate_nats <= r.max_entropy_nats + 1e-9
    assert 0.0 - 1e-9 <= r.predictability <= 1.0 + 1e-9


def test_max_drawdown_in_unit_interval(spark):
    for r in _rows(spark, "orders_max_drawdown"):
        assert 0.0 <= r.max_drawdown < 1.0
        assert r.trough_revenue <= r.peak_revenue
