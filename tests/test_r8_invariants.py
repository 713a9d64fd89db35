"""Mathematical/structural invariants for the round-8 operator wave —
properties that must hold for ANY input, checked on the fixture
(complements the oracle hash check, which pins values but not meaning)."""

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


def test_kruskal_wallis_h_nonnegative_p_valid(spark):
    (r,) = _rows(spark, "stat_kruskal_wallis")
    assert r.k_groups == 3
    assert r.h_statistic >= 0.0
    assert 0.0 < r.p_value_df2 <= 1.0
    # closed-form chi2(2) tail consistency with H
    assert r.p_value_df2 == pytest.approx(
        math.exp(-r.h_statistic / 2), abs=2e-6
    )


def test_anova_f_nonnegative_and_eta_in_unit(spark):
    (r,) = _rows(spark, "stat_anova_oneway")
    assert r.f_statistic >= 0.0
    assert 0.0 <= r.eta_squared <= 1.0
    assert r.df_between == r.k_groups - 1
    assert r.df_within == r.n_total - r.k_groups


def test_cramers_v_bounded(spark):
    (r,) = _rows(spark, "stat_cramers_v")
    assert r.chi_square >= 0.0
    assert 0.0 <= r.cramers_v <= 1.0
    # Bergsma correction only ever shrinks the estimate.
    assert r.cramers_v_corrected <= r.cramers_v + 1e-9


def test_negbin_moment_identity(spark):
    (r,) = _rows(spark, "stat_negbin_overdispersion")
    assert r.mean_lines > 0 and r.var_lines >= 0
    assert r.dispersion_index == pytest.approx(
        r.var_lines / r.mean_lines, rel=1e-3
    )
    if r.nb_r is not None:
        # NB(r, p) mean = r(1-p)/p must reproduce the sample mean.
        assert r.nb_p is not None and 0.0 < r.nb_p <= 1.0
        assert r.nb_r > 0
        assert r.nb_r * (1 - r.nb_p) / r.nb_p == pytest.approx(
            r.mean_lines, rel=1e-2
        )


def test_jarque_bera_nonnegative(spark):
    (r,) = _rows(spark, "stat_jarque_bera")
    assert r.jb_statistic >= 0.0
    # 6-decimal display rounding maps a decisive rejection to exactly 0.0
    assert 0.0 <= r.p_value <= 1.0
    # kurtosis of any real sample is >= skew^2 + 1 - 3 (Pearson bound)
    assert r.excess_kurtosis >= r.skewness**2 - 2.0 - 1e-6


def test_ridge_lambda_zero_matches_ols_and_shrinks(spark):
    ridge = _rows(spark, "ml_ridge_shrinkage_path")
    ols = {r.l_returnflag: r for r in _rows(spark, "stat_ols_two_regressors")}
    by_flag: dict = {}
    for r in ridge:
        by_flag.setdefault(r.l_returnflag, {})[r.ridge_lambda] = r
    for flag, path in by_flag.items():
        assert set(path) == {0, 10000, 1000000}
        # lambda = 0 IS the OLS fit
        assert path[0].b1_cents_per_qty == pytest.approx(
            ols[flag].b1_cents_per_qty, abs=1e-4
        )
        assert path[0].b2_cents_per_disc_pct == pytest.approx(
            ols[flag].b2_cents_per_disc_pct, abs=1e-4
        )
        # penalized-coefficient L2 norm is non-increasing in lambda
        norms = [
            math.hypot(path[lam].b1_cents_per_qty, path[lam].b2_cents_per_disc_pct)
            for lam in (0, 10000, 1000000)
        ]
        assert norms[0] + 1e-6 >= norms[1] >= norms[2] - 1e-6


def test_kfold_cv_folds_complete_and_mean_consistent(spark):
    rows = _rows(spark, "ml_kfold_cv_rmse")
    assert {r.fold for r in rows} == {0, 1, 2, 3, 4}
    for r in rows:
        assert r.fold_rmse > 0 and r.n_test > 0
    mean = sum(r.fold_rmse for r in rows) / len(rows)
    assert rows[0].cv_mean_rmse == pytest.approx(mean, abs=5e-4)


def test_hapax_yule_bounds(spark):
    rows = _rows(spark, "text_hapax_yule")
    assert rows
    for r in rows:
        assert 0.0 <= r.hapax_ratio <= 1.0
        assert r.hapax <= r.vocab <= r.n_tokens
        assert r.yule_k >= 0.0


def test_perplexity_at_least_one(spark):
    (r,) = _rows(spark, "text_bigram_perplexity_holdout")
    assert r.mean_nll >= 0.0
    assert r.perplexity >= 1.0
    assert r.n_test_bigrams > 0 and r.train_vocab > 0
    assert r.perplexity == pytest.approx(math.exp(r.mean_nll), rel=1e-3)


def test_vocab_overlap_is_a_metric_bounded_pairset(spark):
    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "text_source_vocab_overlap")
    n_src = (
        load_table(spark, SF_DIR, "documents").select("source").distinct().count()
    )
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.n_common <= min(r.vocab_a, r.vocab_b)
        assert r.src_a < r.src_b


def test_srp_agreement_tracks_prediction(spark):
    (r,) = _rows(spark, "embedding_srp_bit_agreement")
    assert r.n_pairs > 0
    assert 0.0 <= r.measured_agreement <= 1.0
    assert 0.0 <= r.predicted_agreement <= 1.0
    # 16 bits/pair is coarse, but the family must TRACK the GW curve —
    # a broken sign matrix (the r7 hash-family bug class) pushes the
    # mean gap toward 0.5.
    assert r.mean_abs_gap < 0.2
    assert abs(r.measured_agreement - r.predicted_agreement) < 0.1


def test_centroid_distance_matrix_complete_and_bounded(spark):
    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "embedding_centroid_distance_matrix")
    n_lab = (
        load_table(spark, SF_DIR, "embeddings").select("label").distinct().count()
    )
    assert len(rows) == n_lab * (n_lab - 1) // 2
    for r in rows:
        assert -1.0 - 1e-9 <= r.centroid_cosine <= 1.0 + 1e-9


def test_norm_percentiles_ordered(spark):
    rows = _rows(spark, "embedding_norm_percentiles")
    assert rows
    for r in rows:
        assert 0.0 <= r.p10_norm <= r.p50_norm <= r.p90_norm
        assert r.n_vecs > 0 and r.mean_norm > 0


def test_join_cardinality_exact_matches_real_join(spark):
    from insurance_helper_spark.sources.tables import load_table

    rows = {r.edge: r for r in _rows(spark, "ops_join_cardinality_estimate")}
    assert set(rows) == {
        "customer-orders", "orders-lineitem", "part-lineitem",
        "supplier-lineitem",
    }
    # The sum(cA*cB) identity must equal the materialized join size.
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    actual = o.join(c, o.o_custkey == c.c_custkey).count()
    assert rows["customer-orders"].exact_rows == actual
    for r in rows.values():
        assert r.est_over_exact > 0
        assert r.ndv_a <= r.rows_a and r.ndv_b <= r.rows_b


def test_pareto_frontier_is_strictly_decreasing_staircase(spark):
    rows = _rows(spark, "orders_pareto_frontier")
    assert rows
    days = [r.day for r in rows]
    assert days == sorted(days)
    cents = [r.best_cents for r in rows]
    # Later day on the frontier must mean strictly lower best price —
    # otherwise the earlier point would be dominated.
    assert all(a > b for a, b in zip(cents, cents[1:]))
    # The global best-price day is always on the frontier.
    from insurance_helper_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    orders = load_table(spark, SF_DIR, "orders")
    best = orders.agg(
        F.max(F.round(F.col("o_totalprice") * 100).cast("long"))
    ).collect()[0][0]
    assert cents[0] == best


def test_running_distinct_monotone_and_converges(spark):
    from insurance_helper_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = _rows(spark, "events_running_distinct_users")
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(
            (r.month_end, r.distinct_users_to_date)
        )
    ev = load_table(spark, SF_DIR, "events")
    truth = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for t, series in by_type.items():
        series.sort()
        counts = [c for _, c in series]
        assert counts == sorted(counts)  # non-decreasing
        assert counts[-1] == truth[t]  # converges to the exact distinct


def test_last_digit_census_complete(spark):
    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "dq_last_digit_uniformity")
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r.n for r in rows) == n_orders
    assert sum(r.share for r in rows) == pytest.approx(1.0, abs=0.01)
    assert all(r.chi_square_df9 >= 0 for r in rows)
    assert {r.digit for r in rows} <= set(range(10))


def test_tukey_fences_sane(spark):
    rows = _rows(spark, "dq_tukey_fences")
    assert rows
    for r in rows:
        assert r.q1_price <= r.q3_price
        assert r.iqr_price == pytest.approx(r.q3_price - r.q1_price, abs=0.02)
        assert 0 <= r.n_low_outliers + r.n_high_outliers < r.n_lines


def test_neyman_allocation_reconciles_to_budget(spark):
    rows = _rows(spark, "sample_stratified_neyman")
    assert sum(r.allocated_n for r in rows) == 1000
    assert sum(r.neyman_weight for r in rows) == pytest.approx(1.0, abs=0.01)
    for r in rows:
        # Largest remainder can only top up the floor share by one.
        assert r.allocated_n >= int(1000 * r.neyman_weight) - 1
        assert r.stratum_sd >= 0


def test_pagerank_top10_ordered_and_positive(spark):
    rows = _rows(spark, "graph_pagerank_iterations")
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    prs = [r.pagerank for r in rows]
    assert all(a >= b for a, b in zip(prs, prs[1:]))
    for r in rows:
        assert 0.0 < r.pagerank < 1.0


def test_fuzzy_levenshtein_flags_and_bounds(spark):
    rows = _rows(spark, "dedup_fuzzy_levenshtein")
    assert rows  # blocking must surface candidates on the dup-seeded fixture
    assert any(r.is_near_dup == 1 for r in rows)
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.lev <= r.max_len
        assert r.is_near_dup == (1 if 5 * r.lev <= r.max_len else 0)


def test_pr_curve_monotone_tradeoff(spark):
    rows = _rows(spark, "ml_pr_curve_thresholds")
    assert rows
    rows.sort(key=lambda r: r.decile)
    # Raising the threshold can only shrink the predicted-positive set:
    # recall is non-increasing, fp non-increasing, fn non-decreasing.
    for a, b in zip(rows, rows[1:]):
        assert a.recall_at >= b.recall_at - 1e-9
        assert a.fp >= b.fp
        assert a.fn <= b.fn
    for r in rows:
        assert 0.0 <= r.precision_at <= 1.0 and 0.0 <= r.recall_at <= 1.0
        # F1 is the harmonic mean: between 0 and min(2p, 2r)
        assert r.f1_at <= 2 * min(r.precision_at, r.recall_at) + 1e-9


def test_xyz_classes_match_cv_edges(spark):
    rows = _rows(spark, "part_xyz_demand_classes")
    assert rows
    for r in rows:
        assert r.mean_monthly_qty > 0 and r.n_months > 0
        if r.demand_cv is not None:
            expected = "X" if r.demand_cv < 0.5 else ("Y" if r.demand_cv < 1.0 else "Z")
            assert r.xyz_class == expected


def test_retention_rates_bounded(spark):
    rows = _rows(spark, "events_cohort_retention")
    assert rows
    for r in rows:
        assert 0 <= r.d7_retained <= r.n_users
        assert 0 <= r.d30_retained <= r.n_users
        assert 0.0 <= r.d7_rate <= 1.0 and 0.0 <= r.d30_rate <= 1.0


def test_ngram_novelty_consistent(spark):
    (r,) = _rows(spark, "text_ngram_novelty_rate")
    assert 0 <= r.novel_occurrences <= r.n_test_occurrences
    assert 0 <= r.novel_types <= r.n_test_types
    assert r.novel_occurrence_rate == pytest.approx(
        r.novel_occurrences / r.n_test_occurrences, abs=1e-3
    )
    # A novel TYPE is at most as frequent as an average seen type, so
    # occurrence-novelty cannot exceed type-novelty by much — but the
    # hard invariant is just both being valid rates.
    assert r.novel_type_rate == pytest.approx(
        r.novel_types / r.n_test_types, abs=1e-3
    )


def test_connected_components_contain_all_dup_pairs(spark):
    pairs = [
        (r.doc_a, r.doc_b)
        for r in _rows(spark, "dedup_fuzzy_levenshtein")
        if r.is_near_dup == 1
    ]
    clusters = _rows(spark, "dedup_cluster_connected_components")
    member_of = {}
    for c in clusters:
        members = [int(x) for x in c.members.split(",")]
        assert len(members) == c.n_docs >= 2
        assert c.cluster_id == min(members)  # min-label convention
        for m in members:
            member_of[m] = c.cluster_id
    # Every confirmed near-dup pair must land in the SAME cluster.
    for a, b in pairs:
        assert member_of.get(a) is not None and member_of[a] == member_of[b]


def test_runs_test_bookkeeping(spark):
    (r,) = _rows(spark, "stat_runs_test")
    assert r.n_up + r.n_down >= r.n_runs >= 1
    # Expected runs formula sanity: between 1 and n+1.
    assert 1.0 <= r.expected_runs <= r.n_up + r.n_down + 1
    assert r.nonrandom_95 in (0, 1)


def test_learning_curve_points_complete(spark):
    rows = _rows(spark, "ml_learning_curve")
    assert [r.train_tenths for r in rows] == [2, 4, 6, 8]
    # Training size strictly grows along the curve; test set is fixed.
    sizes = [r.n_train for r in rows]
    assert all(a < b for a, b in zip(sizes, sizes[1:]))
    assert len({r.n_test for r in rows}) == 1
    assert all(r.test_rmse > 0 for r in rows)


def test_char_entropy_below_alphabet_ceiling(spark):
    rows = _rows(spark, "text_char_entropy")
    assert rows
    for r in rows:
        assert 0.0 <= r.entropy_bits <= r.max_entropy_bits + 1e-6
        assert r.alphabet_size <= 37  # [a-z0-9 ] after normalization
        assert r.n_chars > 0


def test_ljung_box_consistent_with_acf(spark):
    (r,) = _rows(spark, "stat_ljung_box")
    assert r.df == 7
    assert r.q_statistic >= 0.0
    # Recompute Q from the registered ACF row — the two queries must
    # describe the same series.
    acf = _rows(spark, "events_acf_lags")
    n = r.n_days
    q = n * (n + 2) * sum(a.acf**2 / (n - a.lag_k) for a in acf)
    assert r.q_statistic == pytest.approx(q, rel=5e-3)


def test_did_cells_reconcile(spark):
    (r,) = _rows(spark, "stat_did_promo_uplift")
    assert r.n_total > 0
    did = (r.treated_post_mean - r.treated_pre_mean) - (
        r.control_post_mean - r.control_pre_mean
    )
    assert r.did_estimate == pytest.approx(did, abs=0.02)


def test_survivorship_reconciles_with_components(spark):
    (r,) = _rows(spark, "dedup_survivorship_report")
    clusters = _rows(spark, "dedup_cluster_connected_components")
    assert r.n_clusters == len(clusters)
    assert r.n_removed == sum(c.n_docs - 1 for c in clusters)
    assert r.survivor_rate == pytest.approx(1 - r.n_removed / r.n_docs, abs=1e-4)


def test_yoy_growth_consistent(spark):
    rows = _rows(spark, "orders_yoy_growth")
    for r in rows:
        assert r.revenue_prior_year > 0
        assert r.yoy_growth == pytest.approx(
            (r.revenue - r.revenue_prior_year) / r.revenue_prior_year, abs=2e-3
        )


def test_wasserstein_nonnegative_and_bounded(spark):
    (r,) = _rows(spark, "stat_wasserstein_hi_lo")
    assert r.n_hi > 0 and r.n_lo > 0
    assert r.w1_dollars >= 0.0
    # W1 normalized by the value range is bounded by sup|F_hi-F_lo| <= 1.
    assert 0.0 <= r.w1_normalized <= 1.0


def test_hellinger_bounds_and_bc_identity(spark):
    (r,) = _rows(spark, "stat_hellinger_segments")
    assert 0.0 <= r.bc_coefficient <= 1.0
    assert 0.0 <= r.hellinger <= 1.0
    # H = sqrt(1 - BC) by definition.
    assert r.hellinger == pytest.approx(math.sqrt(1 - r.bc_coefficient), abs=1e-5)
    assert r.bhattacharyya_distance >= 0.0


def test_levene_w_nonnegative_and_medians_in_domain(spark):
    (r,) = _rows(spark, "stat_levene_brown_forsythe")
    assert r.w_statistic >= 0.0
    for med in (r.med_a, r.med_n, r.med_r):
        assert 1 <= med <= 50
    assert r.df1 == 2 and r.df2 == r.n_total - 3


def test_durbin_watson_range(spark):
    (r,) = _rows(spark, "stat_durbin_watson_daily")
    # DW lives in [0, 4]; rho = 1 - DW/2 in [-1, 1].
    assert 0.0 <= r.dw_statistic <= 4.0
    assert -1.0 <= r.rho_lag1 <= 1.0
    assert r.rho_lag1 == pytest.approx(1 - r.dw_statistic / 2, abs=1e-5)


def test_grubbs_bound(spark):
    (r,) = _rows(spark, "stat_grubbs_daily_outlier")
    n = r.n_days
    # G <= (n-1)/sqrt(n) is a hard algebraic bound for any sample.
    assert 0.0 <= r.g_statistic <= (n - 1) / math.sqrt(n) + 1e-9
    assert r.outlier_dollars > 0


def test_mcc_confusion_consistency(spark):
    (r,) = _rows(spark, "ml_mcc_threshold_eval")
    n = r.tp + r.fp + r.fn + r.tn
    assert n > 0
    assert r.accuracy == pytest.approx((r.tp + r.tn) / n, abs=1e-5)
    assert -1.0 <= r.mcc <= 1.0
    f1 = 2 * r.tp / (2 * r.tp + r.fp + r.fn)
    assert r.f1 == pytest.approx(f1, abs=1e-5)


def test_brier_calibration_decomposition(spark):
    rows = _rows(spark, "ml_brier_calibration")
    assert 1 <= len(rows) <= 10
    briers = {r.brier_score for r in rows}
    assert len(briers) == 1
    b = briers.pop()
    assert 0.0 <= b <= 1.0
    for r in rows:
        assert 0.0 <= r.mean_predicted <= 1.0
        assert 0.0 <= r.observed_rate <= 1.0
        # bin b covers predicted scores [b/10, (b+1)/10).
        assert r.bin / 10 - 1e-6 <= r.mean_predicted <= (r.bin + 1) / 10 + 1e-6


def test_dsir_target_source_scores_highest(spark):
    rows = _rows(spark, "corpus_dsir_importance")
    by_src = {r.source: r for r in rows}
    # The target domain must (a) appear and (b) have the max mean
    # log-ratio under its own LM — the defining property of DSIR.
    assert "src0" in by_src
    best = max(rows, key=lambda r: r.mean_logratio)
    assert best.source == "src0"
    # Selection budget: ceil(20%) of all docs, allowing value ties.
    n_total = sum(r.n_docs for r in rows)
    n_sel = sum(r.n_selected for r in rows)
    assert n_sel >= (n_total + 4) // 5
    assert n_sel <= n_total


def test_l_diversity_census_consistent(spark):
    (r,) = _rows(spark, "dq_l_diversity")
    assert 1 <= r.min_l <= 5
    assert r.n_groups_l1 + r.n_groups_l2 == r.n_groups_lt3 or r.min_l >= 3
    assert 0.0 <= r.frac_rows_at_risk <= 1.0
    assert r.n_rows_at_risk <= r.n_rows


def test_t_closeness_bounds(spark):
    rows = _rows(spark, "dq_t_closeness")
    assert len(rows) > 0
    for r in rows:
        # Ordinal EMD normalized by (k-1) lives in [0, 1].
        assert 0.0 <= r.t_closeness <= 1.0
        assert r.violates_t05 == (r.t_closeness > 0.05) or abs(
            r.t_closeness - 0.05
        ) < 1e-5


def test_threshold_sweep_monotone(spark):
    rows = sorted(_rows(spark, "dedup_threshold_sweep"), key=lambda r: r.tau_tenths)
    assert [r.tau_tenths for r in rows] == [3, 5, 7, 9]
    # Tightening the threshold can only shrink the pair and doc census.
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_docs_flagged >= b.n_docs_flagged
    for r in rows:
        assert r.n_docs_flagged <= r.n_pairs or r.n_pairs == 0


def test_adamic_adar_candidates_are_nonedges(spark):
    rows = _rows(spark, "graph_adamic_adar")
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.id_a < r.id_b
        assert r.common_neighbors >= 1
        # AA with every common neighbor at the min degree 2 bounds the
        # score from above by cn/ln(2).
        assert r.aa_score <= r.common_neighbors / math.log(2) + 1e-6
    scores = [r.aa_score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_kcore_peel_monotone(spark):
    rows = sorted(_rows(spark, "graph_kcore_peel"), key=lambda r: r.iteration)
    assert [r.iteration for r in rows] == [0, 1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes
        assert b.n_edges <= a.n_edges
    last = rows[-1]
    # After peeling, any surviving node has degree >= 2 unless the
    # core emptied out entirely.
    assert last.n_nodes == 0 or last.min_degree >= 1


def test_periodogram_bounds(spark):
    rows = _rows(spark, "events_periodogram_calendar")
    assert [r.period_days for r in rows] == [7, 14, 30]
    for r in rows:
        assert r.r2_fraction >= 0.0
        assert r.amplitude_events >= 0.0
        assert r.n_days > 0


def test_nelson_aalen_vs_km(spark):
    na = {r.duration_weeks: r for r in _rows(spark, "stat_nelson_aalen_hazard")}
    km = {r.duration_weeks: r for r in _rows(spark, "stat_kaplan_meier_retention")}
    assert set(na) == set(km)
    prev_h = 0.0
    for d in sorted(na):
        r = na[d]
        assert r.cum_hazard >= prev_h - 1e-9  # hazard only accumulates
        prev_h = r.cum_hazard
        # NA survival upper-bounds KM: exp(-Σh) >= Π(1-h) pointwise.
        assert r.na_survival >= km[d].survival - 1e-4


def test_elasticity_all_brands_present(spark):
    rows = _rows(spark, "part_price_elasticity")
    assert len(rows) == 25
    for r in rows:
        assert r.n_lines > 0
        assert r.mean_ln_price > 0


def test_new_vs_returning_reconciles_with_totals(spark):
    rows = _rows(spark, "customer_new_vs_returning")
    assert len(rows) > 0
    # First month is 100% new by definition.
    first = min(rows, key=lambda r: r.month)
    assert first.revenue_returning == 0.0
    assert first.n_new_cust_orders == first.n_orders
    for r in rows:
        assert r.n_new_cust_orders <= r.n_orders
        assert r.revenue_new >= 0 and r.revenue_returning >= 0


def test_kendall_tau_bounds_and_pair_census(spark):
    (r,) = _rows(spark, "stat_kendall_tau_ordinal")
    assert -1.0 <= r.tau_b <= 1.0
    # Concordant + discordant can never exceed total pairs.
    assert r.concordant + r.discordant <= r.n * (r.n - 1) // 2
    assert r.concordant >= 0 and r.discordant >= 0


def test_kmv_intersection_consistency(spark):
    (r,) = _rows(spark, "agg_kmv_set_intersection")
    assert r.n_inter_exact <= min(r.n_a_exact, r.n_b_exact)
    assert 0 <= r.rho_num <= 64
    # Union estimate should be at least as large as either side's.
    assert r.est_union >= max(r.est_a, r.est_b) * 0.5
    # With populations >> k the estimator should land within 50%.
    if r.n_inter_exact >= 64:
        assert abs(r.est_intersection - r.n_inter_exact) / r.n_inter_exact < 0.5


def test_concurrency_census_bounds(spark):
    rows = _rows(spark, "orders_concurrency_census")
    assert len(rows) > 0
    for r in rows:
        assert r.max_open_orders >= 0
        assert r.peak_day.year == r.year


def test_retract_matches_filtered_recompute(spark):
    rows = _rows(spark, "incremental_agg_retract")
    assert len(rows) > 0
    from insurance_helper_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    orders = load_table(spark, SF_DIR, "orders", columns=["o_custkey", "o_orderdate"])
    direct = (
        orders.filter(F.year("o_orderdate") != 1995)
        .groupBy("o_custkey")
        .count()
        .collect()
    )
    direct_map = {r.o_custkey: r["count"] for r in direct}
    got = {r.o_custkey: r.n_orders for r in rows}
    assert got == direct_map  # keys with all orders deleted must drop


def test_holt_winters_seasonal_ring_bounded(spark):
    rows = _rows(spark, "orders_holt_winters")
    assert len(rows) > 0
    by_p = {}
    for r in rows:
        by_p.setdefault(r.priority, []).append(r)
    for p, series in by_p.items():
        series.sort(key=lambda r: r.day)
        # First observation initializes level to the observation.
        assert series[0].level == pytest.approx(series[0].revenue, abs=0.01)
        assert series[0].trend == 0.0
        for r in series:
            assert math.isfinite(r.forecast_next)


def test_theil_nonnegative_and_ordering(spark):
    (r,) = _rows(spark, "stat_theil_inequality")
    # Jensen: both Theil indices are >= 0 (up to ln-quantization).
    assert r.theil_t >= -1e-3
    assert r.theil_l >= -1e-3
    assert r.mean_value > 0


def test_effect_sizes_consistent(spark):
    (r,) = _rows(spark, "stat_effect_sizes_urgency")
    # Hedges g is a shrunk Cohen's d: same sign, smaller magnitude.
    assert abs(r.hedges_g) <= abs(r.cohens_d) + 1e-9
    assert (r.hedges_g >= 0) == (r.cohens_d >= 0)
    assert (r.mean_diff_dollars >= 0) == (r.cohens_d >= 0)


def test_backlog_aging_buckets(spark):
    rows = _rows(spark, "orders_backlog_aging")
    assert len(rows) >= 1
    seen = set()
    for r in rows:
        assert r.age_bucket in {"0-30", "31-60", "61-90", "90+"}
        assert r.age_bucket not in seen
        seen.add(r.age_bucket)
        assert r.n_orders > 0
        assert r.open_value > 0
        if r.age_bucket == "0-30":
            assert r.oldest_age_days <= 30
        if r.age_bucket == "31-60":
            assert 31 <= r.oldest_age_days <= 60


def test_ann_recall_sane(spark):
    (r,) = _rows(spark, "similarity_ann_recall_eval")
    assert r.n_queries > 0
    assert r.total_exact == r.n_queries * 10
    assert 0.0 <= r.recall_at_10 <= 1.0
    assert r.total_hits <= r.total_exact
    # Banded SRP on 64-dim random-ish vectors should beat blind
    # guessing by a wide margin: candidates per query is far below
    # corpus size, yet recall should be well above the candidate
    # fraction (that is the whole point of LSH).
    assert r.recall_at_10 > 0.3


def test_power_sample_size_consistency(spark):
    rows = _rows(spark, "stat_power_sample_size")
    assert len(rows) > 0
    for r in rows:
        assert 0.0 < r.rate_a < 1.0 and 0.0 < r.rate_b < 1.0
        assert r.rate_a != r.rate_b
        # Higher power always needs at least as many samples.
        assert r.n90_per_arm >= r.n80_per_arm >= 1


def test_clustering_coefficient_bounds(spark):
    (r,) = _rows(spark, "graph_clustering_coefficient")
    assert 0.0 <= r.avg_clustering <= 1.0
    assert 0.0 <= r.global_transitivity <= 1.0
    assert r.n_nodes_deg2 <= r.n_nodes
    assert r.max_node_triangles >= 0


def test_bayesian_ab_probability_coherent(spark):
    rows = _rows(spark, "stat_bayesian_ab_urgency")
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.prob_a_beats_b <= 1.0
        # Direction must match the posterior means.
        if r.posterior_mean_a > r.posterior_mean_b:
            assert r.prob_a_beats_b >= 0.5
        else:
            assert r.prob_a_beats_b <= 0.5
        # And z-distance sign agrees.
        assert (r.z_distance >= 0) == (r.posterior_mean_a >= r.posterior_mean_b)


def test_textrank_ranked_and_within_band(spark):
    rows = _rows(spark, "text_textrank_keywords")
    assert 0 < len(rows) <= 20
    ranks = [r.rank for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    scores = [r.textrank for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.degree >= 1
        assert r.textrank > 0


def test_qlr_break_inside_trim(spark):
    (r,) = _rows(spark, "stat_qlr_structural_break")
    assert r.qlr_f >= 0.0
    assert r.n_days > 0
    assert math.isfinite(r.slope_before) and math.isfinite(r.slope_after)


def test_lorenz_curve_convex_and_terminal(spark):
    rows = sorted(_rows(spark, "stat_lorenz_curve_deciles"), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.income_share for r in rows]
    # Monotone, below the diagonal, and exactly 1 at the 100% point.
    assert all(b >= a - 1e-9 for a, b in zip(shares, shares[1:]))
    for r in rows:
        assert r.income_share <= r.pop_share + 1e-6
        assert r.lorenz_gap >= -1e-6
    assert shares[-1] == pytest.approx(1.0, abs=1e-6)
    # Increments must grow (convexity of the Lorenz curve).
    inc = [b - a for a, b in zip([0.0] + shares, shares)]
    assert all(b >= a - 1e-6 for a, b in zip(inc, inc[1:]))


def test_shard_manifest_reconciles(spark):
    rows = sorted(_rows(spark, "corpus_shard_manifest"), key=lambda r: r.shard_id)
    assert len(rows) >= 2
    assert [r.shard_id for r in rows] == list(range(len(rows)))
    # Doc ranges partition the id space in order with no overlap.
    for a, b in zip(rows, rows[1:]):
        assert a.last_doc < b.first_doc
    total = sum(r.shard_bytes for r in rows)
    from insurance_helper_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents", columns=["n_chars"])
    assert total == docs.agg(F.sum("n_chars")).collect()[0][0]
