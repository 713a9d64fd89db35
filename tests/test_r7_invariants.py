"""Mathematical/structural invariants for the round-7 wave-2 operators —
properties that must hold for ANY input, checked on the fixture
(complements the oracle hash check, which pins values but not meaning)."""

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


def test_ohlc_low_le_open_close_le_high(spark):
    rows = _rows(spark, "events_daily_ohlc")
    assert rows
    for r in rows:
        assert r.low <= r.high
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n_events >= 1


def test_quantile_normalize_preserves_rows_and_range(spark):
    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "corpus_quantile_normalize")
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert len(rows) == n_docs
    lens = sorted(r.n_tokens for r in rows)
    for r in rows:
        # Normalized values are drawn from the global length multiset.
        assert lens[0] <= r.norm_tokens <= lens[-1]


def test_capped_balance_never_negative(spark):
    rows = _rows(spark, "events_capped_running_balance")
    assert rows
    for r in rows:
        assert r.balance_cents >= 0


def test_seasonal_indices_average_to_one(spark):
    rows = _rows(spark, "orders_seasonal_decomposition")
    if rows:  # needs >= 12 months of trend support
        assert abs(sum(r.seasonal_index for r in rows) / len(rows) - 1.0) < 1e-3


def test_assortativity_in_unit_interval(spark):
    (r,) = _rows(spark, "graph_degree_assortativity")
    assert -1.0 <= r.assortativity <= 1.0
    assert r.n_edges > 0


def test_heaps_fit_sane(spark):
    (r,) = _rows(spark, "text_heaps_law_fit")
    assert r.n_points == 10
    # Sublinear growth; the sf0.001 fixture's tiny synthetic vocabulary
    # saturates in the first decile, making beta exactly 0 there — and
    # (r8) the exact-integer y-variance is then exactly 0, so r_squared
    # is NULL by the degenerate-variance guard, never a 0/eps quotient.
    assert 0.0 <= r.heaps_beta < 1.1
    assert r.r_squared is None or 0.0 <= r.r_squared <= 1.0
    assert r.heaps_k > 0


def test_fdr_rejections_form_rank_prefix(spark):
    rows = _rows(spark, "stat_fdr_bh_correction")
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    rejected = [r.rank for r in rows if r.rejected]
    assert rejected == list(range(1, len(rejected) + 1))  # BH step-up prefix
    for r in rows:
        assert 0.0 <= r.p_approx <= 1.0


def test_ivm_delta_plus_base_equals_full(spark):
    """The delta-algebra output plus the base view must reconstruct the
    full join view exactly (count-level check on top of the oracle)."""
    from pyspark.sql import functions as F

    from insurance_helper_spark.functions.hashing import knuth_uniform
    from insurance_helper_spark.sources.tables import load_table

    delta_rows = len(_rows(spark, "incremental_join_view_delta"))
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer")
    full = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    o_b = orders.filter(knuth_uniform(F.col("o_orderkey")) < 0.9)
    c_b = cust.filter(knuth_uniform(F.col("c_custkey")) < 0.95)
    base = o_b.join(c_b, o_b.o_custkey == c_b.c_custkey).count()
    assert base + delta_rows == full


def test_cohort_ltv_monotone_per_cohort(spark):
    rows = _rows(spark, "orders_cohort_ltv")
    by_c = {}
    for r in rows:
        by_c.setdefault(r.cohort, []).append(r)
    assert by_c
    for cohort, rs in by_c.items():
        rs.sort(key=lambda r: r.month_index)
        ltvs = [r.avg_cum_ltv for r in rs]
        assert all(a <= b + 1e-9 for a, b in zip(ltvs, ltvs[1:])), cohort
        for r in rs:
            assert r.n_active <= r.cohort_size


def test_column_profile_bounds(spark):
    rows = _rows(spark, "dq_column_profile")
    assert len(rows) == 6
    for r in rows:
        assert 0 <= r.n_nulls <= r.n_rows
        assert 1 <= r.n_distinct <= r.n_rows


def test_langid_eval_marginals_consistent(spark):
    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "ml_langid_confusion_eval")
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_true for r in rows) == n_docs
    assert sum(r.n_pred for r in rows) == n_docs
    for r in rows:
        assert r.tp <= min(r.n_true, r.n_pred) or (r.n_true == 0 or r.n_pred == 0)


def test_forecast_backtest_bounds(spark):
    (r,) = _rows(spark, "orders_forecast_backtest")
    assert r.n_months > 0
    assert r.mape_seasonal >= 0 and r.mape_naive >= 0
    assert 0.0 <= r.smape_seasonal <= 2.0 and 0.0 <= r.smape_naive <= 2.0


def test_price_index_base_year_is_one(spark):
    rows = _rows(spark, "orders_price_index_laspeyres")
    base = min(rows, key=lambda r: r.year)
    assert base.laspeyres == 1.0 and base.paasche == 1.0 and base.fisher == 1.0
    for r in rows:
        assert min(r.laspeyres, r.paasche) - 1e-9 <= r.fisher <= max(
            r.laspeyres, r.paasche
        ) + 1e-9  # geometric mean lies between


def test_churn_partition_covers_all_ordering_customers(spark):
    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "ml_churn_label_summary")
    orders = load_table(spark, SF_DIR, "orders")
    n_custs = orders.select("o_custkey").distinct().count()
    assert sum(r.n_churned + r.n_active for r in rows) == n_custs
    for r in rows:
        assert 0.0 <= r.churn_rate <= 1.0


def test_duplicate_payment_gaps_bounded(spark):
    for r in _rows(spark, "dq_duplicate_payment_candidates"):
        assert 0 <= r.min_gap_days <= 7
        assert r.n_customers <= r.n_candidate_pairs or r.n_candidate_pairs == 0


def test_duplicate_payment_predicate_flags_seeded_pair(spark):
    """The fixture has zero candidate pairs, so the query-level checks
    above are vacuous there (r7 ADVICE) — drive the screen's core
    predicate with seeded data: a same-customer same-amount pair 3 days
    apart MUST be flagged; the same pair 30 days apart, a different
    amount, and a different customer must NOT."""
    import datetime as dt

    from insurance_helper_spark.queries.curation_queries import (
        duplicate_payment_flags,
    )

    d = dt.date
    rows = [
        # duplicate: cust 1, 5000 cents, 3 days apart → flag order 102
        (1, 5000, d(2024, 1, 1), 101),
        (1, 5000, d(2024, 1, 4), 102),
        # same key 30 days later → outside the window, no flag
        (1, 5000, d(2024, 2, 3), 103),
        # same customer, different amount, 1 day apart → no flag
        (1, 6000, d(2024, 1, 2), 104),
        # different customer, same amount/date as 101 → no flag
        (2, 5000, d(2024, 1, 1), 105),
        # chain: three identical within 7 days → both successors flagged
        (3, 900, d(2024, 3, 1), 201),
        (3, 900, d(2024, 3, 2), 202),
        (3, 900, d(2024, 3, 5), 203),
    ]
    base = spark.createDataFrame(
        rows, "o_custkey long, cents long, o_orderdate date, o_orderkey long"
    )
    flagged = {
        (r.o_orderkey, r.gap_days)
        for r in duplicate_payment_flags(base).collect()
    }
    assert flagged == {(102, 3), (202, 1), (203, 3)}


def test_token_sort_fingerprint_groups_share_token_sets(spark):
    from pyspark.sql import functions as F

    from insurance_helper_spark.functions import text as T
    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "dedup_simhash_portable")  # smoke the sibling too
    rows = _rows(spark, "dedup_token_sort_fingerprint")
    if not rows:
        pytest.skip("no fingerprint collisions at this sf")
    docs = load_table(spark, SF_DIR, "documents")
    pair = rows[0]
    sets = (
        docs.filter(F.col("doc_id").isin(pair.canonical_doc, pair.last_doc))
        .select(F.array_sort(F.array_distinct(T.tokens(F.col("text")))).alias("s"))
        .collect()
    )
    assert len(sets) == 2 and sets[0].s == sets[1].s


def test_top_paths_prefix_capped(spark):
    rows = _rows(spark, "events_top_paths")
    assert rows
    for r in rows:
        assert 1 <= r.path_len <= 5
        assert len(r.path.split(">")) == r.path_len
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_es_sample_exact_size_and_sorted(spark):
    rows = _rows(spark, "corpus_weighted_reservoir_es")
    assert len(rows) == 25
    keys = [r.es_key for r in rows]
    assert keys == sorted(keys, reverse=True)  # ln(u)/w is negative, top-k desc
    assert all(r.n_tokens > 0 for r in rows)


def test_dau_mau_stickiness_bounds(spark):
    rows = _rows(spark, "events_engagement_dau_mau")
    assert rows
    for r in rows:
        assert 1 <= r.avg_dau <= r.mau
        assert 0.0 < r.stickiness <= 1.0
        assert 1 <= r.active_days <= 31


def test_poisson_gof_components(spark):
    (r,) = _rows(spark, "stat_poisson_gof_order_lines")
    assert r.lambda_hat > 0 and r.chi2 >= 0
    assert 1 <= r.n_bins <= 9


def test_capture_recapture_estimate_bounds(spark):
    (r,) = _rows(spark, "stat_capture_recapture_customers")
    # Chapman estimate can never be below the larger sample, and both
    # samples cannot exceed it materially (bias-corrected lower bound).
    assert r.n_both <= min(r.n1, r.n2)
    assert r.chapman_estimate >= max(r.n1, r.n2) - 1


def test_paired_effect_identity(spark):
    (r,) = _rows(spark, "stat_paired_treatment_effect")
    assert r.n_paired_parts > 0
    assert abs(
        (r.mean_qty_discounted - r.mean_qty_full_price) - r.avg_paired_effect
    ) < 2e-4  # avg of diffs == diff of avgs over the same paired set


def test_ccf_bounds_and_no_self_pairs(spark):
    rows = _rows(spark, "events_cross_correlation_leadlag")
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r.ccf <= 1.0 + 1e-9
        assert r.lead_type != r.lag_type
        assert 1 <= r.lag_k <= 3


def test_waterfall_reconciles(spark):
    rows = _rows(spark, "lineitem_revenue_waterfall")
    assert rows
    for r in rows:
        assert abs(r.net_revenue - (r.gross_revenue - r.discount_given)) < 1e-6
        assert abs(r.billed_total - (r.net_revenue + r.tax_collected)) < 1e-6
        assert 0.0 <= r.discount_rate < 1.0
        assert r.effective_tax_rate >= 0.0


def test_psi_nonnegative_and_bins_complete(spark):
    (r,) = _rows(spark, "ml_psi_drift_detection")
    assert r.n_bins == 10
    assert r.psi >= 0.0  # PSI is a symmetrized KL: always >= 0
    assert 0.0 <= r.max_bin_shift <= 1.0


def test_hrw_minimal_movement_property(spark):
    """Rendezvous hashing's defining property: when a 9th shard joins,
    every mover lands ON the new shard, and the moved fraction is near
    1/9 (generous band — n is small at fixture scale). The original
    post-multiply seed mix failed BOTH (100% moved); the pure
    multiplicative chain failed the band (5.4%)."""
    rows = _rows(spark, "ops_rendezvous_sharding")
    assert {r.shard for r in rows} == set(range(8))
    tot = sum(r.n_docs for r in rows)
    moved = sum(r.n_moved for r in rows)
    assert sum(r.n_moved_elsewhere for r in rows) == 0
    assert 0.03 < moved / tot < 0.25, moved / tot


def test_minhash_rows_are_decorrelated(spark):
    """With a seed-before-multiply avalanche family, MinHash estimates
    take FRACTIONAL values (many effective permutations). The broken
    additive family collapsed every estimate to 0 or 1."""
    rows = _rows(spark, "dedup_minhash_estimate_audit", sf="/root/testdata/sf0.01")
    assert rows
    assert any(0.0 < r.est_jaccard < 1.0 for r in rows)
    assert all(r.within_hoeffding for r in rows)
