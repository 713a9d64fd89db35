"""Mathematical/structural invariants for the round-7 wave-4 operators —
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


def test_bloom_semijoin_no_false_negatives(spark):
    rows = _rows(spark, "ops_bloom_semijoin_audit")
    assert rows
    for r in rows:
        # A Bloom filter may over-approximate, never under-approximate.
        assert r.n_pass_bloom >= r.n_true_members
        assert r.n_false_positives == r.n_pass_bloom - r.n_true_members
        assert 0.0 <= r.fp_rate <= 1.0
        assert 0.0 <= r.pruned_frac <= 1.0


def test_bloom_semijoin_member_total_matches_exact_semijoin(spark):
    from pyspark.sql import functions as F

    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "ops_bloom_semijoin_audit")
    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    build = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    exact = orders.join(
        build, orders.o_custkey == build.c_custkey, "left_semi"
    ).count()
    assert sum(r.n_true_members for r in rows) == exact


def test_ols_two_regressors_normal_equations_hold(spark):
    """The fitted plane passes through the group centroid: this is the
    first normal equation (sum of residuals = 0), true for any data."""
    from pyspark.sql import functions as F

    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "stat_ols_two_regressors")
    assert rows
    li = load_table(spark, SF_DIR, "lineitem")
    means = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.avg(F.round("l_quantity")).alias("mx1"),
            F.avg(F.round(F.col("l_discount") * 100)).alias("mx2"),
            F.avg(F.round(F.col("l_extendedprice") * 100)).alias("my"),
        )
        .collect()
    }
    for r in rows:
        m = means[r["l_returnflag"]]
        pred = r.b0_cents + r.b1_cents_per_qty * m.mx1 + r.b2_cents_per_disc_pct * m.mx2
        assert abs(pred - m.my) / abs(m.my) < 1e-6


def test_apportionment_seats_sum_to_budget(spark):
    from insurance_helper_spark.queries.analytics_ext import APPORTION_SEATS

    rows = _rows(spark, "orders_apportionment_largest_remainder")
    assert rows
    assert sum(r.seats for r in rows) == APPORTION_SEATS
    grand = sum(r.rev_cents for r in rows)
    for r in rows:
        assert r.bonus_seat in (0, 1)
        assert r.seats - r.bonus_seat == r.floor_seats
        assert r.floor_seats == (APPORTION_SEATS * r.rev_cents) // grand
        # Largest-remainder never strays more than one seat from the
        # exact quota (the method's defining property).
        assert abs(r.seats - r.exact_quota) < 1.0


def test_compaction_planner_conserves_bytes_and_shrinks(spark):
    from pyspark.sql import functions as F

    from insurance_helper_spark.queries.curation_queries import _COMPACT_TARGET
    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "ops_file_compaction_planner")
    assert rows
    truth = {
        r["source"]: r
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("bytes"),
            F.max("n_chars").alias("max_file"),
        )
        .collect()
    }
    for r in rows:
        t = truth[r.source]
        assert r.n_files_before == t.n
        assert r.total_bytes == t.bytes
        assert 1 <= r.n_groups_after <= r.n_files_before
        # A group closes when the cumsum crosses the target, so it can
        # exceed the target by at most one file.
        assert r.max_group_bytes < _COMPACT_TARGET + t.max_file
        assert r.mean_fill > 0.0


def test_holt_linear_initialization_and_forecast(spark):
    rows = _rows(spark, "orders_holt_linear")
    assert rows
    first_by_priority = {}
    for r in rows:
        first_by_priority.setdefault(r.priority, r)
        assert abs(r.forecast_next - (r.level + r.trend)) < 2e-3
    for r in first_by_priority.values():
        assert r.trend == 0.0
        assert abs(r.level - r.revenue) < 1e-9


def test_inverted_index_postings_sorted_and_consistent(spark):
    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "text_inverted_index")
    assert rows
    n_docs = load_table(spark, SF_DIR, "documents").count()
    for r in rows:
        assert 1 <= r.df <= n_docs
        assert r.cf >= r.df
        ids = [int(x) for x in r.postings_head.split(",")]
        assert len(ids) == min(r.df, 20)
        assert ids == sorted(ids) and len(set(ids)) == len(ids)


def test_cohens_kappa_contingency_and_formula(spark):
    rows = _rows(spark, "stat_cohens_kappa")
    assert len(rows) == 1
    r = rows[0]
    assert r.n_both_dup + r.n_jaccard_only + r.n_tokensort_only + r.n_neither == r.n_docs
    assert 0.0 <= r.po <= 1.0 and 0.0 <= r.pe <= 1.0
    if r.kappa is not None:
        po = (r.n_both_dup + r.n_neither) / r.n_docs
        pe = (
            (r.n_both_dup + r.n_jaccard_only) * (r.n_both_dup + r.n_tokensort_only)
            + (r.n_tokensort_only + r.n_neither) * (r.n_jaccard_only + r.n_neither)
        ) / (r.n_docs * r.n_docs)
        assert abs(r.kappa - (po - pe) / (1 - pe)) < 1e-5
        assert r.kappa <= 1.0


def test_naive_bayes_covers_all_test_docs(spark):
    from pyspark.sql import functions as F

    from insurance_helper_spark.functions.hashing import hash_family
    from insurance_helper_spark.functions.text import tokens
    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "ml_naive_bayes_langid")
    assert rows
    docs = load_table(spark, SF_DIR, "documents").filter(
        F.size(tokens(F.col("text"))) > 0
    )
    n_test = docs.filter(hash_family(F.col("doc_id"), 7) % 5 == 0).count()
    assert sum(r.n_docs for r in rows) == n_test
    train_langs = {
        r.lang
        for r in docs.filter(hash_family(F.col("doc_id"), 7) % 5 != 0)
        .select("lang")
        .distinct()
        .collect()
    }
    for r in rows:
        assert r.pred_lang in train_langs
        assert r.n_docs >= 1


def test_decision_stump_partitions_and_gain(spark):
    from pyspark.sql import functions as F

    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "ml_decision_stump_gini")
    assert len(rows) == 1
    r = rows[0]
    orders = load_table(spark, SF_DIR, "orders")
    n = orders.count()
    pos = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).count()
    assert r.n_left + r.n_right == n
    assert r.pos_left + r.pos_right == pos
    assert r.n_left > 0 and r.n_right > 0
    assert 0.0 <= r.gini_split <= r.gini_parent <= 0.5
    assert r.gini_gain >= 0.0
    lo = orders.agg(F.min(F.round(F.col("o_totalprice") * 100))).first()[0]
    hi = orders.agg(F.max(F.round(F.col("o_totalprice") * 100))).first()[0]
    assert lo < r.threshold_cents <= hi + 1


def test_zorder_beats_lexicographic_locality(spark):
    rows = _rows(spark, "ops_zorder_locality_audit")
    assert len(rows) == 1
    r = rows[0]
    assert 2 <= r.n_cells <= 256 * 256
    assert r.total_gap_z > 0 and r.total_gap_lex > 0
    # The whole point of the curve: consecutive cells stay near in BOTH
    # dimensions, so the average jump must beat the lexicographic layout.
    assert r.avg_gap_z < r.avg_gap_lex
    assert r.locality_gain > 1.0


def test_jl_projection_preserves_distances_on_average(spark):
    rows = _rows(spark, "embedding_random_projection_jl")
    assert len(rows) == 1
    r = rows[0]
    assert r.n_pairs >= 1
    assert r.min_ratio <= r.mean_ratio <= r.max_ratio
    assert r.min_ratio > 0.0
    # E[ratio] = 1 under JL; k=16 keeps the sample mean well inside.
    assert 0.5 < r.mean_ratio < 2.0
    assert 0.5 <= r.frac_within_2x <= 1.0


def test_logreg_newton_step_direction(spark):
    """One Newton step from w=0 must move the intercept toward the
    log-odds of the base rate (positive iff more than half positive)."""
    rows = _rows(spark, "ml_logreg_newton_step")
    assert len(rows) == 1
    r = rows[0]
    assert 0 < r.n_pos < r.n_rows
    base = r.n_pos / r.n_rows
    if base < 0.5:
        assert r.w0 < 0.0
    elif base > 0.5:
        assert r.w0 > 0.0


def test_two_proportion_ztest_directions_balance(spark):
    rows = _rows(spark, "stat_two_proportion_ztest")
    assert rows
    for r in rows:
        assert r.pos1 <= r.n1 and r.pos2 <= r.n2
        assert (r.p1 > r.p2) == (r.z_score > 0) or r.z_score == 0
        assert r.significant_95 in (0, 1)
        assert r.significant_95 == (1 if abs(r.z_score) > 1.96 else 0)


def test_range_partition_planner_contiguous_and_balanced(spark):
    from insurance_helper_spark.queries.curation_queries import _RP_N

    rows = sorted(_rows(spark, "ops_range_partition_planner"), key=lambda r: r.part_id)
    assert 1 <= len(rows) <= _RP_N
    grand = sum(r.range_rows for r in rows)
    assert sum(r.hash_rows for r in rows) == grand
    prev_hi = None
    for r in rows:
        assert r.lo_key <= r.hi_key
        if prev_hi is not None:
            assert r.lo_key > prev_hi  # contiguous, non-overlapping ranges
        prev_hi = r.hi_key
        # Row balance: a range cut at equal row mass can exceed the
        # ideal share by at most one key's worth of rows.
        assert r.range_rows <= grand // _RP_N + max(
            rr.range_rows // rr.range_keys + 1 for rr in rows
        )


def test_knn_confusion_covers_test_split(spark):
    from pyspark.sql import functions as F

    from insurance_helper_spark.functions.hashing import hash_family
    from insurance_helper_spark.sources.tables import load_table

    rows = _rows(spark, "ml_knn_classify")
    assert rows
    emb = load_table(spark, SF_DIR, "embeddings")
    n_test = emb.filter(hash_family(F.col("vec_id"), 11) % 5 == 0).count()
    assert sum(r.n_vecs for r in rows) == n_test
    train_labels = {
        r.label
        for r in emb.filter(hash_family(F.col("vec_id"), 11) % 5 != 0)
        .select("label")
        .distinct()
        .collect()
    }
    for r in rows:
        assert r.pred_label in train_labels
