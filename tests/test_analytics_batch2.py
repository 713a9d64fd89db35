"""Invariant tests for the second round-4 analytics batch (skyline,
streaks, triangles, TWAP, MAD, basket lift, HHI, bitext margin,
SCD2/DQ covered in their own files). Value parity lives in
test_oracle_parity; these pin the semantic properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def catalog():
    from insurance_helper_spark.queries import catalog as cat

    cat.load_all()
    return cat


def test_skyline_is_mutually_nondominating(spark, catalog):
    rows = catalog.QUERIES["parts_pareto_skyline"](spark, SF_DIR).collect()
    assert rows
    by_brand: dict[str, list] = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, []).append(r)
    for brand, pts in by_brand.items():
        for p in pts:
            for q in pts:
                dominates = (
                    q.price <= p.price and q.p_size >= p.p_size
                    and (q.price < p.price or q.p_size > p.p_size)
                )
                assert not dominates, (brand, p, q)


def test_streak_bounded_by_active_days(spark, catalog):
    streaks = {
        r.user_id: r.longest_streak
        for r in catalog.QUERIES["events_longest_streak"](spark, SF_DIR).collect()
    }
    active = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(streaks) == set(active)
    for u, s in streaks.items():
        assert 1 <= s <= active[u]


def test_triangles_bounded_by_wedges(spark, catalog):
    row = catalog.QUERIES["basket_triangle_count"](spark, SF_DIR).collect()[0]
    assert row.n_edges >= 0 and row.n_triangles >= 0
    # Each triangle needs 3 edges; crude sanity bound.
    if row.n_triangles > 0:
        assert row.n_edges >= 3


def test_twap_within_value_range(spark, catalog):
    rows = catalog.QUERIES["events_time_weighted_avg"](spark, SF_DIR).collect()
    assert rows
    lo, hi = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .agg(F.min("value"), F.max("value"))
        .collect()[0]
    )
    for r in rows:
        # A convex combination of observed values stays inside their range
        # (cents rounding can nudge past the boundary by <= 0.01).
        assert lo - 0.01 <= r.twap <= hi + 0.01
        assert r.active_us > 0


def test_mad_outliers_counts_consistent(spark, catalog):
    rows = catalog.QUERIES["events_mad_outliers"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_outliers <= r.n_events
        assert r.mad >= 0


def test_basket_lift_metrics_in_range(spark, catalog):
    rows = catalog.QUERIES["basket_pair_lift"](spark, SF_DIR).collect()
    for r in rows:
        assert r.part_a < r.part_b  # canonical orientation
        assert 0 < r.support <= 1
        assert 0 < r.confidence <= 1
        assert r.lift > 0


def test_hhi_bounds(spark, catalog):
    rows = catalog.QUERIES["supplier_concentration_hhi"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # HHI ∈ (10000/n, 10000]; with n suppliers the floor is 10000/n.
        assert 10000.0 / r.n_suppliers - 0.01 <= r.hhi <= 10000.01


def test_crosslingual_margin_one_match_per_source_doc(spark, catalog):
    df = catalog.QUERIES["crosslingual_margin_pairs"](spark, SF_DIR)
    rows = df.collect()
    assert rows
    ids = [r.x_id for r in rows]
    assert len(ids) == len(set(ids))  # argmax → at most one row per doc
    en_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter("lang = 'en'").select("doc_id").collect()
    }
    assert all(r.en_doc_id in en_ids for r in rows)
    assert all(r.x_lang != "en" for r in rows)
    assert all(r.margin > 1.0 for r in rows)


def test_seasonality_matrix_covers_all_events(spark, catalog):
    rows = catalog.QUERIES["events_hourly_seasonality"](spark, SF_DIR).collect()
    assert rows
    n_total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r.n_events for r in rows) == n_total
    for r in rows:
        assert 1 <= r.dow <= 7 and 0 <= r.hour_of_day <= 23


def test_shipping_lag_stats_ordered(spark, catalog):
    rows = catalog.QUERIES["supplier_shipping_lag"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.min_lag <= r.median_lag <= r.p90_lag <= r.max_lag
        assert r.n_lines > 0
