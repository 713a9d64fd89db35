"""Structural invariants for the r11 wave — properties that must hold
on ANY data, pinned at the fixture SF (the r9/r10 invariant-file
pattern). Value correctness is the oracle harness's job; these pin the
mathematical contracts the oracles can't see."""

from __future__ import annotations

import pytest

from insurance_helper_spark.queries import catalog
from tests.conftest import SF_DIR

catalog.load_all()


def _q(spark, name):
    return catalog.QUERIES[name](spark, SF_DIR)


def test_assignment_census_partitions_the_corpus(spark):
    rows = _q(spark, "vector_store_assignment_census").collect()
    n_corpus = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r["n_vectors"] for r in rows) == n_corpus  # every vector in exactly one cell
    assert all(0 <= r["cell"] < 16 for r in rows)
    assert abs(sum(r["share_pct"] for r in rows) - 100.0) < 0.01
    assert all(-1.0 <= r["mean_cos"] <= 1.0 for r in rows)


def test_incremental_assign_covers_the_delta(spark):
    rows = _q(spark, "vector_store_incremental_assign").collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_delta = emb.where("vec_id % 2 = 1").count()
    assert sum(r["n_new"] for r in rows) == n_delta
    assert all(0 <= r["cell"] < 8 for r in rows)


def test_occupancy_psi_is_nonnegative_and_consistent(spark):
    r = _q(spark, "vector_store_occupancy_psi").first()
    # PSI is a sum of (p-q)ln(p/q) terms, each >= 0
    assert r["occupancy_psi"] >= 0.0
    assert r["alarm"] == (r["occupancy_psi"] >= 0.25)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert r["n_hist"] == emb.where("vec_id % 2 = 0").count()
    assert r["n_batch"] == emb.where("vec_id % 2 = 1").count()


def test_calmar_components_are_coherent(spark):
    r = _q(spark, "finance_calmar_ulcer").first()
    assert r["n_days"] > 0
    assert r["max_drawdown_pct"] >= 0.0
    assert r["ulcer_index"] >= 0.0
    # Ulcer (RMS of the drawdown series) can never exceed the max drawdown
    assert r["ulcer_index"] <= r["max_drawdown_pct"] + 1e-3
    if r["calmar_ratio"] is not None and r["max_drawdown_pct"] > 0:
        assert (r["calmar_ratio"] > 0) == (r["ann_return_pct"] > 0) or (
            r["ann_return_pct"] == 0
        )


def test_zipf_slope_is_negative_on_natural_text(spark):
    r = _q(spark, "text_zipf_slope").first()
    # the fixture vocab at sf0.001 is only ~31 distinct terms; the cap
    # is 100 — the fit just uses what exists
    assert 2 <= r["n_terms"] <= 100
    # rank-frequency is monotone-decreasing by construction -> slope < 0
    assert r["zipf_slope"] < 0.0
    # intercept is ln(freq) at rank 1: must be at least the slope-implied
    # positive head mass
    assert r["zipf_intercept"] > 0.0


def test_benford_mad_class_matches_value(spark):
    r = _q(spark, "dq_benford_mad").first()
    assert r["n_values"] > 0 and r["benford_mad"] >= 0.0
    m = r["benford_mad"]
    want = (
        "close"
        if m < 0.006
        else "acceptable"
        if m < 0.012
        else "marginal"
        if m < 0.015
        else "nonconformity"
    )
    assert r["conformity"] == want


def test_elect_centroids_is_deterministic_and_dense(spark):
    """The store's quantizer election: dense 0..k-1 cells, stable under
    re-execution (the property re-election's replay contract rests on)."""
    from pyspark.sql import functions as F

    from insurance_helper_spark.operators import vector_store as VS

    vecs = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("vv"))
    )
    a = sorted(map(tuple, VS._elect_centroids(vecs, 8).collect()))
    b = sorted(map(tuple, VS._elect_centroids(vecs, 8).collect()))
    assert a == b
    assert [c for c, _ in a] == list(range(8))
