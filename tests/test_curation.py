"""Invariant tests for the round-4 curation/analytics batch (semantic
dedup, surprisal scoring, stratified split, LOCF gap-fill, RFM, ABC,
Markov transitions, and the final TPC-H four).

The full value-parity check lives in test_oracle_parity (every one of
these has a DuckDB oracle); these tests pin the SEMANTIC invariants a
hash can't explain — the properties a user of the op relies on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def catalog():
    from insurance_helper_spark.queries import catalog as cat

    cat.load_all()
    return cat


def test_semantic_dedup_invariants(spark, catalog):
    df = catalog.QUERIES["dedup_semantic_clusters"](spark, SF_DIR).cache()
    rows = df.collect()
    assert len(rows) > 0
    # Exactly one canonical per cluster, and canonicals are always kept.
    per_cluster = (
        df.groupBy("cluster_id")
        .agg(F.sum(F.col("is_canonical").cast("int")).alias("n_canon"))
        .collect()
    )
    assert all(r.n_canon == 1 for r in per_cluster)
    assert all(r.keep for r in rows if r.is_canonical)
    # Pruned rows are exactly the non-canonical near-dups over threshold.
    for r in rows:
        assert r.keep == (r.is_canonical or r.cos_to_canon < 0.4)
    # Canonical's cosine to itself is 1.
    assert all(abs(r.cos_to_canon - 1.0) < 1e-6 for r in rows if r.is_canonical)
    df.unpersist()


def test_semantic_dedup_covers_every_vector(spark, catalog):
    df = catalog.QUERIES["dedup_semantic_clusters"](spark, SF_DIR)
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert df.count() == n_vecs
    assert df.select("vec_id").distinct().count() == n_vecs


def test_unigram_surprisal_orders_rarity(spark, catalog):
    df = catalog.QUERIES["text_unigram_surprisal"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    # Surprisal is positive (p < 1 for every token) and max >= mean.
    assert all(r.mean_surprisal > 0 for r in rows)
    assert all(r.max_surprisal >= r.mean_surprisal for r in rows)


def test_stratified_split_deterministic_and_total(spark, catalog):
    q = catalog.QUERIES["corpus_stratified_split"]
    a = {(r.source, r.split): r.n_docs for r in q(spark, SF_DIR).collect()}
    b = {(r.source, r.split): r.n_docs for r in q(spark, SF_DIR).collect()}
    assert a == b  # no rand(): identical run-over-run
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(a.values()) == n_docs  # every doc assigned exactly once
    by_split: dict[str, int] = {}
    for (_, split), n in a.items():
        by_split[split] = by_split.get(split, 0) + n
    # 80/10/10 within hash-binomial tolerance.
    assert 0.6 * n_docs < by_split.get("train", 0) < 0.95 * n_docs


def test_locf_gapfill_accounting(spark, catalog):
    rows = catalog.QUERIES["events_locf_gapfill"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_days == r.n_observed + r.n_filled
        assert r.n_observed >= 1
        assert r.total_locf is not None


def test_rfm_quartiles_partition_customers(spark, catalog):
    rows = catalog.QUERIES["customer_rfm_segments"](spark, SF_DIR).collect()
    assert all(1 <= r.r_quartile <= 4 for r in rows)
    assert all(1 <= r.f_quartile <= 4 for r in rows)
    assert all(1 <= r.m_quartile <= 4 for r in rows)
    n_with_orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_with_orders


def test_abc_classes_ordered_by_share(spark, catalog):
    rows = {r.abc_class: r for r in catalog.QUERIES["part_abc_classification"](spark, SF_DIR).collect()}
    assert set(rows) == {"A", "B", "C"}
    total = sum(r.class_revenue for r in rows.values())
    # A holds ~80% of revenue with the fewest parts per unit revenue.
    assert rows["A"].class_revenue / total > 0.6
    assert rows["C"].class_revenue / total < 0.2


def test_markov_rows_are_distributions(spark, catalog):
    rows = catalog.QUERIES["events_markov_transitions"](spark, SF_DIR).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p_transition
    # Each row of the transition matrix sums to 1 (±rounding dust).
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 0.01, (prev, s)
    # START row exists: every user contributes exactly one entry edge.
    n_users = spark.read.parquet(f"{SF_DIR}/events.parquet").select("user_id").distinct().count()
    start_n = sum(r.n for r in rows if r.prev_type == "START")
    assert start_n == n_users


def test_tpch4_shapes(spark, catalog):
    """The four closing TPC-H queries produce non-degenerate results."""
    q2 = catalog.QUERIES["q2_min_cost_supplier"](spark, SF_DIR)
    # Every surviving row holds its part's minimum cost: per partkey all
    # unit_costs equal after the window filter.
    per_part = q2.groupBy("p_partkey").agg(F.countDistinct("unit_cost").alias("k")).collect()
    assert all(r.k == 1 for r in per_part)
    q16 = catalog.QUERIES["q16_supplier_relationship"](spark, SF_DIR)
    assert q16.filter(F.col("supplier_cnt") <= 0).count() == 0
    q20 = catalog.QUERIES["q20_promotion_suppliers"](spark, SF_DIR)
    assert q20.count() == q20.select("s_suppkey").distinct().count()
