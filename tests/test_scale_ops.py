"""Scale-path operators: bucketed co-located joins (zero-shuffle) and
skew salting — correctness plus the plan properties that justify them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insurance_helper_spark.operators import skew
from insurance_helper_spark.plans import audit
from insurance_helper_spark.sources import bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    bucketed.write_bucketed(orders, "b_orders", "o_orderkey", 8, str(base / "o"))
    bucketed.write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8, str(base / "l"))
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed.colocated_join(spark, rt, lt, "l_orderkey", "o_orderkey")
    assert audit.exchange_count(joined) == 0, audit.executed_plan(joined)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed.colocated_join(spark, rt, lt, "l_orderkey", "o_orderkey")
    plain = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    assert joined.count() == plain.count()


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = skew.salted_agg(
        li,
        ["l_returnflag"],
        aggs=[F.sum("l_quantity").alias("q"), F.count("*").alias("n")],
        reaggs=[F.sum("q").alias("q"), F.sum("n").alias("n")],
    )
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("q"), F.count("*").alias("n")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    salted = skew.salted_join(li, orders, "l_orderkey", salt_buckets=4)
    plain = li.join(orders, "l_orderkey")
    assert salted.count() == plain.count()
    a = sorted(map(tuple, salted.select("l_orderkey", "l_quantity", "o_totalprice").collect()))
    b = sorted(map(tuple, plain.select("l_orderkey", "l_quantity", "o_totalprice").collect()))
    assert a == b


def test_connected_components_chain_and_canonical(spark):
    from insurance_helper_spark.operators import dedup as dd

    # chain 1-2-3 plus isolated pair 10-11: two clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    comp = {r["member_id"]: r["cluster_id"] for r in dd.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame([(i, f"d{i}") for i in [1, 2, 3, 7, 10, 11]],
                                 "doc_id bigint, text string")
    kept = sorted(r["doc_id"] for r in
                  dd.keep_canonical_per_cluster(docs, dd.connected_components(pairs), "doc_id").collect())
    # cluster minima (1, 10) survive; untouched singleton 7 survives
    assert kept == [1, 7, 10]


def test_ngram_jaccard_hot_shingle_cap_bounds_candidates(spark):
    """Adversarial corpus: every doc shares one stopword shingle. Without
    the cap the self-join meets all C(n,2) pairs on that key; with
    max_doc_freq the hot shingle is dropped before sizing AND joining,
    so only the genuinely-overlapping docs pair up."""
    from insurance_helper_spark.operators import dedup as dd

    stop = "the quick brown"  # one shingle shared by ALL docs
    docs = [(i, f"{stop} unique{i} token{i} word{i} tail{i}") for i in range(40)]
    # two planted near-dups sharing real content
    docs += [(100, f"{stop} alpha beta gamma delta epsilon"),
             (101, f"{stop} alpha beta gamma delta zeta")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    uncapped = dd.ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.0)
    # every pair of the 42 docs shares the stop shingle → full blowup
    assert uncapped.count() == 42 * 41 // 2

    capped = dd.ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.0, max_doc_freq=10
    )
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped.collect()}
    # only the planted pair survives once the universal shingle is gone
    assert set(rows) == {(100, 101)}
    # jaccard over the FILTERED sets: shingles of 'alpha beta gamma delta X'
    # minus the hot prefix shingles → sizes stay consistent
    assert 0 < rows[(100, 101)] <= 1.0


def test_embedding_lsh_recall_vs_exact(spark):
    """The multi-table LSH pair set must be a subset of the exact pair
    set with high recall at the registered query's settings (seeded —
    deterministic)."""
    from insurance_helper_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs(
            emb, threshold=0.4, exact=True
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs(
            emb, threshold=0.4, exact=False, n_planes=4, n_tables=16, seed=7
        ).collect()
    }
    assert lsh <= exact  # every LSH pair is verified by true cosine
    assert exact, "fixture must contain pairs above the threshold"
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, f"recall {recall:.3f} ({len(lsh)}/{len(exact)})"


def test_embedding_lsh_planted_near_dups(spark):
    """The selective LSH regime (dedup at cosine ≥ 0.9, b=12 planes ×
    L=12 tables): planted noisy duplicates must be recovered with high
    recall while sign-bit agreement keeps random pairs out of the
    candidate set (p_random = 0.5^12 per table)."""
    import numpy as np

    from insurance_helper_spark.operators import similarity

    rng = np.random.default_rng(11)
    basemat = rng.normal(size=(400, 64))
    dup = basemat[:40] + 0.05 * rng.normal(size=(40, 64))  # cosine ≈ 0.996
    rows = [(i, v.tolist()) for i, v in enumerate(basemat)] + [
        (1000 + i, v.tolist()) for i, v in enumerate(dup)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs(
            df, threshold=0.9, exact=False, n_planes=12, n_tables=12, seed=3
        ).collect()
    }
    planted = {(i, 1000 + i) for i in range(40)}
    found = len(got & planted)
    assert found >= 34, f"recall {found}/40"
    # every reported pair is cosine-verified, so no false ≥0.9 pairs
    extra = got - planted
    assert len(extra) <= 2, extra  # random ≥0.9 collisions are near-impossible


def test_merge_partials_identity(spark):
    """merge(partial(A), partial(B)) == partial(A ∪ B) bit-exactly for
    the mergeable statistics (count/sum/min/max over longs)."""
    from insurance_helper_spark.operators.incremental import (
        aggregate_partials,
        merge_aggregate_partials,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 10_000).select(
        (F.col("id") % 37).alias("k"),
        ((F.col("id") * 7919) % 1000).alias("v"),
    )
    a = df.filter(F.col("id") < 6_000)
    b = df.filter(F.col("id") >= 6_000)
    merged = merge_aggregate_partials(
        aggregate_partials(a, ["k"], "v"),
        aggregate_partials(b, ["k"], "v"),
        ["k"],
    )
    direct = aggregate_partials(df, ["k"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
