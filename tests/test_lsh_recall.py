"""Semantic invariants for the rows-only LSH dedup paths: the
probabilistic candidate generators must actually find the pairs the
exact (oracle-backed) operators find — recall floors for MinHash-LSH,
and the DETERMINISTIC pigeonhole guarantee for SimHash banding."""

from __future__ import annotations

import os

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="fixture data absent")
def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """Every pair the exact shingle-Jaccard operator reports at 0.5
    must be recalled by banded MinHash at the registered settings:
    with 16 bands x 4 rows, P(candidate | J=0.5) = 1-(1-0.5^4)^16
    ≈ 0.65 per pair, but the fixture's true dup pairs sit well above
    the threshold, so the observed floor is much higher (seeded
    hashing → deterministic, an exact value pin would also hold)."""
    from insurance_helper_spark.operators import dedup
    from insurance_helper_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents", columns=["doc_id", "text"])
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    assert exact, "exact operator found no pairs — fixture changed?"
    cand = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_candidates(
            docs, "doc_id", "text", k=3, num_perm=64, bands=16
        ).collect()
    }
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall:.3f} ({len(exact)} exact pairs)"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="fixture data absent")
def test_simhash_banding_pigeonhole_guarantee(spark):
    """Pigeonhole: with 4 blocks of 16 bits, any pair within hamming
    distance ≤ 3 agrees exactly on ≥ 1 block, so simhash_pairs at
    max_hamming=3 must find EVERY such pair AND report its exact
    distance — a deterministic guarantee, not a recall floor.
    Ground truth is brute-force popcount over all signature pairs
    (500 fixture docs → 125k pairs, driver-side numpy)."""
    from insurance_helper_spark.operators import dedup
    from insurance_helper_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents", columns=["doc_id", "text"])
    sig_rows = dedup.simhash_signatures(docs, "doc_id", "text").collect()
    ids = np.array([r.doc_id for r in sig_rows], dtype=np.int64)
    sigs = np.array([r.sim for r in sig_rows], dtype=np.int64).astype(np.uint64)
    n = len(ids)
    xor = sigs[:, None] ^ sigs[None, :]
    ham = (
        np.unpackbits(np.ascontiguousarray(xor).view(np.uint8).reshape(n, n, 8), axis=-1)
        .sum(axis=-1)
        .astype(np.int64)
    )
    i_idx, j_idx = np.nonzero((ham <= 3) & (ids[:, None] < ids[None, :]))
    truth = {(int(ids[i]), int(ids[j])) for i, j in zip(i_idx, j_idx)}
    truth_ham = {
        (int(ids[i]), int(ids[j])): int(ham[i, j]) for i, j in zip(i_idx, j_idx)
    }

    found_rows = dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in found_rows}
    assert set(found) == truth, (
        f"missing={sorted(truth - set(found))[:5]} "
        f"extra={sorted(set(found) - truth)[:5]}"
    )
    for pair, h in found.items():
        assert h == truth_ham[pair], (pair, h, truth_ham[pair])


def test_ann_lsh_topk_recall_on_planted_neighbors(spark):
    """ann_lsh_topk targets the high-similarity regime (a query's true
    neighbor at small angle shares the full bucket with probability
    (1-θ/π)^n_planes per table). Planted noisy duplicates at cosine
    ≈ 0.996 (θ ≈ 5°, p ≈ 0.9 at 4 planes) must come back as the top-1
    for most queries; on weakly-similar corpora (fixture top-1 cos
    ≈ 0.4, p ≈ 0.17) single-table LSH is the WRONG tool and the
    operator's docstring says to raise tables — that regime is covered
    by embedding_near_dup_pairs' multi-table tests."""
    import numpy as np

    from insurance_helper_spark.operators import similarity

    rng = np.random.default_rng(5)
    base = rng.normal(size=(300, 64))
    probes = base[:20] + 0.05 * rng.normal(size=(20, 64))
    corpus = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(base)],
        "vec_id bigint, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(1000 + i, v.tolist()) for i, v in enumerate(probes)],
        "query_id bigint, embedding array<double>",
    )
    top1 = {
        r.query_id: r.neighbor_id
        for r in similarity.ann_lsh_topk(
            corpus, queries, dim=64, k=1, n_planes=4
        ).collect()
    }
    hits = sum(1 for i in range(20) if top1.get(1000 + i) == i)
    assert hits >= 16, f"planted top-1 recall {hits}/20"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="fixture data absent")
def test_ivf_topk_recall_vs_exact(spark):
    """IVF probe-masked top-k vs exact: probing every cell must equal
    the exact result EXACTLY (the mask degenerates to a full scan),
    and half the cells must still clear a recall floor on the
    unclustered fixture — the two ends of the probe dial."""
    from pyspark.sql import functions as F

    from insurance_helper_spark.operators import similarity
    from insurance_helper_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings", columns=["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, queries, k=5).collect()
    }
    full_probe = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(
            emb, queries, k=5, n_centroids=8, n_probe=8
        ).collect()
    }
    assert full_probe == exact, "full-probe IVF must equal the exact scan"
    half_probe = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(
            emb, queries, k=5, n_centroids=8, n_probe=4
        ).collect()
    }
    recall = len(half_probe & exact) / len(exact)
    assert recall >= 0.5, f"recall@5 {recall:.2f} at 4/8 probes"
