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
