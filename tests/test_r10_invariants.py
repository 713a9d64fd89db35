"""Round-10 structural invariants.

Headline: the clustered-corpus ANN measurement the r9 verdict asked
for. The fixture embeddings are measured-isotropic (within-label cosine
0.0005 vs cross-label 0.0006 — SURVEY §2B r9), which makes
"recall >= 0.8 at <= 35% scan" information-theoretically unavailable
THERE; the claim that the identical tiers clear that bar on clustered
corpora was asserted but unmeasured. This file measures it: a
deterministic synthetic clustered corpus (seeded label centroids +
small noise, generated in-test) run through the UNMODIFIED ivf_topk
serving path must reach recall@5 >= 0.8 against brute-force cosine
ground truth while probing cells that cover <= 35% of the corpus.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

N_DOCS = 2000
DIM = 32
N_LABELS = 16
N_QUERIES = 20
K = 5
N_CENTROIDS = 16
N_PROBE = 4
SEED = 20261015


def _clustered_corpus():
    """Deterministic clustered embeddings: 16 seeded unit centroids,
    each corpus vector = its label's centroid + N(0, 0.07) noise —
    within-label cosine ~0.85, cross-label ~0 (the opposite regime of
    the isotropic parquet fixture)."""
    rng = np.random.RandomState(SEED)
    cents = rng.normal(size=(N_LABELS, DIM))
    cents /= np.linalg.norm(cents, axis=1)[:, None]
    labels = rng.randint(0, N_LABELS, size=N_DOCS)
    vecs = cents[labels] + rng.normal(scale=0.07, size=(N_DOCS, DIM))
    return vecs.astype(np.float64), labels


@pytest.fixture(scope="module")
def clustered(spark):
    vecs, labels = _clustered_corpus()
    rows = [
        (int(i), [float(x) for x in vecs[i]], int(labels[i])) for i in range(N_DOCS)
    ]
    df = spark.createDataFrame(
        rows, schema="vec_id bigint, embedding array<float>, label int"
    ).localCheckpoint(eager=True)
    return df, vecs


def test_corpus_is_actually_clustered(clustered):
    """Guard the fixture itself: the within/cross-label cosine gap must
    be large, otherwise the recall assertion below proves nothing."""
    vecs, labels = _clustered_corpus()
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = unit @ unit.T
    same = labels[:, None] == labels[None, :]
    np.fill_diagonal(same, False)
    off = ~np.eye(N_DOCS, dtype=bool)
    within = sims[same].mean()
    cross = sims[off & ~same].mean()
    assert within > 0.8, within
    assert abs(cross) < 0.1, cross
    assert within - cross > 0.7


def test_ivf_recall_and_scan_on_clustered_corpus(spark, clustered):
    """The r8/r9 open claim, now measured: the UNMODIFIED IVF serving
    tier (k16 / nprobe4, the same operating point the frontier eval
    reports at 0.53 recall / 25% scan on the isotropic fixture) reaches
    recall@5 >= 0.8 while scanning <= 35% of a clustered corpus."""
    # float32 storage parity with the parquet fixture's array<float>
    from insurance_helper_spark.operators.similarity import ivf_centroids, ivf_topk

    df, vecs = clustered
    vecs = np.array(
        [r["embedding"] for r in df.select("vec_id", "embedding").orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    rng = np.random.RandomState(SEED + 1)
    q_ids = np.sort(rng.choice(N_DOCS, size=N_QUERIES, replace=False))
    queries = df.where(F.col("vec_id").isin([int(i) for i in q_ids])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    got = ivf_topk(
        df,
        queries,
        k=K,
        n_centroids=N_CENTROIDS,
        n_probe=N_PROBE,
        seed=42,
    ).collect()
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    # brute-force ground truth (same rounding + tie-break as the tier)
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    recalls = []
    for qid in q_ids:
        sims = np.round(unit @ unit[qid], 6)
        ids = np.arange(N_DOCS)
        mask = ids != qid
        order = np.lexsort((ids[mask], -sims[mask]))[:K]
        truth = set(ids[mask][order].tolist())
        recalls.append(len(truth & by_q.get(int(qid), set())) / K)
    recall = float(np.mean(recalls))

    # scan fraction: corpus share of the probed cells, per query
    cent = ivf_centroids(df, n_centroids=N_CENTROIDS, seed=42)
    cu = cent / np.linalg.norm(cent, axis=1)[:, None]
    cells = np.argmax(unit @ cu.T, axis=1)
    probe = np.argsort(-(unit[q_ids] @ cu.T), axis=1)[:, :N_PROBE]
    scan = float(
        np.mean([np.isin(cells, probe[j]).mean() for j in range(len(q_ids))])
    )

    assert recall >= 0.8, f"clustered-corpus recall@{K} = {recall}"
    assert scan <= 0.35, f"scan fraction = {scan}"
