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


# ---------------------------------------------------------------------------
# Structural invariants for the r10 query wave (cross-consistency the
# oracle hash can't see: algebraic identities between related queries).
# ---------------------------------------------------------------------------

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    import __spark_entry__ as e

    return e.queries()[name](spark, SF)


def test_benktander_is_convex_blend_of_cl_and_bf(spark):
    rows = _q(spark, "actuarial_benktander").collect()
    assert rows
    for r in rows:
        lo = min(r["cl_ultimate"], r["bf_ultimate"])
        hi = max(r["cl_ultimate"], r["bf_ultimate"])
        assert lo - 0.02 <= r["gb_ultimate"] <= hi + 0.02, r
        assert 0.0 <= r["credibility_z"] <= 1.0 + 1e-9
        assert abs((r["gb_ultimate"] - r["latest_cum"]) - r["gb_reserve"]) < 0.03


def test_cape_cod_elr_constant_and_ultimate_dominates_latest(spark):
    rows = _q(spark, "actuarial_cape_cod").collect()
    assert rows
    elrs = {r["elr_per_customer"] for r in rows}
    assert len(elrs) == 1 and min(elrs) > 0
    for r in rows:
        assert r["cc_reserve"] >= -0.01
        assert r["cc_ultimate"] >= r["latest_cum"] - 0.01


def test_cliff_delta_is_two_auc_minus_one(spark):
    r = _q(spark, "stat_cliff_delta").collect()[0]
    assert abs(r["cliff_delta"] - (2 * r["p_superiority"] - 1)) < 2e-6
    assert -1.0 <= r["cliff_delta"] <= 1.0
    assert r["magnitude"] in {"negligible", "small", "medium", "large"}


def test_max_drawdown_bounds(spark):
    rows = _q(spark, "finance_max_drawdown").collect()
    assert rows
    dds = [r["drawdown"] for r in rows]
    assert dds == sorted(dds, reverse=True)
    for r in rows:
        assert 0.0 <= r["drawdown"] < 1.0
        assert r["peak_revenue"] >= r["revenue"] - 0.01


def test_rsi_rows_match_their_signal(spark):
    rows = _q(spark, "finance_rsi_cutler").collect()
    summary = [r for r in rows if r["kind"] == "summary"]
    signals = [r for r in rows if r["kind"] == "signal"]
    # exactly one always-present summary row (the non-vacuous driver
    # hash at every SF — VERDICT r10), and it reconciles the census
    assert len(summary) == 1
    s = summary[0]
    assert s["n_days"] >= 0
    assert s["n_overbought"] + s["n_oversold"] == len(signals)
    if s["n_days"] > 0:
        assert s["min_rsi"] <= s["max_rsi"]
    for r in signals:
        if r["signal"] == "overbought":
            assert r["rsi"] >= 70.0 - 1e-4
        else:
            assert r["rsi"] <= 30.0 + 1e-4


def test_sortino_sign_matches_mean_return(spark):
    r = _q(spark, "finance_sortino_ratio").collect()[0]
    assert r["downside_dev"] >= 0.0
    if r["sortino"] is not None and r["downside_dev"] > 0:
        assert (r["sortino"] > 0) == (r["mean_return"] > 0) or r["mean_return"] == 0


def test_chow_split_never_beats_pooled(spark):
    r = _q(spark, "stat_chow_test").collect()[0]
    # adding a free breakpoint can only reduce the residual sum
    assert r["ssr_split"] <= r["ssr_pooled"] + 0.01
    assert r["chow_f"] >= -1e-9


def test_quade_dfs(spark):
    r = _q(spark, "stat_quade_test").collect()[0]
    assert r["df1"] == r["k_treatments"] - 1
    assert r["df2"] == (r["n_blocks"] - 1) * (r["k_treatments"] - 1)
    assert r["quade_t3"] >= 0.0


def test_ansari_bradley_statistic_in_range(spark):
    r = _q(spark, "stat_ansari_bradley").collect()[0]
    n = r["n_h1"] + r["n_h2"]
    # sum of group-1 scores is bounded by n1 * max-score
    assert 0 < r["ab_statistic"] <= r["n_h1"] * ((n + 1) // 2)
    assert r["expected_ab"] > 0


def test_mantel_haenszel_or_positive(spark):
    r = _q(spark, "stat_mantel_haenszel").collect()[0]
    assert r["or_mh"] > 0
    assert r["cmh_chi2"] >= 0
    assert r["reject_5pct"] == (r["cmh_chi2"] > 3.841)


def test_burrows_delta_pair_count_and_nonneg(spark):
    rows = _q(spark, "text_burrows_delta").collect()
    # 20 sources -> C(20,2) unordered pairs
    assert len(rows) == 190
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert r["burrows_delta"] >= 0.0


def test_no_int64_overflow_at_sf01_ansi(spark):
    """r10 headroom audit regression guard. A full ANSI-on sweep of the
    catalog at sf0.1 found five queries whose BIGINT second moments /
    cross-products silently wrapped in ANSI-off sessions (and errored
    in ANSI-on): cent squares summed past int64 at ~150k rows. The
    fixes rescale to kilo-dollar second moments / DOUBLE solve
    products. Pin the five at sf0.1 under ANSI (the conftest session
    default) — they must execute, not wrap or throw."""
    import __spark_entry__ as e

    qs = e.queries()
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")  # runtime conf
    try:
        for name in [
            "actuarial_freq_severity",
            "stat_bartlett_test",
            "stat_effect_sizes_urgency",
            "ml_kfold_cv_rmse",
            "ml_learning_curve",
        ]:
            rows = qs[name](spark, "/root/testdata/sf0.1").collect()
            assert rows, name
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_brunner_munzel_matches_numpy_brute_force(spark):
    """Independent verification of the BM closed form: a from-scratch
    numpy implementation of Brunner & Munzel (2000) — full midranks via
    scipy-style average ranking, no shared code with the query — must
    match the query's statistic, p_hat, and Welch df on the sf0.001
    daily relation."""
    import duckdb

    r = _q(spark, "stat_brunner_munzel").collect()[0]

    con = duckdb.connect()
    rows = con.execute(
        "SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),"
        " month(CAST(o_orderdate AS DATE)) <= 6"
        f" FROM '{SF}/orders.parquet'"
        " GROUP BY CAST(o_orderdate AS DATE)"
    ).fetchall()
    x = np.array([v for v, h1 in rows if h1], dtype=np.float64)   # group 1
    y = np.array([v for v, h1 in rows if not h1], dtype=np.float64)

    def midranks(a):
        order = np.argsort(a, kind="mergesort")
        ranks = np.empty(len(a), dtype=np.float64)
        sa = a[order]
        i = 0
        while i < len(sa):
            j = i
            while j + 1 < len(sa) and sa[j + 1] == sa[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    nx, ny = len(x), len(y)
    comb = midranks(np.concatenate([x, y]))
    rankcx, rankcy = comb[:nx], comb[nx:]
    rankx, ranky = midranks(x), midranks(y)
    rankcx_mean, rankcy_mean = rankcx.mean(), rankcy.mean()
    sx = ((rankcx - rankx - rankcx_mean + (nx + 1) / 2) ** 2).sum() / (nx - 1)
    sy = ((rankcy - ranky - rankcy_mean + (ny + 1) / 2) ** 2).sum() / (ny - 1)
    w = nx * ny * (rankcy_mean - rankcx_mean) / (nx + ny) / np.sqrt(nx * sx + ny * sy)
    df = (nx * sx + ny * sy) ** 2 / (
        (nx * sx) ** 2 / (nx - 1) + (ny * sy) ** 2 / (ny - 1)
    )
    p_hat = (rankcy_mean - (ny + 1) / 2) / nx

    assert r["n_h1"] == nx and r["n_h2"] == ny
    assert abs(r["bm_statistic"] - w) < 5e-4, (r["bm_statistic"], w)
    assert abs(r["welch_df"] - df) < 5e-2, (r["welch_df"], df)
    assert abs(r["p_hat"] - p_hat) < 5e-6, (r["p_hat"], p_hat)
