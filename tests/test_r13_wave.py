"""r13 wave invariants: the hot-shingle census against a pure-Python
recompute, and the SRP plan audit's internal consistency."""

from __future__ import annotations

import re
from collections import Counter

import duckdb

from insurance_helper_spark.operators.similarity import srp_recall
from insurance_helper_spark.queries import catalog
from tests.conftest import SF_DIR

catalog.load_all()


def _q(spark, name):
    return catalog.QUERIES[name](spark, SF_DIR)


def test_hot_shingle_census_matches_python_brute_force(spark):
    """The df histogram recomputed in pure Python from the raw fixture
    text (tokenize → distinct 3-shingles per doc → df per shingle →
    histogram) must equal the staged-relation census exactly."""
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    df_per_shingle: Counter = Counter()
    for _, text in docs:
        toks = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split()
        shingles = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        df_per_shingle.update(shingles)
    hist = Counter(df_per_shingle.values())
    got = {
        r["doc_freq"]: (r["n_shingles"], r["over_cap"])
        for r in _q(spark, "dedup_hot_shingle_census").collect()
    }
    assert got == {df: (n, df > 50) for df, n in hist.items()}
    # fixture contract the staged pair table's value-identity rests on:
    # nothing over the cap
    assert not any(flag for _, flag in got.values())


def test_srp_plan_audit_consistency(spark):
    rows = {r["scale_mult"]: r for r in _q(spark, "similarity_srp_plan_audit").collect()}
    assert set(rows) == {1, 10, 100, 1000}
    base = rows[1]
    # fixture scale runs the base plan and delivers the base recall
    assert (base["n_planes"], base["n_tables"]) == (4, 16)
    assert base["recall_at_band"] == base["base_recall"]
    prev_planes = 0
    for m in (1, 10, 100, 1000):
        r = rows[m]
        assert r["n_planes"] >= prev_planes
        prev_planes = r["n_planes"]
        # recall column is the closed form at the published params
        assert (
            abs(
                r["recall_at_band"]
                - round(srp_recall(r["n_planes"], r["n_tables"], 0.4), 6)
            )
            < 1e-9
        )
        # recall held whenever the table cap is not binding
        if r["n_tables"] < 128:
            assert r["recall_at_band"] >= r["base_recall"] - 1e-9
