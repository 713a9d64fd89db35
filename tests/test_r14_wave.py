"""r14 wave invariants: the crosslingual plan audit's internal
consistency, and value-identity of the exact branch the new cost
dispatch in crosslingual_margin_pairs_lsh runs above fixture scale."""

from __future__ import annotations

from insurance_helper_spark.operators.similarity import srp_recall
from insurance_helper_spark.queries import catalog
from tests.conftest import SF_DIR

catalog.load_all()


def _q(spark, name):
    return catalog.QUERIES[name](spark, SF_DIR)


def test_crosslingual_plan_audit_consistency(spark):
    rows = {r["scale_mult"]: r for r in _q(spark, "crosslingual_plan_audit").collect()}
    assert set(rows) == {1, 10, 100, 1000}
    base = rows[1]
    # fixture scale runs the base plan (so the LSH recall pins hold)
    assert (base["n_planes"], base["n_tables"]) == (4, 12)
    assert base["plan"] == "lsh-base"
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
                - round(srp_recall(r["n_planes"], r["n_tables"], 0.33), 6)
            )
            < 1e-9
        )
        # recall held whenever the table cap is not binding
        if r["n_tables"] < 128:
            assert r["recall_at_band"] >= r["base_recall"] - 1e-9
        # the dispatch column IS the branch crosslingual_margin_pairs_lsh
        # takes: exact only below the broadcast ceiling, and only when
        # recall-held LSH would inspect >= 1/16 of the exact grid
        if r["plan"] == "exact-gemm":
            assert r["n_vectors"] <= 1_000_000
            assert r["n_tables"] / 2 ** r["n_planes"] >= 1.0 / 16
        elif r["plan"] == "lsh":
            assert (
                r["n_vectors"] > 1_000_000
                or r["n_tables"] / 2 ** r["n_planes"] < 1.0 / 16
            )
    # the weak band makes the exact region non-empty: at 500 vectors the
    # 10x and 100x decades both dispatch to the exact bitext grid
    assert rows[10]["plan"] == "exact-gemm"
    assert rows[100]["plan"] == "exact-gemm"


def test_crosslingual_exact_branch_value_identity(spark):
    """The exact branch the dispatch runs (_exact_bitext_grid →
    _margin_best) must return byte-identical rows to the registered
    oracle-backed exact query — dispatching above fixture scale can
    then only RAISE delivered recall (to 1.0), never change values."""
    from insurance_helper_spark.queries.curation_queries import (
        _bitext_sides,
        _exact_bitext_grid,
        _margin_best,
    )

    src, tgt = _bitext_sides(spark, SF_DIR)
    branch = sorted(
        tuple(r) for r in _margin_best(_exact_bitext_grid(spark, src, tgt)).collect()
    )
    registered = sorted(
        tuple(r) for r in _q(spark, "crosslingual_margin_pairs").collect()
    )
    assert branch == registered
    assert len(branch) > 0
