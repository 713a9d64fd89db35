"""Contract tests: bench.py and __spark_entry__.py reference only
registered queries, and every oracle has a query (a rename anywhere
breaks these instantly, before the driver run does)."""

from __future__ import annotations


def test_bench_headline_queries_are_registered():
    import bench
    from insurance_helper_spark.queries import catalog

    catalog.load_all()
    missing = [n for n in bench.HEADLINE if n not in catalog.QUERIES]
    assert not missing, missing
    # No duplicate timings, and every recorded budget belongs to a
    # headline query (a rename would silently orphan its budget).
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    budgets = {**bench.R1_WARM, **bench.R4_WARM, **bench.R5_WARM}
    orphaned = [n for n in budgets if n not in bench.HEADLINE]
    assert not orphaned, orphaned


def test_entry_contract_shapes():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)  # every oracle has a query
    assert len(qs) >= 60
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in osql.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_catalog_window_prioritizes_unverified():
    # The driver verifies the first 50 registered queries per round:
    # never-green oracle queries must sort first, then never-sampled
    # rows-only queries, then previously-checked ones stalest-first.
    from insurance_helper_spark.queries import catalog

    catalog.load_all()
    names = list(catalog.QUERIES)
    green, last_round = catalog._driver_history()

    def tier(n):
        if n in catalog.ORACLE_SQL and n not in green:
            return 0
        if n not in last_round:
            return 1
        return 2

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers)
    # Within tier 2, staleness ordering: last-sampled round ascending.
    t2_rounds = [last_round[n] for n in names if tier(n) == 2]
    assert t2_rounds == sorted(t2_rounds)
