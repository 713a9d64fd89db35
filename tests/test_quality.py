"""Unit tests for the data-quality expectations runner
(sources/quality.py) on synthetic frames where every violation count is
known exactly — the catalog query + oracle covers the fixture path."""

from __future__ import annotations

from pyspark.sql import functions as F

from insurance_helper_spark.sources import quality as Q


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "ok"),
            (2, "b", 20.0, "ok"),
            (2, None, -5.0, "bad!"),
            (3, "zz", 999.0, "ok"),
        ],
        "id long, code string, amount double, status string",
    )


def test_row_local_rules_counts(spark):
    df = _df(spark)
    out = {
        r.rule: (r.n_violations, r.passed)
        for r in Q.run_expectations(
            df,
            [
                Q.not_null("code"),
                Q.in_range("amount", 0.0, 100.0),
                Q.accepted_values("status", ["ok"]),
                Q.matches("status", "^[a-z]+$"),
            ],
        ).collect()
    }
    assert out["code_not_null"] == (1, False)
    assert out["amount_range"] == (2, False)  # -5 and 999
    assert out["status_accepted"] == (1, False)
    assert out["status_matches"] == (1, False)  # "bad!" has punctuation


def test_unique_counts_extra_rows(spark):
    out = Q.run_expectations(_df(spark), [Q.unique(["id"])]).collect()[0]
    assert out.rule == "id_unique"
    assert out.n_violations == 1  # id=2 twice → one extra row
    assert out.passed is False


def test_foreign_key_orphans(spark):
    dim = spark.createDataFrame([("a",), ("b",)], "code string")
    out = Q.run_expectations(
        _df(spark), [Q.foreign_key("code", dim, "code")]
    ).collect()[0]
    # Null FK values are not orphans (SQL semantics); "zz" is.
    assert out.n_violations == 1
    assert out.passed is False


def test_all_green_suite(spark):
    df = _df(spark).filter(F.col("code").isNotNull()).filter(F.col("id") != 2)
    rows = Q.run_expectations(
        df, [Q.unique(["id"]), Q.not_null("code"), Q.in_range("amount", 0.0, 1000.0)]
    ).collect()
    assert all(r.passed for r in rows)
    assert all(r.n_violations == 0 for r in rows)


def test_single_scan_for_row_local_rules(spark):
    """All row-local rules fuse into one aggregation over one scan."""
    df = _df(spark)
    plan = Q.run_expectations(
        df, [Q.not_null("code"), Q.in_range("amount", 0.0, 100.0)]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 2


def test_empty_rules_and_unknown_kind(spark):
    import pytest as _pytest

    out = Q.run_expectations(_df(spark), [])
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["rule", "n_violations", "passed"]
    with _pytest.raises(ValueError, match="unknown rule kind"):
        Q.run_expectations(_df(spark), [Q.Rule("x", "notnull", "code")])


def test_empty_dataframe_passes_vacuously(spark):
    empty = _df(spark).filter("id < 0")
    rows = Q.run_expectations(
        empty, [Q.not_null("code"), Q.in_range("amount", 0.0, 1.0), Q.unique(["id"])]
    ).collect()
    assert all(r.n_violations == 0 and r.passed for r in rows)


def test_hostile_rule_names_are_sql_safe(spark):
    """Rule names with spaces, hyphens, quotes, and backslashes must
    survive the stack() splice verbatim (no parse error, no injection)."""
    rules = [
        Q.not_null("code", name="code has no null"),
        Q.in_range("amount", 0.0, 100.0, name="amount-in-range"),
        Q.matches("status", "^ok$", name="it's 'quoted' \\ back"),
    ]
    rows = {r.rule: r.n_violations for r in Q.run_expectations(_df(spark), rules).collect()}
    assert rows == {
        "code has no null": 1,
        "amount-in-range": 2,
        "it's 'quoted' \\ back": 1,
    }
