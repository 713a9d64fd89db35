"""Unit tests for the SCD Type-2 merge operator (operators/scd.py) on
synthetic frames with every path exercised: pass-through history,
no-op update, change (close + new version), and brand-new key insert.
The catalog query (scd2_customer_versions) value-checks the fixture
path against DuckDB."""

from __future__ import annotations

import datetime

from insurance_helper_spark.operators.scd import scd2_merge

DIM_SCHEMA = "k long, attr string, valid_from date, valid_to date, is_current boolean"
UPD_SCHEMA = "k long, attr string, effective_date date"

D = datetime.date


def _dim(spark):
    return spark.createDataFrame(
        [
            # k=1: history row + current row (attr changed once already)
            (1, "old", D(2020, 1, 1), D(2021, 1, 1), False),
            (1, "blue", D(2021, 1, 1), None, True),
            # k=2: single current row
            (2, "red", D(2020, 6, 1), None, True),
            # k=3: single current row, will receive a no-op update
            (3, "green", D(2020, 1, 1), None, True),
        ],
        DIM_SCHEMA,
    )


def _updates(spark):
    return spark.createDataFrame(
        [
            (1, "violet", D(2024, 3, 1)),   # change
            (3, "green", D(2024, 3, 1)),    # no-op (same tracked value)
            (9, "new", D(2024, 3, 1)),      # insert (unseen key)
        ],
        UPD_SCHEMA,
    )


def test_scd2_all_paths(spark):
    out = scd2_merge(_dim(spark), _updates(spark), key="k", tracked=["attr"])
    rows = sorted(out.collect(), key=lambda r: (r.k, r.valid_from))

    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)

    # k=1: history untouched, old current closed at effective date, new version open.
    k1 = by_key[1]
    assert len(k1) == 3
    assert (k1[0].attr, k1[0].is_current, k1[0].valid_to) == ("old", False, D(2021, 1, 1))
    assert (k1[1].attr, k1[1].is_current, k1[1].valid_to) == ("blue", False, D(2024, 3, 1))
    assert (k1[2].attr, k1[2].is_current, k1[2].valid_to) == ("violet", True, None)
    assert k1[2].valid_from == D(2024, 3, 1)

    # k=2: no update → passes through unchanged.
    assert [(r.attr, r.is_current) for r in by_key[2]] == [("red", True)]

    # k=3: no-op update → NO new version.
    assert [(r.attr, r.is_current, r.valid_to) for r in by_key[3]] == [("green", True, None)]

    # k=9: fresh insert, current from its effective date.
    k9 = by_key[9]
    assert [(r.attr, r.is_current, r.valid_from, r.valid_to) for r in k9] == [
        ("new", True, D(2024, 3, 1), None)
    ]


def test_scd2_exactly_one_current_per_key(spark):
    out = scd2_merge(_dim(spark), _updates(spark), key="k", tracked=["attr"])
    per_key = (
        out.filter("is_current").groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in per_key)
    # And current rows never carry a valid_to.
    assert out.filter("is_current AND valid_to IS NOT NULL").count() == 0


def test_scd2_idempotent_on_reapply(spark):
    """Re-applying the same batch changes nothing (all updates no-op)."""
    once = scd2_merge(_dim(spark), _updates(spark), key="k", tracked=["attr"])
    twice = scd2_merge(once, _updates(spark), key="k", tracked=["attr"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_scd2_untracked_columns_carry_over(spark):
    """A dim with untracked attributes (the normal Kimball shape):
    they ride along unchanged into new versions; inserts get NULLs."""
    dim = spark.createDataFrame(
        [
            (1, "blue", "acme corp", D(2021, 1, 1), None, True),
            (2, "red", "globex", D(2020, 6, 1), None, True),
        ],
        "k long, attr string, company string, valid_from date, valid_to date, is_current boolean",
    )
    upd = spark.createDataFrame(
        [(1, "violet", D(2024, 3, 1)), (9, "new", D(2024, 3, 1))], UPD_SCHEMA
    )
    out = scd2_merge(dim, upd, key="k", tracked=["attr"])
    rows = {(r.k, r.is_current): r for r in out.collect()}
    # Changed key keeps its untracked company on BOTH the closed row
    # and the new version.
    assert rows[(1, False)].company == "acme corp"
    assert rows[(1, True)].company == "acme corp"
    assert rows[(1, True)].attr == "violet"
    # Untouched key unchanged; fresh insert has NULL company.
    assert rows[(2, True)].company == "globex"
    assert rows[(9, True)].company is None
