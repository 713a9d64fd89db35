"""Property tests for the sequence/CDC operators: the interval-merge
window logic against a brute-force Python union on random inputs, and
the snapshot-diff roundtrip (applying the diff to OLD reconstructs NEW
exactly) on the fixture."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

SF_DIR = "/root/testdata/sf0.001"


@st.composite
def interval_sets(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    base = dt.date(2024, 1, 1)
    out = []
    for _ in range(n):
        start = draw(st.integers(min_value=0, max_value=60))
        out.append((base + dt.timedelta(days=start),
                    base + dt.timedelta(days=start + 1)))
    return out


def _brute_union(intervals):
    """Python ground truth: merge [s, e) day spans, return
    (n_islands, covered_days)."""
    islands = []
    for s, e in sorted(intervals):
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
        else:
            islands.append([s, e])
    return len(islands), sum((e - s).days for s, e in islands)


@given(interval_sets())
@settings(max_examples=15, deadline=None)
def test_interval_merge_matches_brute_force(spark, ivs):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, s, e) for s, e in sorted(set(ivs))], "suppkey long, s date, e date"
    )
    w_prev = (
        Window.partitionBy("suppkey").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("suppkey").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = (
        df.withColumn(
            "new_island", F.when(F.col("s") > F.max("e").over(w_prev), 1).otherwise(0)
        )
        .withColumn("island_id", F.sum("new_island").over(w_run))
        .groupBy("suppkey", "island_id")
        .agg(F.datediff(F.max("e"), F.min("s")).alias("covered"))
    )
    rows = islands.collect()
    exp_islands, exp_covered = _brute_union(set(ivs))
    assert len(rows) == exp_islands
    assert sum(r.covered for r in rows) == exp_covered


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="fixture data absent")
def test_snapshot_diff_roundtrip_reconstructs_new(spark):
    """CDC soundness: OLD minus removed, plus added, with changed
    values applied, must equal NEW row-for-row."""
    from pyspark.sql import functions as F

    from insurance_helper_spark.queries.sequence_queries import orders_snapshot_diff
    from insurance_helper_spark.sources.tables import load_table

    diff = {r.o_orderkey: r for r in orders_snapshot_diff(spark, SF_DIR).collect()}
    orders = load_table(spark, SF_DIR, "orders", columns=["o_orderkey", "o_totalprice"])
    old = {
        r.o_orderkey: round(r.o_totalprice, 2)
        for r in orders.filter(F.col("o_orderkey") % 89 != 0).collect()
    }
    new = {
        r.o_orderkey: round(
            r.o_totalprice + 10 if r.o_orderkey % 13 == 0 else r.o_totalprice, 2
        )
        for r in orders.filter(F.col("o_orderkey") % 97 != 0).collect()
    }
    rebuilt = dict(old)
    for k, d in diff.items():
        if d.change_type == "removed":
            rebuilt.pop(k)
        elif d.change_type in ("added", "changed"):
            rebuilt[k] = d.new_price
    assert rebuilt == new
    # And the diff is minimal: untouched keys never appear in it.
    untouched = set(old) & set(new) - set(diff)
    assert all(abs(old[k] - new[k]) < 1e-9 for k in untouched)
