"""Focused pin for functions/ranks.cum_before_multi (r14 entry 19):
the multi-column two-phase bucketed exclusive prefix must equal the
naive unpartitioned-window form on every column, including negative
values, bucket boundaries, and a grouped variant."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from insurance_helper_spark.functions.ranks import cum_before, cum_before_multi


def _naive(df, part_cols, val_col, cnt_cols):
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(val_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df
    for c in cnt_cols:
        out = out.withColumn(
            f"{c}_naive", F.coalesce(F.sum(c).over(w), F.lit(0))
        )
    return out


def _rows(df, key_cols, cols):
    return {
        tuple(r[k] for k in key_cols): tuple(r[c] for c in cols)
        for r in df.collect()
    }


def test_multi_matches_naive_window(spark):
    rng = random.Random(11)
    # values straddle bucket boundaries (div 100), include negatives
    # and heavy ties
    data = [
        (rng.choice([-250, -100, -1, 0, 1, 99, 100, 101, 250, 10_000]),
         rng.randint(0, 5), rng.randint(0, 3))
        for _ in range(400)
    ]
    df = (
        spark.createDataFrame(data, "v long, a long, b long")
        .groupBy("v")
        .agg(F.sum("a").alias("a"), F.sum("b").alias("b"))
    )
    got = cum_before_multi(df, [], "v", ["a", "b"], 100)
    want = _naive(df, [], "v", ["a", "b"])
    assert _rows(got, ["v"], ["a_before", "b_before"]) == _rows(
        want, ["v"], ["a_naive", "b_naive"]
    )


def test_multi_matches_naive_grouped(spark):
    rng = random.Random(13)
    data = [
        (rng.choice(["g1", "g2", "g3"]), rng.randint(-500, 500), rng.randint(1, 4))
        for _ in range(300)
    ]
    df = (
        spark.createDataFrame(data, "g string, v long, c long")
        .groupBy("g", "v")
        .agg(F.sum("c").alias("c"))
    )
    got = cum_before_multi(df, ["g"], "v", ["c"], 100)
    want = _naive(df, ["g"], "v", ["c"])
    assert _rows(got, ["g", "v"], ["c_before"]) == _rows(
        want, ["g", "v"], ["c_naive"]
    )


def test_multi_single_column_agrees_with_cum_before(spark):
    df = (
        spark.createDataFrame([(v, 1) for v in range(0, 1000, 7)], "v long, c long")
        .groupBy("v")
        .agg(F.sum("c").alias("c"))
    )
    a = _rows(cum_before_multi(df, [], "v", ["c"], 50), ["v"], ["c_before"])
    b = _rows(cum_before(df, [], "v", "c", 50), ["v"], ["cum_before"])
    assert a == b
