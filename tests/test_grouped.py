"""Grouped vectorized ops (applyInPandas model fit) + approx frequent
items — the split-apply-combine and sketch corners of the surface."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from insurance_helper_spark.operators import grouped


def test_grouped_linear_fit_matches_numpy(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from insurance_helper_spark.functions import text as T

    feats = docs.select(
        "source",
        T.token_count(F.col("text")).cast("double").alias("x"),
        F.length("text").cast("double").alias("y"),
    )
    got = {
        r["source"]: r.asDict()
        for r in grouped.grouped_linear_fit(feats, "source", "x", "y").collect()
    }
    pdf = feats.toPandas()
    for src, sub in pdf.groupby("source"):
        a, b = np.polyfit(sub["x"], sub["y"], 1)
        assert got[src]["n"] == len(sub)
        assert got[src]["slope"] == pytest.approx(float(a), rel=1e-9)
        assert got[src]["intercept"] == pytest.approx(float(b), rel=1e-9)
        assert 0.0 <= got[src]["r2"] <= 1.0


def test_grouped_linear_fit_degenerate_group(spark):
    df = spark.createDataFrame(
        [("g1", 1.0, 2.0), ("g2", 3.0, 1.0), ("g2", 3.0, 5.0)],
        "k string, x double, y double",
    )
    rows = {r["k"]: r for r in grouped.grouped_linear_fit(df, "k", "x", "y").collect()}
    assert rows["g1"]["slope"] is None and rows["g1"]["n"] == 1
    # zero x-variance → NULL fit, no exception
    assert rows["g2"]["slope"] is None and rows["g2"]["n"] == 2


def test_freq_items_sketch_covers_exact_heavy_hitters(spark, sf_dir):
    # stat.freqItems: the sketch answer must be a superset of the exact
    # heavy hitters at the same support (one-sided error guarantee).
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_returnflag")
    approx = set(li.stat.freqItems(["l_returnflag"], support=0.2).head()[0])
    total = li.count()
    exact = {
        r["l_returnflag"]
        for r in li.groupBy("l_returnflag").count().collect()
        if r["count"] / total >= 0.2
    }
    assert exact <= approx


def test_stratified_sample_by_seeded(spark, sf_dir):
    # sampleBy: per-stratum Bernoulli sampling, seed-deterministic —
    # the class-rebalancing primitive for training-data curation.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "source")
    fracs = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    s1 = docs.sampleBy("source", fracs, seed=7)
    s2 = docs.sampleBy("source", fracs, seed=7)
    # determinism under a fixed seed
    assert sorted(r["doc_id"] for r in s1.collect()) == sorted(
        r["doc_id"] for r in s2.collect()
    )
    counts = {r["source"]: r["count"] for r in s1.groupBy("source").count().collect()}
    full = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    assert counts.get("src0") == full["src0"]      # keep all
    assert "src2" not in counts                    # drop all
    assert 0 < counts.get("src1", 0) < full["src1"]  # true subsample
