"""End-to-end golden invariants for the curation funnel at the BENCH
scale factor (sf0.1), not just the sf0.01 oracle scale: the funnel
report's per-stage counts must be internally monotone AND consistent
with the per-stage operators run standalone (VERDICT r4 item 7)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="sf0.1 fixture absent")
def test_funnel_report_monotone_and_consistent_at_bench_sf(spark):
    from insurance_helper_spark.operators import corpus, dedup as D
    from insurance_helper_spark.queries.corpus_prep_queries import (
        corpus_funnel_report,
    )
    from insurance_helper_spark.functions import text as T
    from insurance_helper_spark.sources.tables import load_table

    report = corpus_funnel_report(spark, SF_DIR).collect()
    assert report, "empty funnel report"

    # 1. Per-source monotonicity: raw >= quality >= exact-unique >=
    #    near-unique, all non-negative.
    for r in report:
        assert r.n_raw >= r.n_quality >= r.n_unique >= r.n_near_unique >= 0, r

    # 2. Totals consistent with the standalone operators composed the
    #    same way (the funnel must not drift from the operators it
    #    claims to report on).
    docs = load_table(spark, SF_DIR, "documents", columns=["doc_id", "source", "text"])
    n_raw = docs.count()
    staged = docs.select(
        "doc_id", "source", "text", corpus.tokens_col(F.col("text")).alias("toks")
    )
    q = staged.filter(
        (F.size("toks") >= 30)
        & (T.mean_word_length_of(F.col("toks")) >= 3.0)
        & (T.mean_word_length_of(F.col("toks")) <= 10.0)
    )
    n_quality = q.count()
    u = D.dedup_exact(
        q.withColumn("fp", F.sha2(F.array_join("toks", " "), 256)),
        ["fp"],
        [F.col("doc_id")],
    ).select("doc_id", "source", "text")
    n_unique = u.count()
    pairs = D.ngram_jaccard_pairs(u, "doc_id", "text", k=3, threshold=0.5)
    n_losers = pairs.select("id_b").distinct().count()

    totals = {
        "n_raw": sum(r.n_raw for r in report),
        "n_quality": sum(r.n_quality for r in report),
        "n_unique": sum(r.n_unique for r in report),
        "n_near_unique": sum(r.n_near_unique for r in report),
    }
    assert totals["n_raw"] == n_raw
    assert totals["n_quality"] == n_quality
    assert totals["n_unique"] == n_unique
    assert totals["n_near_unique"] == n_unique - n_losers
    # The funnel actually removes something at bench scale (guards
    # against a silently-pass-through stage).
    assert totals["n_quality"] < totals["n_raw"]
    assert totals["n_near_unique"] < totals["n_unique"]
