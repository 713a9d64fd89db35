"""AllPairs/PPJoin prefix filtering is LOSSLESS: the prefix-indexed
set-similarity join must return exactly the relation the full shingle
join returns, at several thresholds (including ones where t·|d| floats
near an integer)."""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="fixture data absent"
)


@pytest.mark.parametrize("threshold", [0.5, 0.3, 0.25])
def test_prefix_join_equals_full_join(spark, threshold):
    from insurance_helper_spark.operators import dedup
    from insurance_helper_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents", columns=["doc_id", "text"])
    full = {
        (r.id_a, r.id_b): (r.common, r.size_a, r.size_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=threshold
        ).collect()
    }
    pfx = {
        (r.id_a, r.id_b): (r.common, r.size_a, r.size_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs_prefix(
            docs, "doc_id", "text", k=3, threshold=threshold
        ).collect()
    }
    assert full, "fixture must contain qualifying pairs"
    assert pfx == full, (
        f"missing={set(full) - set(pfx)} extra={set(pfx) - set(full)}"
    )


def test_prefix_index_is_smaller_than_full_index(spark):
    """The point of the pruner: the prefix relation the join runs on
    carries materially fewer rows than the full shingle relation."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from insurance_helper_spark.operators import dedup
    from insurance_helper_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents", columns=["doc_id", "text"])
    shd = dedup.hashed_shingle_rows(docs, "doc_id", "text", 3)
    n_full = shd.count()
    dfreq = shd.groupBy("h").agg(F.count("*").alias("dfh"))
    sized = shd.withColumn("sh_size", F.count("*").over(Window.partitionBy("doc_id")))
    ranked = sized.join(dfreq, "h").withColumn(
        "rn", F.row_number().over(Window.partitionBy("doc_id").orderBy("dfh", "h"))
    )
    t = 0.5
    n_prefix = ranked.filter(
        F.col("rn") <= F.col("sh_size") - F.ceil(t * F.col("sh_size") - 1e-9) + 1
    ).count()
    assert n_prefix < 0.6 * n_full, f"prefix {n_prefix} vs full {n_full}"
