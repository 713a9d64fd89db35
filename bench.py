#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec", "queries":
{name: sec}, "sf": ...}``.

Each query is executed with the noop sink (full plan runs, nothing is
collected to the driver) — measures engine time, not driver transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


HEADLINE = [
    # relational core
    "flagship",
    "q1_pricing_summary",
    "q5_local_supplier",
    "q3_shipping_priority",
    "q10_returned_items",
    "q18_large_orders",
    "window_running_spend",
    "window_lag_lead",
    "topk_per_group",
    "asof_latest_per_key",
    "agg_rollup",
    "agg_grouping_sets",
    "full_outer_join_spend",
    "set_ops_segments",
    # scraper-op / incremental surface
    "incremental_delta_core",
    "failed_download_upsert",
    "scrape_cleaning_chain",
    # LLM-pipeline surface
    "dedup_exact_keep_first",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh_rowsonly",
    "dedup_simhash_rowsonly",
    "dedup_embedding_cosine",
    "pipeline_dedup_corpus",
    "similarity_cosine_topk",
    "text_tfidf_top_terms",
    "text_stats",
    "multimodal_feature_manifest",
    # streaming shapes
    "stream_tumbling_window",
    "stream_session_windows",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from insurance_helper_spark.session import get_spark
    from insurance_helper_spark.queries import catalog

    catalog.load_all()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM warm-up (not timed): tiny action through the parquet reader.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Pass 1 (cold, recorded separately): includes per-query Catalyst
    # analysis + whole-stage-codegen compilation. Pass 2 is the steady-
    # state engine time — the TPC-H-power-run convention and the number
    # comparable across rounds.
    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    for label, store in (("cold", cold), ("warm", timings)):
        for name in HEADLINE:
            fn = catalog.QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            store[name] = round(time.perf_counter() - t0, 3)
            print(f"  [{label}] {name}: {store[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_total": round(sum(cold.values()), 3),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
