"""Query catalog: every implemented operator exposed as a named query.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
optional ANSI-SQL oracle string that DuckDB runs over the same parquet
tables. The driver compares row-count + schema + order-insensitive
value-hash, so:

- every computed column is aliased IDENTICALLY in Spark and SQL;
- float aggregates are rounded on both sides (sum order differs);
- timestamps are UTC on both sides (session.py pins the timezone).

Query modules register themselves via the ``@register`` decorator at
import time; ``_load_all()`` imports them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


_LOADED = False

# Queries fully green (rows + schema + hash) in round 1's CORRECTNESS run.
# The driver only verifies the first 50 registered queries per round, so
# ``load_all`` demotes these to the tail — every query still lacking a
# verdict (new, previously-unwindowed, or previously hash-failed) sorts
# into the verification window automatically.
_R1_GREEN = frozenset(
    {
        "above_brand_avg", "agg_count_distinct", "agg_cube",
        "agg_grouping_sets", "agg_percentiles", "agg_rollup",
        "agg_salted_hot_keys", "agg_stats_functions",
        "anti_join_new_customers", "array_ops_embeddings",
        "asof_latest_per_key", "date_functions_dirty_parse",
        "date_spine_activity", "explode_token_counts", "filter_predicates",
        "flagship", "full_outer_join_spend", "join_salted_skew",
        "json_extract_events", "left_join_order_stats",
        "levenshtein_name_pairs", "pivot_status_by_priority",
        "q10_returned_items", "q14_promo_revenue", "q15_top_supplier",
        "q18_large_orders", "q19_disjunctive_predicates",
        "q1_pricing_summary", "q22_idle_customers", "q3_shipping_priority",
        "q4_late_orders", "q5_local_supplier", "q6_revenue_forecast",
        "q7_volume_shipping", "q8_market_share", "q9_profit_by_nation",
        "range_join_price_bands", "semi_join_active_customers",
        "set_ops_segments", "string_functions", "supplier_diversity",
        "topk_per_group", "window_lag_lead", "window_range_frame",
        "window_rank_variants", "window_running_spend",
    }
)


def _driver_history() -> tuple[frozenset[str], dict[str, int]]:
    """(ever-fully-green queries, last round each query was sampled).

    Reads every ``CORRECTNESS_r*.json`` the driver has written at the
    repo root (two levels above this package); falls back to the
    hardcoded round-1 set if none are readable, so the ordering is
    stable even from a bare checkout.
    """
    import glob
    import json
    import os
    import re

    green: set[str] = set(_R1_GREEN)
    last_round: dict[str, int] = dict.fromkeys(_R1_GREEN, 1)
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, v in rows.items():
            if not isinstance(v, dict):
                continue
            last_round[name] = max(last_round.get(name, 0), rnd)
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"):
                green.add(name)
    return frozenset(green), last_round


def load_all() -> None:
    """Import all query modules (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imported for registration side effects.
    from insurance_helper_spark.queries import (  # noqa: F401
        actuarial_queries,
        dedup_queries,
        similarity_queries,
        text_queries,
        streaming_queries,
        scraper_ops,
        corpus_ops,
        corpus_prep_queries,
        multimodal_queries,
        analytics_ext,
        relational_tpch3,
        relational_tpch4,
        curation_queries,
        relational,
        relational_ext,
        stat_queries,
        sequence_queries,
        wave10_queries,
        wave11_queries,
        wave12_queries,
        wave14_queries,
    )

    # Stable-sort the registry so the driver's first-50 verification
    # window self-rotates every round with no manual reordering:
    #   tier 0 — oracle-backed queries with NO fully-green driver row
    #            yet (new or previously failed): they need green
    #            CORRECTNESS evidence most urgently;
    #   tier 1 — rows-only queries never sampled at all;
    #   tier 2 — everything already checked, STALEST driver row first,
    #            so old verifications re-rotate through the window as
    #            the modules they live in keep changing.
    # Ties keep registration order (stable sort).
    green, last_round = _driver_history()
    snapshot = dict(QUERIES)

    def tier(name: str) -> tuple[int, int]:
        if name in ORACLE_SQL and name not in green:
            return (0, 0)
        if name not in last_round:
            return (1, 0)
        return (2, last_round[name])

    ordered = sorted(snapshot, key=tier)
    QUERIES.clear()
    QUERIES.update({k: snapshot[k] for k in ordered})

    _LOADED = True
