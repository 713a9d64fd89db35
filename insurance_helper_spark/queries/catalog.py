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


def _verified_green() -> frozenset[str]:
    """Queries already fully verified in ANY prior round.

    Reads every ``CORRECTNESS_r*.json`` the driver has written at the
    repo root (two levels above this package); falls back to the
    hardcoded round-1 set if none are readable, so the ordering is
    stable even from a bare checkout.
    """
    import glob
    import json
    import os

    green: set[str] = set(_R1_GREEN)
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
            for name, v in rows.items():
                if (
                    isinstance(v, dict)
                    and v.get("rows_match")
                    and v.get("schema_match")
                    and v.get("hash_match")
                ):
                    green.add(name)
        except (OSError, ValueError):
            continue
    return frozenset(green)


def load_all() -> None:
    """Import all query modules (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imported for registration side effects.
    from insurance_helper_spark.queries import (  # noqa: F401
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
    )

    # Stable-partition the registry: queries still lacking a fully-green
    # driver verdict first (they need CORRECTNESS rows), already-verified
    # queries last. The driver checks the first 50 per round, so this
    # self-rotates the verification window every round with no manual
    # reordering.
    green = _verified_green()
    snapshot = dict(QUERIES)
    ordered = [k for k in snapshot if k not in green]
    ordered += [k for k in snapshot if k in green]
    QUERIES.clear()
    QUERIES.update({k: snapshot[k] for k in ordered})

    _LOADED = True
