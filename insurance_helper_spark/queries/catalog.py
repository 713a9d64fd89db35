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


def load_all() -> None:
    """Import all query modules (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imported for registration side effects. ORDER MATTERS: the driver
    # verifies the first 50 registered queries per round, so the modules
    # needing fresh CORRECTNESS rows go first (round 1 verified the
    # relational families; round 2 front-loads the LLM-pipeline/scraper
    # surface plus the three type-fixed queries in analytics_ext /
    # relational_tpch3). The tail (relational, relational_ext, and the
    # last entries of relational_tpch3) is all green from round 1.
    from insurance_helper_spark.queries import (  # noqa: F401
        dedup_queries,
        similarity_queries,
        text_queries,
        streaming_queries,
        scraper_ops,
        corpus_ops,
        multimodal_queries,
        analytics_ext,
        relational_tpch3,
        relational,
        relational_ext,
    )

    _LOADED = True
