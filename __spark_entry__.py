"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Thin shim over ``insurance_helper_spark.queries.catalog``; see
SURVEY.md §2 for the operator inventory each entry covers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Scan → filter → join (broadcast dim) → agg → window rank → sort
    (SURVEY §7 M0).
    """
    from insurance_helper_spark.queries import catalog

    catalog.load_all()
    return catalog.QUERIES["flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from insurance_helper_spark.queries import catalog

    catalog.load_all()
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omissions → rows-only check)."""
    from insurance_helper_spark.queries import catalog

    catalog.load_all()
    return dict(catalog.ORACLE_SQL)
