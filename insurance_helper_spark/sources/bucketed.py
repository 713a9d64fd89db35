"""Bucketed-table support: shuffle-free co-located joins.

At 100 TB the single biggest avoidable cost is re-shuffling both fact
tables on every join. Bucketing (`bucketBy(n, key).sortBy(key)` at
write time) pre-partitions AND pre-sorts data by the join key ON DISK,
so a join of two tables bucketed the same way compiles to a
SortMergeJoin with ZERO Exchange — each task zips bucket i of A with
bucket i of B.

Spark requires bucketed data to be saved as a catalog table
(``saveAsTable``); a plain ``.save(path)`` silently drops bucket specs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted catalog table on the join key.

    ``n_buckets`` should match (or divide) the downstream join
    parallelism; both sides of a co-located join MUST use the same
    ``n_buckets`` and ``bucket_col`` semantics.
    """
    writer = (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables; with matching bucket specs
    Catalyst plans a SortMergeJoin with no shuffle on either side
    (verify via plans.audit.exchange_count == 0)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
