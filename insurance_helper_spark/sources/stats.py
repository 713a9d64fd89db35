"""Table statistics collection — the ANALYZE TABLE surface for plain
parquet directories, plus the broadcast advisor that consumes it.

Spark's cost-based optimizer only has statistics when something
collects them; on a lakehouse of bare parquet directories (this
engine's storage model, SURVEY §1) that something is this module. One
pass per table computes row count, per-column null counts, approximate
NDV (HLL++), and min/max for orderable columns — the inputs both AQE
and a human need to answer "can this side broadcast?", "is this key
skewed?", "is this filter selective?".

Scale notes: everything is ONE aggregation job per table (all columns'
aggregates fused into a single pass — no per-column scans); NDV uses
approx_count_distinct so no exact-distinct shuffle; results are tiny
(one row per column) and are meant to be persisted next to the table
and refreshed on ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Types whose min/max are meaningful and string-encodable.
_ORDERABLE = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType,
    T.DoubleType, T.DecimalType, T.DateType, T.TimestampType,
    T.TimestampNTZType, T.StringType,
)


def collect_column_stats(df: DataFrame, approx_rsd: float = 0.05) -> DataFrame:
    """Per-column statistics of a relation in ONE aggregation pass.

    Returns one row per column: (column, n_rows, n_nulls, approx_ndv,
    min_value, max_value) — min/max as strings (NULL for unorderable
    types like arrays/binary).
    """
    n_rows = F.count(F.lit(1)).alias("__n")
    aggs = [n_rows]
    for field in df.schema.fields:
        c = field.name
        aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"__nulls_{c}"))
        aggs.append(F.approx_count_distinct(c, approx_rsd).alias(f"__ndv_{c}"))
        if isinstance(field.dataType, _ORDERABLE):
            aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    # pivot the single wide row into one row per column, still lazily
    rows = []
    for field in df.schema.fields:
        c = field.name
        has_mm = isinstance(field.dataType, _ORDERABLE)
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__ndv_{c}").alias("approx_ndv"),
                (F.col(f"__min_{c}") if has_mm else F.lit(None).cast("string")).alias("min_value"),
                (F.col(f"__max_{c}") if has_mm else F.lit(None).cast("string")).alias("max_value"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


def analyze_table(
    spark: SparkSession, sf_dir: str, name: str, stats_dir: str | None = None
) -> DataFrame:
    """ANALYZE one fixture table; optionally persist to
    ``{stats_dir}/{name}`` (overwrite — stats are a refreshable cache).
    Adds the table name and on-disk bytes (from the file listing, no
    data scan)."""
    from insurance_helper_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, name)
    stats = collect_column_stats(df).withColumn("table", F.lit(name))
    stats = stats.withColumn("size_bytes", F.lit(_dir_bytes(f"{sf_dir}/{name}.parquet")))
    if stats_dir:
        stats.write.mode("overwrite").parquet(f"{stats_dir}/{name}")
        stats = spark.read.parquet(f"{stats_dir}/{name}")
    return stats


def _dir_bytes(path: str) -> int:
    import os

    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def broadcast_advice(
    stats: DataFrame, threshold_bytes: int = 32 * 1024 * 1024
) -> DataFrame:
    """The decision AQE makes at runtime, made visible at plan time:
    which tables fit under the broadcast threshold, and the estimated
    in-memory size (on-disk bytes × a conservative 3× decompression
    factor — parquet→UnsafeRow expansion).

    Returns (table, n_rows, size_bytes, est_mem_bytes, broadcastable).
    """
    per_table = (
        stats.groupBy("table")
        .agg(F.max("n_rows").alias("n_rows"), F.max("size_bytes").alias("size_bytes"))
        .withColumn("est_mem_bytes", F.col("size_bytes") * 3)
        .withColumn("broadcastable", F.col("est_mem_bytes") <= threshold_bytes)
    )
    return per_table.orderBy("table")


def skew_report(df: DataFrame, key_cols: list[str], top_n: int = 10) -> DataFrame:
    """Heavy-hitter report for a prospective shuffle key: the top-N key
    groups by row count plus each group's share of the relation —
    the number that says "salt this join" before the job runs.
    One groupBy + a tiny top-N; at 100 TB run it on a sample or let the
    map-side combine absorb the count."""
    total = df.count()
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.desc("n_rows"), *key_cols)
        .limit(top_n)
    )
