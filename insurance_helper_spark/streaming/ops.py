"""Structured Streaming operators (SURVEY §2B streaming group).

Streaming re-expressions of the engine's batch shapes:

- watermarked tumbling/sliding window aggregation
- session windows per key
- stateful stream dedup (dropDuplicatesWithinWatermark)
- the incremental O5 pipeline as Trigger.AvailableNow over a file
  source — the reference's monthly delta cron becomes "process
  whatever arrived since the last checkpoint, then stop"
  (ref: scripts/delta_download.py:167-211, scrape.yml:4-6).

All functions take/return streaming DataFrames and never start queries
themselves except the ``run_*`` helpers, which tests use with a
temp checkpoint + memory/parquet sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based event stream (json lines); the test harness drops
    files into ``path`` to simulate arrival."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def tumbling_counts(
    events: DataFrame,
    window: str = "6 hours",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts; late rows beyond the
    watermark are dropped (the streaming semantics the batch query
    ``stream_tumbling_window`` mirrors)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), group_col)
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), group_col, "n_events", "total_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "12 hours",
    slide: str = "6 hours",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_aggregate(
    events: DataFrame,
    gap: str = "2 hours",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows with dynamic gap — Spark's native stateful
    session operator (batch twin: ``stream_session_windows``)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame, keys: list[str], watermark: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Stateful dedup bounded by the watermark: duplicate keys arriving
    within the watermark horizon are dropped; state is GC'd past it —
    the property that makes exactly-once dedup feasible at 100 TB/day
    (an unbounded dropDuplicates would grow state forever)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    output_path: str,
    output_mode: str = "append",
) -> None:
    """O5 as Trigger.AvailableNow: drain everything new since the last
    checkpoint into parquet, then stop. Idempotent across reruns — the
    checkpoint is the 'existing CSV' of the reference's delta job."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", output_path)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drain an AvailableNow stream into a memory sink (tests)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
