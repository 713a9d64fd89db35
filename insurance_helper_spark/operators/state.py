"""Checkpoint/state management as TABLES (C1-C3, O4).

The reference keeps one JSON file with an in-memory set of completed
URLs and list of failures (storage/state.py:20-83) — fine at 8.5k rows,
impossible at 100 TB. Here state is three parquet tables under a state
directory, every mutation an idempotent dataframe transform + atomic
swap write:

- sessions(product_type, last_completed_page, status, total_products,
  started_at, completed_at)            — C2 cursor ops
- completed_downloads(url)             — J1 membership set
- failed_downloads(url, error, retries, last_attempt) — J4 upserts

Corruption fallback (C1, ref state.py:43-45): unreadable table → empty
state, never an exception. Reset (C3, ref state.py:169-179) drops rows
or the whole directory. ``retry_failed`` (O4, ref cli.py:416-461)
re-drives failures through the download stage and reconciles.

Atomic swap: parquet has no MERGE, so each save writes to a temp subdir
and renames over the old one — the single-writer checkpoint pattern.
(On Delta/Iceberg these become MERGE INTO / DELETE WHERE; the operator
surface is identical.)
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from insurance_helper_spark import schemas
from insurance_helper_spark.operators import incremental


class StateStore:
    """Parquet-backed state tables with corruption fallback."""

    TABLES = {
        "sessions": schemas.SESSIONS_SCHEMA,
        "completed_downloads": schemas.COMPLETED_DOWNLOADS_SCHEMA,
        "failed_downloads": schemas.FAILED_DOWNLOADS_SCHEMA,
    }

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    # -- C1: load with corruption fallback ------------------------------
    def read(self, table: str) -> DataFrame:
        path = os.path.join(self.state_dir, table)
        schema = self.TABLES[table]
        try:
            df = self.spark.read.schema(schema).parquet(path)
            df.head(1)  # force schema/footer validation now
            return df
        except Exception:
            # missing or corrupted → fresh empty state (ref state.py:43-45)
            return self.spark.createDataFrame([], schema)

    # -- atomic swap write ---------------------------------------------
    def write(self, table: str, df: DataFrame) -> None:
        path = os.path.join(self.state_dir, table)
        tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = f"{path}__old_{uuid.uuid4().hex[:8]}"
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    # -- C2: session cursor ops (ref state.py:92-131) -------------------
    def start_session(self, product_type: str, resume: bool = True) -> int:
        """Returns the page to resume from (last_completed + 1)."""
        sessions = self.read("sessions")
        if not resume:
            self.reset_session(product_type)
            return 1
        row = (
            sessions.filter(F.col("product_type") == product_type)
            .select("last_completed_page")
            .head(1)
        )
        last = row[0]["last_completed_page"] if row else 0
        return (last or 0) + 1

    def update_page_progress(
        self, product_type: str, page: int, n_products: int
    ) -> None:
        """Per-page checkpoint (ref cli.py:148, state.py:108-113):
        cursor moves forward, totals accumulate, started_at sticks."""
        sessions = self.read("sessions")
        prev = sessions.filter(F.col("product_type") == product_type).head(1)
        prev_total = (prev[0]["total_products"] or 0) if prev else 0
        started_at = prev[0]["started_at"] if prev else None
        new_row = self.spark.createDataFrame(
            [(product_type, page, "running", prev_total + n_products, started_at, None)],
            schemas.SESSIONS_SCHEMA,
        )
        if started_at is None:
            new_row = new_row.withColumn("started_at", F.current_timestamp())
        self.write(
            "sessions",
            sessions.filter(F.col("product_type") != product_type).unionByName(new_row),
        )

    def complete_session(self, product_type: str) -> None:
        sessions = self.read("sessions")
        self.write(
            "sessions",
            sessions.withColumn(
                "status",
                F.when(F.col("product_type") == product_type, F.lit("completed"))
                .otherwise(F.col("status")),
            ).withColumn(
                "completed_at",
                F.when(F.col("product_type") == product_type, F.current_timestamp())
                .otherwise(F.col("completed_at")),
            ),
        )

    # -- C3: reset ------------------------------------------------------
    def reset_session(self, product_type: str) -> None:
        sessions = self.read("sessions")
        self.write(
            "sessions", sessions.filter(F.col("product_type") != product_type)
        )

    def reset_all(self) -> None:
        for t in self.TABLES:
            p = os.path.join(self.state_dir, t)
            if os.path.exists(p):
                shutil.rmtree(p, ignore_errors=True)

    # -- J1/J4 state maintenance ---------------------------------------
    def mark_completed(self, urls: DataFrame) -> None:
        merged = incremental.mark_completed(
            self.read("completed_downloads"), urls.select("url"), "url"
        )
        self.write("completed_downloads", merged)

    def mark_failed(self, failures: DataFrame) -> None:
        """failures: (url, error, last_attempt). Upsert per J4."""
        merged = incremental.upsert_failed(
            self.read("failed_downloads"), failures, key="url"
        )
        self.write("failed_downloads", merged.select(*[
            f.name for f in schemas.FAILED_DOWNLOADS_SCHEMA
        ]))

    def clear_failures(self, succeeded_urls: DataFrame) -> None:
        self.write(
            "failed_downloads",
            incremental.clear_succeeded(
                self.read("failed_downloads"), succeeded_urls, "url"
            ),
        )

    # -- A2: summary ----------------------------------------------------
    def summary(self) -> DataFrame:
        """Per-type session status + global completed/failed counts
        (ref state.py:181-195, rendered cli.py:382-413)."""
        sessions = self.read("sessions").select(
            "product_type", "status", "last_completed_page", "total_products"
        )
        counts = self.spark.createDataFrame(
            [
                ("completed_downloads", self.read("completed_downloads").count()),
                ("failed_downloads", self.read("failed_downloads").count()),
            ],
            T.StructType([
                T.StructField("counter", T.StringType()),
                T.StructField("n", T.LongType()),
            ]),
        )
        return sessions, counts


def record_download_outcomes(state: StateStore, results: DataFrame) -> DataFrame:
    """Post-download reconciliation (ref cli.py:115-143): successes join
    the completed set and clear old failures; failures upsert into
    failed_downloads. ``results`` follows DOWNLOAD_RESULT_SCHEMA.

    The result lineage may read the very state tables this function
    rewrites (retry_failed does exactly that), so the lineage is cut with
    an eager localCheckpoint before any swap — otherwise a later action on
    ``results`` would re-scan parquet files the swap already replaced.
    Returns the checkpointed relation; callers must use it, not the input.
    """
    results = results.localCheckpoint(eager=True)
    ok = results.filter(F.col("success")).select("url")
    state.mark_completed(ok)
    state.clear_failures(ok)
    failed = (
        results.filter(~F.col("success"))
        .select("url", F.coalesce("error", F.lit("unknown")).alias("error"))
        .withColumn("last_attempt", F.current_timestamp())
    )
    if failed.head(1):
        state.mark_failed(failed)
    return results


def retry_failed(
    state: StateStore,
    downloader,
    retry_dir: str = "downloads/retry",
    config=None,
) -> DataFrame:
    """O4 (ref cli.py:416-461): re-drive everything in failed_downloads
    through the download stage; dest = retry/file_{sha2(url)}{ext}.
    Success → completed + failure cleared. Returns the result relation.
    """
    from insurance_helper_spark.functions import cleaning
    from insurance_helper_spark.sources import http

    failed = state.read("failed_downloads")
    tasks = failed.select(
        "url",
        cleaning.retry_destination(F.col("url"), retry_dir).alias("destination"),
        F.lit("retry").alias("product_type"),
        F.lit(None).cast("string").alias("uin"),
    )
    results = http.download_batch(tasks, downloader=downloader, config=config)
    return record_download_outcomes(state, results)
