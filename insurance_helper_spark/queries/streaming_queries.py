"""Streaming-operator queries over the ``events`` fixture.

The driver's oracle is batch DuckDB SQL, so these register the
batch-equivalent computations (Spark's window/session_window functions
produce identical results in batch mode). The true Structured Streaming
versions — readStream, watermarks, dropDuplicatesWithinWatermark,
AvailableNow — live in ``insurance_helper_spark/streaming/`` and are
exercised by tests/test_streaming.py with a rate-limited file source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insurance_helper_spark.queries.catalog import register
from insurance_helper_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Tumbling window: 6-hour buckets of event counts + value sums.
# Scale: windowed agg = one shuffle on (window, event_type) with map-side
# partials; in streaming mode the same expression runs incrementally
# with a watermark.
# ---------------------------------------------------------------------------

TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


@register("stream_tumbling_window", TUMBLING_ORACLE)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["ts", "event_type", "value"])
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Sliding window: 12-hour windows sliding every 6 hours — each event
# belongs to exactly 2 windows; the oracle unions the two bucket offsets.
# ---------------------------------------------------------------------------

SLIDING_ORACLE = """
WITH starts AS (
  SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '6 hours', ts) - INTERVAL '6 hours', value FROM events
)
SELECT window_start, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM starts
GROUP BY window_start
ORDER BY window_start
"""


@register("stream_sliding_window", SLIDING_ORACLE)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["ts", "value"])
    return (
        ev.groupBy(F.window("ts", "12 hours", "6 hours").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# Session windows per user (gap 2 hours). Spark's session_window end =
# last event + gap; the oracle reproduces that with lag-based gap
# detection and a running session counter.
# ---------------------------------------------------------------------------

SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '2 hours'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '2 hours' AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


@register("stream_session_windows", SESSION_ORACLE)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "ts", "value"])
    return (
        ev.groupBy(F.session_window("ts", "2 hours").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# Stateful dedup (dropDuplicates on event_id): batch equivalent of
# streaming dropDuplicatesWithinWatermark.
# ---------------------------------------------------------------------------

DEDUP_STREAM_ORACLE = """
WITH doubled AS (
  SELECT event_id, event_type FROM events
  UNION ALL
  SELECT event_id, event_type FROM events WHERE event_id % 10 = 0
)
SELECT event_type, count(*) AS n_after_dedup
FROM (SELECT DISTINCT event_id, event_type FROM doubled)
GROUP BY event_type
ORDER BY event_type
"""


@register("stream_dedup_events", DEDUP_STREAM_ORACLE)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Injects 10% duplicate events then dedups on event_id — the batch
    shape of streaming dropDuplicatesWithinWatermark (SURVEY §2B)."""
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "event_type"])
    doubled = ev.unionByName(ev.filter(F.col("event_id") % 10 == 0))
    return (
        doubled.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_after_dedup"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Batch twin of the custom applyInPandasWithState operator
# (streaming/ops.py::user_running_state): the per-user summary the
# stateful accumulator emits at idle-timeout equals this full-history
# aggregate when every user has gone idle (end of stream).
# ---------------------------------------------------------------------------

USER_STATE_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       min(ts) AS first_seen,
       max(ts) AS last_seen
FROM events
WHERE user_id <= 50
GROUP BY user_id
ORDER BY user_id
"""


@register("stream_user_state", USER_STATE_ORACLE)
def stream_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "ts", "value"]).filter(
        F.col("user_id") <= 50
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        .orderBy("user_id")
    )
