"""Session-scoped memoized checkpoints shared across query families.

Several query families derive from one small intermediate relation
that is expensive to build but cheap to hold (the co-purchase edge
list for the nine graph queries, the cumulative development triangle
for the six reserving queries). ``memo_checkpoint`` builds the
relation ONCE per (applicationId, key), eagerly localCheckpoints it,
and returns the cached DataFrame on every later call in the same
session — the in-session analogue of publishing the relation as a
bucketed table at warehouse scale.

Keyed by applicationId so a stopped-and-restarted session can never
see stale checkpoint blocks. ``KEEP_RDD_IDS`` records the checkpoint
RDD ids PER applicationId: localCheckpoint TRUNCATES lineage, so any
external block sweeper (bench.py's between-query ``_release_blocks``,
tools/ansi_sweep.py) must skip exactly these ids or every later
consumer breaks unrecoverably. The per-app keying matters because RDD
ids restart from 0 in a new SparkContext within the same process —
a flat global set would make sweepers silently skip unrelated blocks
after a session restart (ADVICE r10). Sweepers call ``keep_ids(spark)``
to get the CURRENT app's set.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict = {}
KEEP_RDD_IDS: dict[str, set] = {}


def keep_ids(spark: SparkSession) -> set:
    """The checkpoint RDD ids a block sweeper must NOT unpersist, for
    the session's current application only."""
    return KEEP_RDD_IDS.get(spark.sparkContext.applicationId, set())


def _persistent_rdd_ids(spark: SparkSession) -> set:
    return {r.id() for r in spark.sparkContext._jsc.getPersistentRDDs().values()}


def memo_checkpoint(
    spark: SparkSession, key: tuple, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the memoized eagerly-checkpointed relation for ``key``,
    building it with ``build()`` on first use in this session."""
    app_id = spark.sparkContext.applicationId
    full_key = (app_id,) + tuple(key)
    cached = _CACHE.get(full_key)
    if cached is not None:
        return cached
    before = _persistent_rdd_ids(spark)
    df = build().localCheckpoint(eager=True)
    KEEP_RDD_IDS.setdefault(app_id, set()).update(
        _persistent_rdd_ids(spark) - before
    )
    _CACHE[full_key] = df
    return df
