"""Slowly-changing-dimension Type 2 merge: temporal versioning of a
dimension table under a batch of updates.

``scd2_merge(dim, updates, ...)`` implements the warehouse MERGE
pattern (Kimball SCD2; Delta Lake's merge-into-with-versioning recipe)
over plain DataFrames:

- rows whose key is absent from the update batch pass through;
- a CURRENT row whose tracked attributes CHANGED is closed
  (``valid_to`` = update effective date, ``is_current`` = false) and a
  new current version is appended;
- an update identical to the current tracked values is a no-op (no
  spurious versions);
- an update for an unseen key inserts a brand-new current row;
- already-closed history rows always pass through untouched.

The reference's failed-download upsert (J4, SURVEY.md §2A) is SCD1 —
overwrite in place; this completes the temporal variant its CSV lake
cannot express.

Scale: one shuffle each side on the business key (the join), then pure
row-local branching — no windows, no iteration. History never rewrites
more than the touched keys' current rows; at 100 TB pair it with a
partition-on-key layout so the MERGE touches only matching files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_col: str = "effective_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Apply one update batch to an SCD2 dimension; returns the new
    dimension relation (same schema as ``dim``).

    ``updates`` carries ``key``, every ``tracked`` column, and
    ``effective_col``; at most one update per key per batch (enforce
    upstream with a window argmax — see the catalog query)."""
    upd_cols = [key, *tracked, effective_col]
    upd = updates.select(*upd_cols)
    # "Changed" = any tracked attribute differs (null-safe).
    pred = None
    for t in tracked:
        term = ~F.col(t).eqNullSafe(F.col(f"__u_{t}"))
        pred = term if pred is None else (pred | term)

    u_renamed = upd.select(
        F.col(key),
        *[F.col(t).alias(f"__u_{t}") for t in tracked],
        F.col(effective_col).alias("__u_eff"),
    )

    current = dim.filter(F.col(is_current))
    history = dim.filter(~F.col(is_current))

    joined = current.join(u_renamed, key, "left")
    untouched_current = joined.filter(F.col("__u_eff").isNull() | ~pred).select(dim.columns)
    closed = (
        joined.filter(F.col("__u_eff").isNotNull() & pred)
        .withColumn(valid_to, F.col("__u_eff"))
        .withColumn(is_current, F.lit(False))
        .select(dim.columns)
    )
    # Untracked attributes (anything that is not the key, a tracked
    # column, or a system column) carry over from the old current row
    # into the new version — the normal Kimball dim has plenty of them.
    system = {key, valid_from, valid_to, is_current}
    untracked = [c for c in dim.columns if c not in system and c not in tracked]
    new_versions = (
        joined.filter(F.col("__u_eff").isNotNull() & pred)
        .select(
            F.col(key),
            *[F.col(f"__u_{t}").alias(t) for t in tracked],
            *[F.col(c) for c in untracked],
            F.col("__u_eff").alias(valid_from),
            F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
            F.lit(True).alias(is_current),
        )
        .select(dim.columns)
    )
    inserts = (
        u_renamed.join(current.select(key), key, "left_anti")
        .select(
            F.col(key),
            *[F.col(f"__u_{t}").alias(t) for t in tracked],
            # A brand-new key has no prior row to inherit from: its
            # untracked attributes start NULL (populate them upstream
            # if the update feed carries them).
            *[
                F.lit(None).cast(dim.schema[c].dataType).alias(c)
                for c in untracked
            ],
            F.col("__u_eff").alias(valid_from),
            F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
            F.lit(True).alias(is_current),
        )
        .select(dim.columns)
    )
    return (
        history.unionByName(untouched_current)
        .unionByName(closed)
        .unionByName(new_versions)
        .unionByName(inserts)
    )
