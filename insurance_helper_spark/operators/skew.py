"""Skew mitigation: salted aggregation and salted broadcast-ish joins.

AQE's skew-join splitting (on by default, session.py) handles most
shuffle skew at runtime; these explicit operators are for the cases AQE
can't fix:

- a single hot GROUP BY key whose partial aggregate still funnels into
  one reducer → two-phase salted aggregation;
- a fact⋈fact join where one side's hot keys overwhelm a task and the
  dim side is too big to broadcast outright → replicate the dim rows
  per salt (hot keys only) so the fact side can spread.

Both are pure DataFrame compositions — no custom partitioner needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    reaggs: list[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) → groupBy(keys).

    ``aggs`` are the salted-phase aggregates (must be ALGEBRAIC —
    sum/count/min/max — so a second phase can merge them); ``reaggs``
    re-combine the per-salt partials. E.g.
    ``aggs=[F.sum("x").alias("s")], reaggs=[F.sum("s").alias("s")]``.

    Phase 1 spreads a hot key over ``salt_buckets`` reducers; phase 2
    shuffles only #distinct-keys × salt_buckets rows. The salt is
    derived from a stable row hash (not rand()) so retried tasks
    produce identical output — a requirement for deterministic
    recomputation under task retry.
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in df.columns]), F.lit(salt_buckets)).alias("__salt")
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*aggs)
    return phase1.groupBy(*keys).agg(*reaggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``fact`` has skewed keys: salt the fact side with
    a stable hash, explode the dim side ``salt_buckets``× so every
    (key, salt) bucket finds its dim row.

    Cost: dim is replicated salt_buckets× through the shuffle — use for
    moderate dims where broadcast is too big but replication is
    affordable, or pre-filter the salting to known-hot keys. All
    columns of both inputs are preserved (join key once).
    """
    fact_cols = [c for c in fact.columns]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact_cols]), F.lit(salt_buckets)).alias("__salt")
    fact_s = fact.withColumn("__salt", salt)
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = fact_s.join(dim_s, on=[key, "__salt"], how=how)
    return out.drop("__salt")
