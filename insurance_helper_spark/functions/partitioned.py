"""Checkpoint a relation pre-partitioned by a key, preserving the
partitioning for downstream consumers.

``Dataset.localCheckpoint`` records the physical plan's output
partitioning into the resulting LogicalRDD — but ONLY when the plan is
not wrapped in AdaptiveSparkPlanExec: with AQE enabled the captured
partitioning is UnknownPartitioning, so every downstream join/aggregate
on the key re-shuffles the checkpointed relation (measured: the r15
PageRank contribution relation was re-exchanged once per iteration
despite an explicit repartition before the checkpoint). The helper
plans the repartition+checkpoint with AQE momentarily disabled — the
one job whose plan AQE must not wrap — and restores the setting
immediately; all downstream planning still runs with AQE on and sees a
LogicalRDD that satisfies ClusteredDistribution on the key (guide
§2.1/§2.4: establish the partitioning once, reuse the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def partitioned_checkpoint(df: DataFrame, num_partitions: int, *cols: str) -> DataFrame:
    """``df.repartition(num_partitions, *cols).localCheckpoint(eager=True)``
    with the partitioning actually preserved (see module docstring).
    Not thread-safe across concurrent planners in one session (flips a
    session conf around one plan construction)."""
    spark = df.sparkSession
    key = "spark.sql.adaptive.enabled"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        return df.repartition(num_partitions, *cols).localCheckpoint(eager=True)
    finally:
        spark.conf.set(key, old)
