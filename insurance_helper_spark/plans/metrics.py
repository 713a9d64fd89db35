"""Run observability (SURVEY §2A O6): per-action metrics without extra
passes, via the Observation API — the Spark-native replacement for the
reference's Rich progress counters (cli.py:151-162,364-379).

``observe`` computes aggregate expressions ON THE SAME PASS as the
action (no second scan), so row counts / null counts / byte sums of a
100 TB pipeline stage cost nothing beyond the run itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def with_observation(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to a DataFrame.

    Returns (instrumented_df, observation); after ANY action on the
    returned DataFrame, ``observation.get`` yields {metric: value}.

    Example::

        df2, obs = with_observation(df, "ingest",
                                    rows=F.count(F.lit(1)),
                                    null_urls=F.count_if(F.col("url").isNull()))
        df2.write.parquet(path)
        stats = obs.get   # {'rows': ..., 'null_urls': ...}
    """
    obs = Observation(name)
    cols = [expr.alias(alias) for alias, expr in metrics.items()]
    return df.observe(obs, *cols), obs
