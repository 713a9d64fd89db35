from insurance_helper_spark.operators import (
    corpus,
    dedup,
    grouped,
    incremental,
    scd,
    similarity,
    skew,
    state,
)

__all__ = [
    "corpus", "dedup", "grouped", "incremental", "scd", "similarity",
    "skew", "state",
]
