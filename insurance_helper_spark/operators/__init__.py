from insurance_helper_spark.operators import (
    dedup,
    grouped,
    incremental,
    similarity,
    skew,
    state,
)

__all__ = ["dedup", "grouped", "incremental", "similarity", "skew", "state"]
