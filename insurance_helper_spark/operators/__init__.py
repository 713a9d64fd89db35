from insurance_helper_spark.operators import dedup, incremental, similarity

__all__ = ["dedup", "incremental", "similarity"]
