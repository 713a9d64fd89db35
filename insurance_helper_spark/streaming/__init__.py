from insurance_helper_spark.streaming import ops

__all__ = ["ops"]
