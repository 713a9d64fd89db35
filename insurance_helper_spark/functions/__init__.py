from insurance_helper_spark.functions import cleaning, dates, hashing, text, udtfs

__all__ = ["cleaning", "dates", "hashing", "text", "udtfs"]
