from insurance_helper_spark.functions import cleaning, dates, text

__all__ = ["cleaning", "dates", "text"]
