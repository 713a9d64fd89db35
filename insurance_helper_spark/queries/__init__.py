from insurance_helper_spark.queries.catalog import QUERIES, ORACLE_SQL, register

__all__ = ["QUERIES", "ORACLE_SQL", "register"]
