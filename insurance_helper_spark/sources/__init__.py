from insurance_helper_spark.sources.tables import (
    FIXTURE_TABLES,
    load_table,
    load_tables,
    register_views,
)

__all__ = ["FIXTURE_TABLES", "load_table", "load_tables", "register_views"]
