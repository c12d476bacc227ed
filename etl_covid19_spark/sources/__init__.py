"""Sources & sinks (SURVEY.md §2.1, S1-S9)."""

from etl_covid19_spark.sources.catalog import TABLES, load_table, load_tables, register_views
from etl_covid19_spark.sources.parquet_zone import read_zone, write_zone

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_zone",
    "write_zone",
]
