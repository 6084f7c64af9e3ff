from nyc_taxi_pyspark_spark.sources.io import (
    load_table,
    load_tables,
    read_csv,
    register_views,
    to_pandas_sanitized,
    write_csv_single,
    write_parquet,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_csv",
    "register_views",
    "to_pandas_sanitized",
    "write_csv_single",
    "write_parquet",
]
