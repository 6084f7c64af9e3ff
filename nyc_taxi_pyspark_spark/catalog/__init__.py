"""Named query catalog — the driver contract surface.

Every operator family from SURVEY.md §2 contributes named queries here; each
query is a ``(spark, sf_dir) -> DataFrame`` callable plus (where
SQL-expressible) a DuckDB oracle SQL string. ``__spark_entry__.py`` re-exports
this registry.
"""

from nyc_taxi_pyspark_spark.catalog.registry import ORACLES, QUERIES, query

# Import for registration side effects.
from nyc_taxi_pyspark_spark.catalog import (  # noqa: E402,F401
    relational,
    aggregates,
    joins,
    windows,
    sets,
    text,
    similarity,
    streaming,
    udfs_mm,
    sql_entry,
    taxi_domain,
    functions_ext,
    sources_ext,
    events,
    corpus,
    profiling,
    quality,
    tpch_ext,
)

__all__ = ["QUERIES", "ORACLES", "query"]
