"""nyc_taxi_pyspark_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``BrianMartinez10/nyc-taxi-pyspark`` (surveyed in SURVEY.md),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst, AQE for
runtime re-planning, Structured Streaming for event-time windows, Pandas UDFs
only where built-ins can't express the semantics.

Top-level surface:
    from nyc_taxi_pyspark_spark import get_spark, Engine
"""

from nyc_taxi_pyspark_spark.session import get_spark
from nyc_taxi_pyspark_spark.serve.engine import Engine

__all__ = ["get_spark", "Engine"]
__version__ = "0.1.0"
