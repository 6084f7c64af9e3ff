from nyc_taxi_pyspark_spark.serve.engine import Engine

__all__ = ["Engine"]
