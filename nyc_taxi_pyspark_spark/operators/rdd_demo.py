"""RDD compatibility surface (SURVEY.md §2.2 P11/P12, §2.4 A12, §3.3).

The reference deliberately exercises the low-level RDD API
(spark_jobs/01_ingest.py:38-47: df.rdd → filter/map/reduceByKey;
spark_jobs/03a_engineer_features.py:72-78: schema-extending map +
createDataFrame(rdd, schema)). The engine retains that surface as a
documented *demo*, with native-expression twins beside each call —
tests assert the two paths agree (the reference's own cross-API
consistency practice, SURVEY §5).

Why the native twin is the production path: each RDD lambda pickles to
Python workers and serializes every row JVM→Python→JVM, leaving whole-stage
codegen and blocking Catalyst pushdown — a 10-100× penalty at scale.
"""

from __future__ import annotations

from operator import add

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql import types as T


def rdd_filter_count(df: DataFrame, col: str, threshold: float) -> int:
    """RDD path of `count rows where col > t` (01_ingest.py:40-41)."""
    return df.rdd.filter(lambda r: (r[col] or 0.0) > threshold).count()


def native_filter_count(df: DataFrame, col: str, threshold: float) -> int:
    return df.filter(F.col(col) > threshold).count()


def rdd_sum_max(df: DataFrame, col: str) -> tuple[float, float]:
    """RDD map→sum / map→max (01_ingest.py:42-44)."""
    vals = df.rdd.map(lambda r: float(r[col] or 0.0))
    return vals.sum(), vals.max()


def native_sum_max(df: DataFrame, col: str) -> tuple[float, float]:
    row = df.agg(
        F.sum(F.coalesce(F.col(col), F.lit(0.0))).alias("s"),
        F.max(F.coalesce(F.col(col), F.lit(0.0))).alias("m"),
    ).first()
    return float(row.s), float(row.m)


def rdd_count_by_key(df: DataFrame, key: str) -> dict:
    """reduceByKey word-count shape (01_ingest.py:45-47)."""
    return dict(
        df.rdd.map(lambda r: (r[key], 1)).reduceByKey(add).collect()
    )


def native_count_by_key(df: DataFrame, key: str) -> dict:
    return {
        r[key]: r["count"] for r in df.groupBy(key).count().collect()
    }


def rdd_extend_schema(df: DataFrame, new_col: str, fn) -> DataFrame:
    """Schema-extending RDD map + createDataFrame(rdd, schema)
    (03a_engineer_features.py:72-78): append a computed field row-wise."""
    schema = T.StructType(df.schema.fields + [T.StructField(new_col, T.IntegerType())])
    rdd = df.rdd.map(lambda r: Row(*r, fn(r)))
    return df.sparkSession.createDataFrame(rdd, schema)
