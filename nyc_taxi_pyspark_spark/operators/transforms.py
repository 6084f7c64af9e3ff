"""Projection / filter / cleaning operators (SURVEY.md §2.2, P1-P12).

All are thin, declarative DataFrame transforms: Catalyst pushes the
predicates and column pruning into the parquet scan, so at 100 TB these run
as a single scan stage with no shuffle.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cast_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Cast-projection (P2; reference spark_jobs/02b_basic_clean.py:30-40):
    keep only the mapped columns, cast each to its target type."""
    return df.select([F.col(c).cast(t).alias(c) for c, t in mapping.items()])


def with_columns(df: DataFrame, exprs: Mapping[str, Column]) -> DataFrame:
    """Derived columns (P3) in one projection (single pass, not chained
    withColumn which grows the plan linearly)."""
    return df.withColumns(dict(exprs))


def with_if_missing(df: DataFrame, name: str, expr: Column) -> DataFrame:
    """Schema-tolerant add-if-absent (reference spark_jobs/05c:21-25)."""
    return df if name in df.columns else df.withColumn(name, expr)


def apply_rules(df: DataFrame, rules: Sequence[Column]) -> DataFrame:
    """Range-predicate cleaning battery (P5): conjunction of rules, one
    filter node so Catalyst can reorder/push the whole predicate set
    (reference's 11-rule cleaning, spark_jobs/02_clean_eda.py:46-65)."""
    if not rules:
        return df
    pred = rules[0]
    for r in rules[1:]:
        pred = pred & r
    return df.filter(pred)


def keep_null_or_valid(col: str, pred: Column) -> Column:
    """Null-safe predicate (P6): keep rows where col is null OR pred holds
    (reference spark_jobs/03b_vectorize_scale.py:58)."""
    return F.col(col).isNull() | pred


def dedup(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """Deduplication (P8). ``dropDuplicates(keys)`` keeps an *arbitrary*
    survivor per key group — fine for the reference's semantics but not
    oracle-hashable on non-key columns; oracle queries use
    :func:`dedup_deterministic` instead."""
    return df.dropDuplicates(list(keys)) if keys else df.distinct()


def dedup_deterministic(
    df: DataFrame, keys: Sequence[str], order_col: str
) -> DataFrame:
    """Deterministic dedup: per key group keep the row with min(order_col).

    Implemented as a window row_number filter — one shuffle on the keys, no
    self-join, and AQE handles skewed key groups.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def taxi_cleaning_rules() -> list[Column]:
    """The reference's 11-rule cleaning battery on the taxi fixture schema
    (spark_jobs/02_clean_eda.py:46-65), as reusable Column predicates."""
    return [
        F.col("passenger_count").between(1, 6),
        (F.col("trip_distance") > 0) & (F.col("trip_distance") <= 100),
        F.col("fare_amount").between(0, 500),
        F.col("total_amount").between(0, 1000),
        F.col("tip_amount").between(0, 200),
        F.col("tpep_pickup_datetime").isNotNull(),
        F.col("tpep_dropoff_datetime").isNotNull(),
        F.col("tpep_dropoff_datetime") > F.col("tpep_pickup_datetime"),
        F.col("pickup_latitude").between(40, 42),
        F.col("pickup_longitude").between(-75, -72),
        F.col("dropoff_latitude").between(40, 42),
        F.col("dropoff_longitude").between(-75, -72),
    ]
