"""Set-operation queries (SURVEY.md §2.7 extension)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.catalog.registry import query
from nyc_taxi_pyspark_spark.operators.sets import (
    except_distinct,
    intersect_distinct,
    union_by_name,
)
from nyc_taxi_pyspark_spark.sources.io import load_table


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@query(
    "set_union_distinct",
    oracle="""
    SELECT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
)
def set_union_distinct(spark, sf_dir):
    """unionByName + distinct — nations having customers or suppliers."""
    return union_by_name(
        _cust_nations(spark, sf_dir), _supp_nations(spark, sf_dir)
    ).distinct()


@query(
    "set_union_all_counts",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def set_union_all_counts(spark, sf_dir):
    """UNION ALL (bag semantics) + count — the multi-month ingest shape."""
    return (
        union_by_name(_cust_nations(spark, sf_dir), _supp_nations(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
    )


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    """INTERSECT (distinct) — nations with both customers and suppliers."""
    return intersect_distinct(
        _cust_nations(spark, sf_dir), _supp_nations(spark, sf_dir)
    )


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark, sf_dir):
    """EXCEPT (distinct) — nations with customers but no suppliers."""
    return except_distinct(
        _cust_nations(spark, sf_dir), _supp_nations(spark, sf_dir)
    )
