"""Projection / filter / cleaning queries (SURVEY.md §2.2, P1-P10; §2.1 S4).

Row-level queries: no aggregation, so doubles are bit-identical across
engines without decimal tricks (same parquet input, same IEEE scalar ops).
All predicates/projections push down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.catalog.registry import query
from nyc_taxi_pyspark_spark.functions.scalar import value_bucket
from nyc_taxi_pyspark_spark.operators.transforms import (
    apply_rules,
    cast_columns,
    dedup_deterministic,
    keep_null_or_valid,
    with_columns,
)
from nyc_taxi_pyspark_spark.sources.io import load_table


@query(
    "cast_projection",
    oracle="""
    SELECT o_orderkey,
           CAST(o_custkey AS INTEGER) AS o_custkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           CAST(o_orderpriority AS VARCHAR) AS o_orderpriority
    FROM orders
    """,
)
def cast_projection(spark, sf_dir):
    """P2 — cast-projection helper (reference spark_jobs/02b_basic_clean.py:30-40)."""
    return cast_columns(
        load_table(spark, sf_dir, "orders"),
        {
            "o_orderkey": "bigint",
            "o_custkey": "int",
            "o_totalprice": "double",
            "o_orderdate": "date",
            "o_orderpriority": "string",
        },
    )


@query(
    "derived_columns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           YEAR(l_shipdate) AS ship_year,
           MONTH(l_shipdate) AS ship_month
    FROM lineitem
    """,
)
def derived_columns(spark, sf_dir):
    """P3 — derived columns in one projection (reference spark_jobs/02_clean_eda.py:29-43)."""
    li = load_table(spark, sf_dir, "lineitem")
    return with_columns(
        li,
        {
            "revenue": F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "charge": F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")),
            "ship_year": F.year("l_shipdate"),
            "ship_month": F.month("l_shipdate"),
        },
    ).select("l_orderkey", "l_linenumber", "revenue", "charge", "ship_year", "ship_month")


@query(
    "filter_battery",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_quantity BETWEEN 1 AND 50
      AND l_extendedprice > 0 AND l_extendedprice <= 80000
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_tax >= 0
      AND l_shipdate IS NOT NULL
      AND l_returnflag IS NOT NULL
    """,
)
def filter_battery(spark, sf_dir):
    """P5 — conjunction-of-range-rules cleaning battery (reference
    spark_jobs/02_clean_eda.py:46-65). One filter node; Catalyst pushes the
    whole predicate set into the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    rules = [
        F.col("l_quantity").between(1, 50),
        (F.col("l_extendedprice") > 0) & (F.col("l_extendedprice") <= 80000),
        F.col("l_discount").between(0.02, 0.08),
        F.col("l_tax") >= 0,
        F.col("l_shipdate").isNotNull(),
        F.col("l_returnflag").isNotNull(),
    ]
    return apply_rules(li, rules).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )


@query(
    "null_or_valid",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE value IS NULL OR value > 0
    """,
)
def null_or_valid(spark, sf_dir):
    """P6 — keep-null-or-valid idiom (reference spark_jobs/03b_vectorize_scale.py:58)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(keep_null_or_valid("value", F.col("value") > 0)).select(
        "event_id", "user_id", "value"
    )


@query(
    "membership_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
    """,
)
def membership_filter(spark, sf_dir):
    """P7 — Column.isin (reference spark_jobs/05c_make_report.py:68-72)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag").isin("A", "R")).select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )


@query(
    "case_buckets",
    oracle="""
    SELECT CASE WHEN l_quantity >= 40 THEN '40+'
                WHEN l_quantity >= 25 THEN '25-40'
                WHEN l_quantity >= 10 THEN '10-25'
                ELSE '<10' END AS qty_bucket,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY 1
    """,
)
def case_buckets(spark, sf_dir):
    """P4 — when-chain bucketing + group count (reference
    spark_jobs/05b_plots.py:92-97; native twin of the U2 bucket UDF)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "qty_bucket",
            value_bucket("l_quantity", [40, 25, 10], ["40+", "25-40", "10-25", "<10"]),
        )
        .groupBy("qty_bucket")
        .agg(F.count("*").alias("n"))
    )


@query(
    "dedup_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    """,
)
def dedup_distinct(spark, sf_dir):
    """P8 — full-row distinct on a projected key set (reference
    spark_jobs/02_clean_eda.py:67-69). Hash-aggregate, one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag", "l_linestatus", F.to_date("l_shipdate").alias("ship_date")
    ).distinct()


@query(
    "dedup_keep_first",
    oracle="""
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def dedup_keep_first(spark, sf_dir):
    """P8 deterministic variant — dropDuplicates keeps an arbitrary survivor,
    so the engine's canonical dedup keeps min(order_col) per key group via a
    window (scales: single shuffle on the keys, AQE-skew-safe)."""
    o = load_table(spark, sf_dir, "orders")
    return dedup_deterministic(
        o.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        keys=["o_custkey", "o_orderdate"],
        order_col="o_orderkey",
    )


@query(
    "null_fill",
    oracle="""
    SELECT event_id,
           COALESCE(value, 0.0) AS value_filled,
           COALESCE(props, '{}') AS props_filled
    FROM events
    """,
)
def null_fill(spark, sf_dir):
    """P10 — null-fill (reference spark_jobs/03b_vectorize_scale.py:64-69
    when-chain; engine uses na.fill / coalesce)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
        F.coalesce(F.col("props"), F.lit("{}")).alias("props_filled"),
    )


@query(
    "inline_lookup_table",
    oracle="""
    SELECT * FROM (VALUES
        (1, 'Credit card'), (2, 'Cash'), (3, 'No charge'),
        (4, 'Dispute'), (5, 'Unknown'), (6, 'Voided trip')
    ) AS t(payment_type, payment_label)
    """,
)
def inline_lookup_table(spark, sf_dir):
    """S4 — in-memory table from a Python list with an explicit StructType
    (reference spark_jobs/02e_join_lookup.py:42-54)."""
    from nyc_taxi_pyspark_spark.schemas import PAYMENT_LOOKUP_ROWS, PAYMENT_LOOKUP_SCHEMA

    return spark.createDataFrame(PAYMENT_LOOKUP_ROWS, PAYMENT_LOOKUP_SCHEMA)
