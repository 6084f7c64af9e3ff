"""The reference's actual domain pipeline, generalized: NYC-taxi ingest →
clean → feature engineering → KPI tables (SURVEY.md §2.2 P3/P5, §2.8, §2.11
inputs). Runs on any DataFrame with the trips fixture schema (FIXTURES.md).

Every derived column is a native expression twin of the reference's UDF/RDD
implementations (spark_jobs/03a_engineer_features.py:27-78) — same values,
whole-stage-codegen instead of Python serialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.functions.scalar import (
    distance_bucket,
    dow_iso,
    dow_spark,
    duration_minutes,
    is_weekend,
    night_flag,
    speed_mph,
    tip_rate_of_fare,
    tip_rate_of_total,
)
from nyc_taxi_pyspark_spark.functions.exact import davg, present_round
from nyc_taxi_pyspark_spark.operators.transforms import apply_rules, taxi_cleaning_rules
from nyc_taxi_pyspark_spark.schemas import PAYMENT_LOOKUP_ROWS


def clean_trips(df: DataFrame) -> DataFrame:
    """The 11-rule cleaning battery + dedup on the natural key
    (spark_jobs/02_clean_eda.py:46-69)."""
    cleaned = apply_rules(df, taxi_cleaning_rules())
    return cleaned.dropDuplicates(
        [
            "tpep_pickup_datetime",
            "tpep_dropoff_datetime",
            "pickup_longitude",
            "pickup_latitude",
            "dropoff_longitude",
            "dropoff_latitude",
            "fare_amount",
            "total_amount",
        ]
    )


def engineer_features(df: DataFrame) -> DataFrame:
    """Feature engineering (spark_jobs/03a:39-78), all native expressions.
    Both DoW conventions and both tip_rate denominators are produced as
    distinct named columns — the reference's two-convention trap made
    explicit."""
    dur = duration_minutes("tpep_pickup_datetime", "tpep_dropoff_datetime")
    return df.withColumns(
        {
            "pickup_hour": F.hour("tpep_pickup_datetime"),
            "pickup_dow": dow_spark("tpep_pickup_datetime"),
            "pickup_dow_iso": dow_iso("tpep_pickup_datetime"),
            "is_weekend": is_weekend("tpep_pickup_datetime"),
            "night_flag": night_flag("tpep_pickup_datetime"),
            "duration_min": dur,
            "avg_speed_mph": speed_mph(F.col("trip_distance"), dur),
            "tip_rate": tip_rate_of_fare("tip_amount", "fare_amount"),
            "tip_rate_of_total": tip_rate_of_total("tip_amount", "total_amount"),
            "distance_bucket": distance_bucket("trip_distance"),
            "label_tip": (F.col("tip_amount") > 0).cast("int"),
        }
    )


def payment_lookup(spark) -> DataFrame:
    """The payment dimension as a JVM LocalRelation (SQL VALUES).

    ``createDataFrame(rows, schema)`` plans as a Python-backed RDD scan, so
    every broadcast build of this 6-row table schedules a Python worker
    task; the VALUES form is a literal the JVM folds with no Python round
    trip and no job. (The S4 StructType-from-rows surface demo lives in
    ``catalog.relational.inline_lookup_table``, unchanged.) Types match
    PAYMENT_LOOKUP_SCHEMA: int code, string label.
    """
    # labels are a static constant today, but they interpolate into SQL:
    # double any single quote (ANSI escaping) so a future label like
    # "Driver's app" cannot break the statement (r15 ADVICE)
    values = ", ".join(
        f"({int(code)}, '{label.replace(chr(39), chr(39) * 2)}')"
        for code, label in PAYMENT_LOOKUP_ROWS
    )
    return spark.sql(
        "SELECT CAST(payment_type AS INT) AS payment_type, payment_label "
        f"FROM (VALUES {values}) AS t(payment_type, payment_label)"
    )


def kpi_by_payment(trips: DataFrame, lookup: DataFrame) -> DataFrame:
    """The reference's flagship KPI (spark_jobs/02e:57-66): broadcast-enrich
    with payment labels, trips + avg total per label, desc by volume."""
    return (
        trips.join(F.broadcast(lookup), "payment_type", "left")
        .groupBy(F.coalesce("payment_label", F.lit("Unknown")).alias("payment_label"))
        .agg(
            F.count("*").alias("trips"),
            # exact int-cents average + portable presentation rounding (ROUND
            # on a double average diverges between engines on half-cent
            # boundaries — see functions/exact.py)
            present_round(davg("total_amount", 2), 2).alias("avg_total"),
        )
        .orderBy(F.desc("trips"), "payment_label")
    )


def kpi_heatmap(trips: DataFrame) -> DataFrame:
    """DoW×hour heatmap (spark_jobs/05c:122-129)."""
    return (
        trips.groupBy("pickup_dow", "pickup_hour")
        .agg(
            F.count("*").alias("trips"),
            present_round(davg("total_amount", 2), 2).alias("avg_total"),
        )
        .orderBy("pickup_dow", "pickup_hour")
    )


def kpi_distance_buckets(trips: DataFrame) -> DataFrame:
    """Bucketed distance KPI (spark_jobs/05b:92-99)."""
    return (
        trips.groupBy("distance_bucket")
        .agg(
            F.count("*").alias("trips"),
            present_round(davg("fare_amount", 2), 2).alias("avg_fare"),
            present_round(davg("tip_amount", 2), 2).alias("avg_tip"),
        )
        .orderBy(F.desc("trips"), "distance_bucket")
    )
