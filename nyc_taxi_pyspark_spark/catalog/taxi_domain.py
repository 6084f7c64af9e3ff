"""The reference's full domain pipeline as catalog queries.

These run the actual NYC-taxi flow the reference implements — ingest →
11-rule clean → dedup → feature engineering → KPI tables
(spark_jobs/02_clean_eda.py + 03a + 02e/05b/05c) — on the deterministic
seed-42 generated trips table (datagen.make_trips_pdf). No oracle SQL:
DuckDB can't reproduce the generator, so these are rows-only checks; the
semantics are covered per-operator by the oracle-checked queries and by
tests/test_taxi_pipeline.py.
"""

from __future__ import annotations

from nyc_taxi_pyspark_spark.catalog.registry import query
from nyc_taxi_pyspark_spark.datagen import make_trips_pdf
from nyc_taxi_pyspark_spark.operators.taxi import (
    clean_trips,
    engineer_features,
    kpi_by_payment,
    kpi_distance_buckets,
    kpi_heatmap,
    payment_lookup,
)
from nyc_taxi_pyspark_spark.schemas import TRIPS_SCHEMA


def _featured(spark):
    trips = spark.createDataFrame(make_trips_pdf(n=5000), TRIPS_SCHEMA)
    return engineer_features(clean_trips(trips))


@query("taxi_kpi_by_payment")
def taxi_kpi_by_payment(spark, sf_dir):
    """Reference flagship KPI (spark_jobs/02e:57-66): clean → enrich with
    the payment dimension (broadcast) → trips + avg total per label."""
    return kpi_by_payment(_featured(spark), payment_lookup(spark))


@query("taxi_kpi_heatmap")
def taxi_kpi_heatmap(spark, sf_dir):
    """DoW×hour heatmap over the cleaned, feature-engineered trips
    (spark_jobs/05c:122-129)."""
    return kpi_heatmap(_featured(spark))


@query("taxi_kpi_distance_buckets")
def taxi_kpi_distance_buckets(spark, sf_dir):
    """Distance-bucket KPI (spark_jobs/05b:92-99)."""
    return kpi_distance_buckets(_featured(spark))
