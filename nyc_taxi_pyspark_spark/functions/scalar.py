"""Scalar function layer (SURVEY.md §2.8, F1-F14) as native column expressions.

The reference implements several of these as row-at-a-time Python UDFs
(is_weekend at spark_jobs/03a_engineer_features.py:27-36, bucket_distance at
spark_jobs/05c_make_report.py:27-36). Python UDFs block predicate pushdown and
pay per-row serialization, so the engine's canonical forms are native
``pyspark.sql.functions`` expressions that stay inside whole-stage codegen;
the UDF variants live in :mod:`nyc_taxi_pyspark_spark.functions.udfs` as the
compatibility demo surface.

Two semantic traps from the survey are modeled as *distinct named functions*:
  - DoW conventions: ``dow_spark`` (1=Sunday, F.dayofweek — reference
    spark_jobs/03a_engineer_features.py:43) vs ``dow_iso`` (1=Monday —
    reference spark_jobs/05c_make_report.py:59-61 via date_format 'u').
  - tip_rate denominators: ``tip_rate_of_fare`` (tip/fare,
    spark_jobs/03a_engineer_features.py:60-65) vs ``tip_rate_of_total``
    (tip/total, spark_jobs/05c_make_report.py:75-79).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- time ------------------------------------------------------------------

def dow_spark(ts: Column | str) -> Column:
    """Day-of-week, Spark convention: 1=Sunday … 7=Saturday (F4)."""
    return F.dayofweek(_c(ts))


def dow_iso(ts: Column | str) -> Column:
    """Day-of-week, ISO convention: 1=Monday … 7=Sunday (F5).

    Implemented as ``weekday()+1`` (weekday: 0=Monday) — the reference's
    ``date_format(ts, "u")`` needs the LEGACY parser policy; this form works
    under CORRECTED and is oracle-twin ``isodow()`` in DuckDB.
    """
    return F.weekday(_c(ts)) + F.lit(1)


def is_weekend(ts: Column | str) -> Column:
    """1 if Saturday/Sunday else 0 (U1's native twin)."""
    return dow_spark(ts).isin(1, 7).cast("int")


def duration_minutes(start_ts: Column | str, end_ts: Column | str) -> Column:
    """Epoch-seconds arithmetic (F6): minutes between two timestamps, null
    unless end > start (reference guard at spark_jobs/02_clean_eda.py:32-34).
    """
    s, e = _c(start_ts), _c(end_ts)
    return F.when(e > s, (e.cast("long") - s.cast("long")) / 60.0)


# -- guarded ratios (F8) ---------------------------------------------------

def guarded_div(num: Column | str, den: Column | str) -> Column:
    """num/den, null when den is null or <= 0 (reference's guarded-division
    idiom, spark_jobs/02_clean_eda.py:39-40)."""
    n, d = _c(num), _c(den)
    return F.when(d > 0, n / d)


def tip_rate_of_fare(tip: Column | str, fare: Column | str) -> Column:
    return guarded_div(tip, fare)


def tip_rate_of_total(tip: Column | str, total: Column | str) -> Column:
    return guarded_div(tip, total)


def speed_mph(distance: Column | str, minutes: Column | str) -> Column:
    """Average speed from miles and minutes (spark_jobs/03a:54-56)."""
    d, m = _c(distance), _c(minutes)
    return F.when(m > 0, d / (m / 60.0))


# -- flags & buckets -------------------------------------------------------

def bool_flag(pred: Column) -> Column:
    """boolean→int flag (F9), e.g. ``bool_flag(F.col('tip_amount') > 0)``."""
    return pred.cast("int")


def night_flag(ts: Column | str) -> Column:
    """1 for hours 22-23 and 0-5 (reference spark_jobs/03a:72-78 RDD lambda)."""
    h = F.hour(_c(ts))
    return ((h >= 22) | (h <= 5)).cast("int")


def distance_bucket(miles: Column | str) -> Column:
    """Distance→label bucket, when-chain form (P4; reference
    spark_jobs/05b_plots.py:92-97). Nulls fall through to '<1mi' to match
    the UDF variant's None-handling (U2, spark_jobs/05c:27-36)."""
    d = _c(miles)
    return (
        F.when(d >= 10, ">=10mi")
        .when(d >= 5, "5-10mi")
        .when(d >= 2, "2-5mi")
        .when(d >= 1, "1-2mi")
        .otherwise("<1mi")
    )


def value_bucket(col: Column | str, edges: list[float], labels: list[str]) -> Column:
    """General when-chain bucketing: ``edges`` are lower bounds, descending
    checks; rows below all edges get ``labels[-1]``."""
    assert len(labels) == len(edges) + 1
    c = _c(col)
    expr = F.when(c >= edges[0], labels[0])
    for e, lab in zip(edges[1:], labels[1:-1]):
        expr = expr.when(c >= e, lab)
    return expr.otherwise(labels[-1])


# -- SQL registration (V1 support) ----------------------------------------

def register_sql_functions(spark: SparkSession) -> None:
    """Expose engine-named functions to the SQL front door (V1) as SQL scalar
    UDFs (Spark 4 ``CREATE TEMPORARY FUNCTION … RETURN expr``). These expand
    to native expressions at plan time, so they stay inside codegen — unlike
    ``spark.udf.register`` of a Python lambda.
    """
    stmts = [
        """CREATE OR REPLACE TEMPORARY FUNCTION dow_iso(ts TIMESTAMP)
           RETURNS INT RETURN weekday(ts) + 1""",
        """CREATE OR REPLACE TEMPORARY FUNCTION dow_spark(ts TIMESTAMP)
           RETURNS INT RETURN dayofweek(ts)""",
        """CREATE OR REPLACE TEMPORARY FUNCTION is_weekend(ts TIMESTAMP)
           RETURNS INT RETURN CAST(dayofweek(ts) IN (1, 7) AS INT)""",
        """CREATE OR REPLACE TEMPORARY FUNCTION night_flag(ts TIMESTAMP)
           RETURNS INT RETURN CAST(hour(ts) >= 22 OR hour(ts) <= 5 AS INT)""",
        """CREATE OR REPLACE TEMPORARY FUNCTION guarded_div(n DOUBLE, d DOUBLE)
           RETURNS DOUBLE RETURN CASE WHEN d > 0 THEN n / d END""",
        """CREATE OR REPLACE TEMPORARY FUNCTION tip_rate_of_fare(tip DOUBLE, fare DOUBLE)
           RETURNS DOUBLE RETURN CASE WHEN fare > 0 THEN tip / fare END""",
        """CREATE OR REPLACE TEMPORARY FUNCTION tip_rate_of_total(tip DOUBLE, total DOUBLE)
           RETURNS DOUBLE RETURN CASE WHEN total > 0 THEN tip / total END""",
        """CREATE OR REPLACE TEMPORARY FUNCTION distance_bucket(d DOUBLE)
           RETURNS STRING RETURN CASE
             WHEN d >= 10 THEN '>=10mi' WHEN d >= 5 THEN '5-10mi'
             WHEN d >= 2 THEN '2-5mi' WHEN d >= 1 THEN '1-2mi'
             ELSE '<1mi' END""",
    ]
    for s in stmts:
        spark.sql(s)
