"""Streaming tests: the batch twins must produce the same results when the
same transform runs under readStream (memory sink, drained synchronously)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.schemas import TESTDATA_SCHEMAS
from nyc_taxi_pyspark_spark.sources.io import load_table
from nyc_taxi_pyspark_spark.streaming.runner import run_stream_once
from nyc_taxi_pyspark_spark.streaming.windows import (
    session_counts,
    tumbling_counts,
    with_watermark,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark):
    """Materialize the (nanos-converted) events table as a µs-timestamp
    parquet dir that readStream can consume."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, SF_DIR, "events").write.mode("overwrite").parquet(d)
    return d


def test_stream_tumbling_equals_batch(spark, events_dir):
    batch = tumbling_counts(load_table(spark, SF_DIR, "events"))
    streamed = run_stream_once(
        spark,
        events_dir,
        TESTDATA_SCHEMAS["events"],
        lambda s: tumbling_counts(with_watermark(s)),
        output_mode="complete",
    )
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in streamed.collect()}
    assert b == s
    assert len(b) > 0


def test_stream_session_window_runs(spark, events_dir):
    streamed = run_stream_once(
        spark,
        events_dir,
        TESTDATA_SCHEMAS["events"],
        lambda s: session_counts(with_watermark(s)),
        output_mode="complete",
    )
    batch = session_counts(load_table(spark, SF_DIR, "events"))
    assert streamed.count() == batch.count() > 0
    # streamed and batch session sets are identical
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in streamed.collect()}
    assert b == s
