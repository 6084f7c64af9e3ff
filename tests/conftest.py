from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_pyspark_spark.datagen import make_trips_pdf  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from nyc_taxi_pyspark_spark.session import get_spark

    s = get_spark("engine-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def trips(spark):
    from nyc_taxi_pyspark_spark.schemas import TRIPS_SCHEMA

    return spark.createDataFrame(make_trips_pdf(n=2000), TRIPS_SCHEMA).cache()
