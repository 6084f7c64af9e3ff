"""Sanity checks against the REAL driver testdata (not synthetic fixtures).

Round-5 postmortem: every unit test ran on synthetic fixtures, so when the
driver regenerated ``events.parquet`` with a different physical timestamp
unit (NANOS → MICROS), pytest stayed green while the engine silently
compressed 30 days of event time into ~43 minutes. These tests fail loudly
the next time the testdata's physical types or value ranges shift under us.
"""

from __future__ import annotations

import datetime
import os

import pytest

from tests.conftest import SF_DIR

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def test_all_tables_nonempty(spark):
    from nyc_taxi_pyspark_spark.sources.io import load_table

    for name in TABLES:
        assert load_table(spark, SF_DIR, name).limit(1).count() == 1, name


def test_events_ts_decodes_to_real_time(spark):
    """The guard for the r5 unit bug: decoded event time must span more
    than a day and land in a plausible year — a mis-scaled unit (ns read
    as µs, or vice versa) collapses the range or flings it to 1970/52970.
    """
    from pyspark.sql import functions as F

    from nyc_taxi_pyspark_spark.sources.io import load_table

    ev = load_table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    assert isinstance(lo, datetime.datetime)
    assert 2020 <= lo.year <= 2030, f"min ts {lo} outside plausible window"
    assert 2020 <= hi.year <= 2030, f"max ts {hi} outside plausible window"
    assert (hi - lo) > datetime.timedelta(days=1), f"ts span collapsed: {lo}..{hi}"


def test_events_ts_matches_duckdb_oracle(spark):
    """Bit-level agreement with the oracle engine on min/max event time —
    the exact comparison the driver's correctness gate reduces to."""
    duckdb = pytest.importorskip("duckdb")
    from pyspark.sql import functions as F

    from nyc_taxi_pyspark_spark.sources.io import load_table

    s_lo, s_hi = load_table(spark, SF_DIR, "events").agg(
        F.min("ts"), F.max("ts")
    ).first()
    d_lo, d_hi = duckdb.sql(
        f"SELECT min(ts), max(ts) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()
    assert s_lo == d_lo and s_hi == d_hi, (s_lo, d_lo, s_hi, d_hi)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_events_reader_handles_both_ts_units(spark, tmp_path, unit):
    """Both physical units the driver has shipped decode to the same event
    time. The ns file exercises the legacy nanosAsLong fallback, which the
    current (micros) testdata no longer reaches."""
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    from nyc_taxi_pyspark_spark.sources.io import load_table

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    times = [base + datetime.timedelta(hours=i, microseconds=250_000 * i)
             for i in range(5)]
    table = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "ts": pa.array(times, pa.timestamp(unit)),
            "user_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "event_type": pa.array(["click"] * 5),
            "value": pa.array([float(i) for i in range(5)]),
            "props": pa.array(['{"k":1}'] * 5),
        }
    )
    sf_dir = tmp_path / unit
    sf_dir.mkdir()
    pq.write_table(table, sf_dir / "events.parquet")

    got = [
        r["ts"]
        for r in load_table(spark, str(sf_dir), "events")
        .orderBy("event_id")
        .collect()
    ]
    assert got == times


def test_events_reader_handles_nanos_directory(spark, tmp_path):
    """A pyarrow/pandas ingest writes ns timestamps by default AND writes
    tables as directories of part files — both at once is the realistic
    worst case. The footer sniff must detect ns from the first part file
    of a DIRECTORY source so the nanosAsLong fallback engages (a missed
    sniff is a hard vectorized-reader error, not silent corruption, but
    the graceful path should still win)."""
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    from nyc_taxi_pyspark_spark.sources.io import load_table

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    times = [base + datetime.timedelta(hours=i, microseconds=250_000 * i)
             for i in range(6)]

    def chunk(lo, hi):
        return pa.table(
            {
                "event_id": pa.array(range(lo, hi), pa.int64()),
                "ts": pa.array(times[lo:hi], pa.timestamp("ns")),
                "user_id": pa.array([1 + i % 3 for i in range(lo, hi)], pa.int64()),
                "event_type": pa.array(["click"] * (hi - lo)),
                "value": pa.array([float(i) for i in range(lo, hi)]),
                "props": pa.array(['{"k":1}'] * (hi - lo)),
            }
        )

    table_dir = tmp_path / "events.parquet"
    table_dir.mkdir()
    pq.write_table(chunk(0, 3), table_dir / "part-00000.parquet")
    pq.write_table(chunk(3, 6), table_dir / "part-00001.parquet")

    got = [
        r["ts"]
        for r in load_table(spark, str(tmp_path), "events")
        .orderBy("event_id")
        .collect()
    ]
    assert got == times


def test_orders_lineitem_dates_plausible(spark):
    from pyspark.sql import functions as F

    from nyc_taxi_pyspark_spark.sources.io import load_table

    o_lo, o_hi = load_table(spark, SF_DIR, "orders").agg(
        F.min("o_orderdate"), F.max("o_orderdate")
    ).first()
    assert o_lo.year >= 1990 and o_hi.year <= 2030
    l_hi = load_table(spark, SF_DIR, "lineitem").agg(F.max("l_shipdate")).first()[0]
    assert 1990 <= l_hi.year <= 2030
