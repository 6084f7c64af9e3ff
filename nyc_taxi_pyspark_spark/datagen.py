"""Deterministic NYC-taxi-shaped data generator (FIXTURES.md §1).

Used by unit tests AND the `taxi_pipeline_kpis` catalog query — the engine
can demonstrate the reference's full domain pipeline end-to-end without
shipping taxi data: seed-42 generation is reproducible everywhere.

Seed-42 numpy; includes nulls, out-of-band outliers for every cleaning rule,
exact duplicates on the dedup keys, and ~40% zero tips (drives label_tip).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

# Bump whenever make_trips_pdf's output changes for the same (n, seed):
# consumers key the materialized-parquet filename on (seed, n, version), so
# a generator change regenerates instead of silently pinning a stale file.
DATAGEN_VERSION = 1


def make_trips_pdf(n: int = 2000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2015-01-01 00:00:00")
    pickup = base + pd.to_timedelta(rng.integers(0, 30 * 24 * 3600, n), unit="s")
    dur_min = rng.gamma(2.0, 8.0, n)
    # outliers: negative durations and >4h
    dur_min[rng.random(n) < 0.02] = -5.0
    dur_min[rng.random(n) < 0.02] = 400.0
    dropoff = pickup + pd.to_timedelta((dur_min * 60).astype("int64"), unit="s")

    dist = np.round(rng.gamma(1.5, 2.0, n), 2)
    dist[rng.random(n) < 0.01] = 0.0
    dist[rng.random(n) < 0.01] = 120.0

    fare = np.round(3.0 + dist * 2.5 + rng.normal(0, 2, n).clip(-2, 5), 2)
    fare[rng.random(n) < 0.01] = -10.0
    fare[rng.random(n) < 0.005] = 600.0
    payment = rng.choice(
        [1, 2, 3, 4, 5, 6], n, p=[0.5, 0.35, 0.05, 0.04, 0.03, 0.03]
    ).astype("int32")
    # tip behavior depends on payment type (card tips are recorded, cash
    # mostly isn't) — gives label_tip real signal, as in the actual data
    p_tip = np.where(payment == 1, 0.9, 0.15)
    tip = np.where(rng.random(n) < p_tip, np.round(fare * 0.2, 2), 0.0).clip(0)
    tip[rng.random(n) < 0.005] = 250.0
    total = np.round(fare + tip + 0.8, 2)

    lat = rng.uniform(40.4, 41.2, n)
    lon = rng.uniform(-74.5, -73.0, n)
    lat[rng.random(n) < 0.01] = 39.0
    lon[rng.random(n) < 0.01] = -60.0

    pdf = pd.DataFrame(
        {
            "VendorID": rng.choice([1, 2], n).astype("int32"),
            "tpep_pickup_datetime": pickup,
            "tpep_dropoff_datetime": dropoff,
            "passenger_count": rng.integers(0, 9, n).astype("int32"),
            "trip_distance": dist,
            "pickup_longitude": lon,
            "pickup_latitude": lat,
            "RateCodeID": rng.integers(1, 7, n).astype("int32"),
            "store_and_fwd_flag": rng.choice(["Y", "N"], n),
            "dropoff_longitude": lon + rng.normal(0, 0.05, n),
            "dropoff_latitude": lat + rng.normal(0, 0.05, n),
            "payment_type": payment,
            "fare_amount": fare,
            "extra": rng.choice([0.0, 0.5, 1.0], n),
            "mta_tax": np.full(n, 0.5),
            "tip_amount": tip,
            "tolls_amount": np.where(rng.random(n) < 0.1, 5.54, 0.0),
            "improvement_surcharge": np.full(n, 0.3),
            "total_amount": total,
        }
    )
    # occasional nulls — int columns go through object dtype with python
    # ints/None so createDataFrame accepts them with or without Arrow
    for col, frac in [
        ("VendorID", 0.01),
        ("passenger_count", 0.01),
        ("payment_type", 0.02),
        ("tpep_pickup_datetime", 0.005),
    ]:
        mask = rng.random(n) < frac
        if pdf[col].dtype.kind == "i":
            pdf[col] = pd.Series(
                [None if m else int(v) for m, v in zip(mask, pdf[col])],
                dtype=object,
            )
        else:
            pdf.loc[mask, col] = None
    # exact duplicates on the dedup natural key: copy 20 rows verbatim
    dups = pdf.iloc[:20].copy()
    return pd.concat([pdf, dups], ignore_index=True)


def write_trips_parquet(path: str, n: int = 5000, seed: int = 42) -> str:
    """Materialize the deterministic trips table as a µs-timestamp parquet.

    Both engines (Spark catalog queries and DuckDB oracle SQL) read this
    one file, so the taxi-domain pipeline is oracle-checkable end-to-end:
    the generator is seeded, the write is idempotent, and timestamps are
    coerced to microseconds (pandas ns timestamps would otherwise produce
    TIMESTAMP(NANOS) parquet that Spark's vectorized reader rejects).
    Nullable int columns are written as Int32 so Spark sees IntegerType.
    """
    if os.path.exists(path):
        return path
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = make_trips_pdf(n=n, seed=seed)
    for col in ("VendorID", "passenger_count", "payment_type", "RateCodeID"):
        pdf[col] = pdf[col].astype("Int32")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(
        table, path, coerce_timestamps="us", allow_truncated_timestamps=True
    )
    return path
