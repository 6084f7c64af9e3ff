#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every catalog query on Spark and its oracle SQL on DuckDB against the
same parquet tables, then compares row count, column names, and
order-insensitive values (exact for ints/strings; bit-exact expectation for
doubles, with a tolerance report when bits differ so the failure mode is
visible). Usage:

    python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str) -> pd.DataFrame:
    return con.execute(sql).fetchdf()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    import datetime

    import numpy as np

    def cell(v):
        if isinstance(v, np.ndarray):
            v = list(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if pd.isna(v):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, pd.Timestamp):
            return v.strftime("%Y-%m-%d %H:%M:%S.%f")
        if isinstance(v, datetime.datetime):
            return v.strftime("%Y-%m-%d %H:%M:%S.%f")
        if isinstance(v, datetime.date):
            return v.strftime("%Y-%m-%d 00:00:00.000000")
        return str(v)

    rows = ["\x01".join(cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    srows, orows = canon(spark_df), canon(oracle_df)
    if srows != orows:
        # find first differing row for the report
        diffs = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        # no differing pair ⇒ one side is a strict prefix (row counts
        # differ); point at the first extra row, and never index an empty
        # side (an empty-vs-nonempty result used to IndexError and kill
        # the whole run)
        i = diffs[0] if diffs else min(len(srows), len(orows))
        s_i = srows[i][:300] if i < len(srows) else "<no row>"
        o_i = orows[i][:300] if i < len(orows) else "<no row>"
        problems.append(
            f"values differ at sorted row {i}:\n  spark : {s_i}\n  oracle: {o_i}"
        )
        # Tolerance report: per float column, compare the value-sorted column
        # vectors and report max-abs diff — distinguishes float drift (tiny
        # max-abs on every row) from structural mismatches (huge or n/a).
        if len(spark_df) == len(oracle_df):
            import numpy as np

            for col in sorted(spark_df.columns):
                s, o = spark_df[col], oracle_df[col]
                if not (
                    np.issubdtype(s.dtype, np.floating)
                    or np.issubdtype(o.dtype, np.floating)
                ):
                    continue
                sv = np.sort(s.astype(float).fillna(np.nan).to_numpy())
                ov = np.sort(o.astype(float).fillna(np.nan).to_numpy())
                with np.errstate(invalid="ignore"):
                    d = np.abs(sv - ov)
                if np.isnan(d).any() and not (
                    np.isnan(sv).sum() == np.isnan(ov).sum()
                ):
                    problems.append(f"float col {col}: NULL/NaN count differs")
                    continue
                mx = np.nanmax(d) if d.size and not np.isnan(d).all() else 0.0
                if mx > 0:
                    problems.append(
                        f"float col {col}: max-abs diff {mx:.3e} over "
                        f"value-sorted columns ({int((d > 0).sum())} rows differ)"
                    )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from nyc_taxi_pyspark_spark.catalog import ORACLES, QUERIES
    from nyc_taxi_pyspark_spark.session import get_spark

    spark = get_spark("parity-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_noracle = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"SKIP  {name}: no oracle (rows-only), rows={len(sdf)}")
            n_noracle += 1
            continue
        try:
            odf = run_oracle(con, ORACLES[name])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        dt = time.time() - t0
        if problems:
            n_fail += 1
            print(f"FAIL  {name} ({dt:.1f}s, rows={len(sdf)})")
            for p in problems:
                print(f"      {p}")
        else:
            n_pass += 1
            print(f"pass  {name} ({dt:.1f}s, rows={len(sdf)})")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
