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


# ---------------------------------------------------------------------------
# Rows-only invariants (VERDICT r13 item 2): the six catalog queries without
# a hash oracle (approximate sketches / seeded RNG sampling) each get a
# CHECKED, RECORDED invariant here so the parity log shows the verified
# bound/property per query instead of a bare "rows-only" skip. These mirror
# the pytest invariants (tests/test_sketch_exactness_guard.py,
# tests/test_text_similarity.py) but run against the SAME sf_dir and land in
# the same artifact the driver's correctness record points at.
#
# Each invariant takes (spark, con, sf_dir, fn, sdf) — sdf is the query's
# pandas result — and returns (problems, detail): empty problems = pass,
# detail is the human-readable checked-value line for the log.

# must match catalog.aggregates.stratified_sample's fractions — a drift
# fails the band check visibly rather than silently weakening it
_STRATA_FRACTIONS = {
    "view": 0.1,
    "click": 0.5,
    "purchase": 1.0,
    "error": 1.0,
    "signup": 0.2,
}


def _binom_band(n: int, p: float, nsig: float = 5.0) -> tuple[float, float]:
    mu = n * p
    sd = math.sqrt(n * p * (1.0 - p))
    return mu - nsig * sd, mu + nsig * sd


def _seed_stable(fn, spark, sf_dir, sdf) -> list[str]:
    """Re-run the seeded query in the same session: identical result rows."""
    again = fn(spark, sf_dir).toPandas()
    if canon(sdf) != canon(again):
        return ["seed instability: two same-session runs differ"]
    return []


def _inv_approx_quantiles(spark, con, sf_dir, fn, sdf):
    problems = []
    eps = 0.011  # approxQuantile relativeError=0.01 + tie/rounding slack
    n = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    checked = []
    for _, row in sdf.iterrows():
        q, v = float(row["quantile"]), float(row["value"])
        le, lt = con.execute(
            "SELECT SUM(CASE WHEN l_extendedprice <= ? THEN 1 ELSE 0 END),"
            "       SUM(CASE WHEN l_extendedprice <  ? THEN 1 ELSE 0 END)"
            " FROM lineitem",
            [v, v],
        ).fetchone()
        frac_le, frac_lt = le / n, lt / n
        if not (frac_le >= q - eps and frac_lt <= q + eps):
            problems.append(
                f"q={q}: value {v} has rank window [{frac_lt:.4f},"
                f" {frac_le:.4f}], outside {q}±{eps}"
            )
        checked.append(f"q{q:g}:rank[{frac_lt:.3f},{frac_le:.3f}]")
    return problems, f"GK rank error <= {eps} vs exact ({', '.join(checked)})"


def _inv_approx_count_distinct(spark, con, sf_dir, fn, sdf):
    problems = []
    exact = dict(
        con.execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_partkey)"
            " FROM lineitem GROUP BY l_returnflag"
        ).fetchall()
    )
    bound = 0.15  # HLL++ default rsd 0.05; 3σ hard gate
    worst = 0.0
    for _, row in sdf.iterrows():
        ex = exact.get(row["l_returnflag"])
        if ex is None:
            problems.append(f"flag {row['l_returnflag']!r} absent in exact")
            continue
        rel = abs(int(row["approx_parts"]) - ex) / max(ex, 1)
        worst = max(worst, rel)
        if rel > bound:
            problems.append(
                f"flag {row['l_returnflag']!r}: HLL {row['approx_parts']}"
                f" vs exact {ex} (rel err {rel:.3f} > {bound})"
            )
    return problems, f"HLL rel err <= {bound} vs exact (max {worst:.4f})"


def _inv_sampled_agg(spark, con, sf_dir, fn, sdf):
    problems = _seed_stable(fn, spark, sf_dir, sdf)
    n_pop = con.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    n_s = int(sdf["n_sampled"].iloc[0])
    lo, hi = _binom_band(n_pop, 0.1)
    if not (lo <= n_s <= hi):
        problems.append(
            f"n_sampled {n_s} outside 5σ binomial band [{lo:.0f}, {hi:.0f}]"
            f" for p=0.1 N={n_pop}"
        )
    return problems, (
        f"seed-stable; n={n_s} in 5σ band [{lo:.0f},{hi:.0f}] (p=0.1, N={n_pop})"
    )


def _inv_stratified_sample(spark, con, sf_dir, fn, sdf):
    problems = _seed_stable(fn, spark, sf_dir, sdf)
    pop = dict(
        con.execute(
            "SELECT event_type, COUNT(*) FROM events GROUP BY event_type"
        ).fetchall()
    )
    extra = set(sdf["event_type"]) - set(pop)
    if extra:
        problems.append(f"sampled strata not in population: {sorted(extra)}")
    details = []
    for _, row in sdf.iterrows():
        et, n_s = row["event_type"], int(row["n_sampled"])
        p = _STRATA_FRACTIONS.get(et)
        if p is None:
            problems.append(f"stratum {et!r} not in declared fractions")
            continue
        n_pop = pop.get(et, 0)
        if p >= 1.0:
            ok, band = n_s == n_pop, f"=={n_pop}"
        else:
            lo, hi = _binom_band(n_pop, p)
            ok, band = lo <= n_s <= hi, f"[{lo:.0f},{hi:.0f}]"
        if not ok:
            problems.append(
                f"stratum {et!r}: n_sampled {n_s} outside {band}"
                f" (p={p}, N={n_pop})"
            )
        details.append(f"{et}:{n_s}∈{band}")
    return problems, "seed-stable; per-stratum 5σ bands: " + ", ".join(
        sorted(details)
    )


def _inv_corpus_weighted_sample(spark, con, sf_dir, fn, sdf):
    problems = _seed_stable(fn, spark, sf_dir, sdf)
    k = len(sdf)
    n_pop = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    # a population smaller than k (the dirty fixture) yields the whole
    # population — the A-ES limit, not a size violation
    k_exp = min(50, n_pop)
    if k != k_exp:
        problems.append(f"sample size {k} != min(50, population) = {k_exp}")
    ids = [int(x) for x in sdf["doc_id"]]
    n_match = con.execute(
        "SELECT COUNT(*) FROM documents WHERE doc_id IN ("
        + ",".join(map(str, ids))
        + ")"
    ).fetchone()[0] if ids else 0
    if n_match != len(set(ids)):
        problems.append(
            f"sampled keys ⊄ population: {len(set(ids)) - n_match} unknown ids"
        )
    samp_mean = float(sdf["n_chars"].mean()) if k else 0.0
    pop_mean = con.execute("SELECT AVG(n_chars) FROM documents").fetchone()[0]
    if n_pop > 50 and samp_mean <= pop_mean:
        # heavier-likelier is only observable when the sample is a strict
        # subset; sample == population trivially has equal means
        problems.append(
            f"weighting not heavier-likelier: sample mean n_chars "
            f"{samp_mean:.1f} <= population {pop_mean:.1f}"
        )
    return problems, (
        f"deterministic; k={k}=min(50,{n_pop}); keys⊆population; weighted: "
        f"sample mean n_chars {samp_mean:.1f} vs population {pop_mean:.1f}"
    )


def _inv_sketch_hll_union(spark, con, sf_dir, fn, sdf):
    problems = []
    bound = 0.15
    est = float(sdf["n_users_hll"].iloc[0])
    ex_spark = int(sdf["n_users_exact"].iloc[0])
    ex = con.execute("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    if ex_spark != ex:
        problems.append(
            f"exact-twin column mismatch: spark {ex_spark} vs duckdb {ex}"
        )
    rel = abs(est - ex) / max(ex, 1)
    if rel > bound:
        problems.append(f"HLL union {est} vs exact {ex}: rel err {rel:.3f} > {bound}")
    n_types = int(sdf["n_types"].iloc[0])
    # DISTINCT-subquery, not COUNT(DISTINCT): the Spark side counts
    # groupBy groups, and a NULL event_type (dirty fixture) IS a group —
    # COUNT(DISTINCT) would drop it and read one low
    ex_types = con.execute(
        "SELECT COUNT(*) FROM (SELECT DISTINCT event_type FROM events) t"
    ).fetchone()[0]
    if n_types != ex_types:
        problems.append(f"n_types {n_types} != exact {ex_types}")
    return problems, (
        f"exact twin cross-engine-equal ({ex}); union-HLL rel err"
        f" {rel:.4f} <= {bound}; n_types exact"
    )


INVARIANTS = {
    "approx_quantiles": _inv_approx_quantiles,
    "approx_count_distinct": _inv_approx_count_distinct,
    "sampled_agg": _inv_sampled_agg,
    "stratified_sample": _inv_stratified_sample,
    "corpus_weighted_sample": _inv_corpus_weighted_sample,
    "sketch_hll_union_distinct": _inv_sketch_hll_union,
}


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
            inv = INVARIANTS.get(name)
            if inv is None:
                print(f"SKIP  {name}: no oracle (rows-only), rows={len(sdf)}")
                n_noracle += 1
                continue
            try:
                problems, detail = inv(spark, con, sf_dir, fn, sdf)
            except Exception as e:  # noqa: BLE001
                problems, detail = [f"invariant harness error: {e}"], ""
            dt = time.time() - t0
            if problems:
                n_fail += 1
                print(f"FAIL  {name} ({dt:.1f}s, rows={len(sdf)}, rows-only)")
                for p in problems:
                    print(f"      {p}")
            else:
                n_noracle += 1
                print(
                    f"pass* {name} ({dt:.1f}s, rows={len(sdf)}, "
                    f"rows-only invariant: {detail})"
                )
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
