#!/usr/bin/env python
"""Whole-catalog LAYOUT-invariance audit.

At 100 TB the physical layout — executor count, shuffle-partition count,
AQE re-planning, scan split sizes — is a tuning knob, not semantics. A
query whose RESULT changes with the layout is silently broken on a real
cluster even though it is hash-green on the driver's fixed local[32]
gate. The in-suite sweep (tests/test_partition_invariance.py) pins the
~44 hand-picked partition-sensitive shapes; THIS audit runs EVERY catalog
query under two adversarially different layouts in sibling sessions of
one JVM and requires bit-identical canonical results:

  session A: 3 shuffle partitions, AQE fully OFF (static planning)
  session B: 32 shuffle partitions, AQE ON (coalesce + skew-join enabled)

Between them this exercises: different hash-partition boundaries for
every groupBy/join/window, AQE's runtime coalescing and join re-planning
vs the static plan, and different task interleavings for every
accumulation. Divergence = order-dependent or layout-dependent logic.

A second, independent axis — INPUT layout — is exercised with
``--reshard``: every table is rewritten as a multi-file copy with a
different row order (repartition round-robin), and each query runs in ONE
session against the original and the resharded directory. Sibling
sessions share identical scan splits, so only this mode catches
input-order dependence (a first() without ordering, an id minted from
partition position, a fold whose result leaks accumulation order). The
rows are bit-identical to the driver's tables — only the physical layout
changes.

A third axis — ANSI mode — runs with ``--ansi``: sibling sessions
differing ONLY in ``spark.sql.ansi.enabled`` (true = Spark 4 default,
false = every pre-4.0 cluster still in production). On clean data the
two modes differ in ERROR contracts, not values, so results must be
bit-identical; a divergence means an expression silently depends on
ANSI semantics (wrap-around overflow, lenient casts) and would return
different numbers on an older cluster.

Queries whose CONTRACT is layout-dependent are triaged in _EXPECTED;
the audit exits non-zero only on an UNEXPECTED divergence. Usage:

    PYTHONPATH=/root/repo python scripts/layout_invariance_audit.py \
        [--reshard | --ansi] [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Contract-documented layout dependence. Spark's sample()/sampleBy()/rand()
# are seeded PER PARTITION (seed + partition index drive the stream), so a
# different input/shuffle layout legitimately selects different rows; the
# determinism these queries promise — same seed + same layout => same rows
# — is pinned by their own tests, not by this audit. They pass the
# sibling-session mode (identical scan splits) but legitimately diverge
# under --reshard (different input partitioning reseeds every stream).
_EXPECTED: dict[str, str] = {
    "sampled_agg": "seeded per-partition Bernoulli sample (O5 contract)",
    "stratified_sample": "seeded per-partition sampleBy (O5 contract)",
    # corpus_weighted_sample is deliberately NOT here: its A-ES keys are
    # md5-derived (layout-free by design, and both audit modes confirm
    # it) — a divergence there would be a real regression.
    # percentile_approx merges per-partition QuantileSummaries sketches;
    # the merge ORDER (hence the input layout) moves the estimate within
    # the sketch's documented error bound. The exact twin
    # (exact_quantiles) is the invariant path; this query exists to cover
    # the approximate operator and is rows-only in the driver gate too.
    "approx_quantiles": "approximate sketch, layout-dependent by design",
    # the query's OUTPUT is per-file lineage (_metadata.file_name): a
    # different physical file set is a different correct answer — its
    # docstring promises one row per file
    "scan_file_lineage": "per-file lineage surface (physical layout IS the output)",
}

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _build_resharded(spark, sf_dir: str, out_dir: str, n_files: int = 7) -> None:
    """Rewrite each table as an n-file copy with a different row order.

    repartition() is a round-robin shuffle: rows land in different files
    in different order, but the row SET is bit-identical. Reads go through
    ``load_table`` so the events timestamp-unit sniffing applies, and
    writes inherit the session's TIMESTAMP_MICROS convention — a
    Spark-written copy is exactly what an ingest job would have produced.
    """
    from nyc_taxi_pyspark_spark.sources.io import load_table

    for t in _TABLES:
        (
            load_table(spark, sf_dir, t)
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"{t}.parquet"))
        )


def _canon_hash(pdf) -> str:
    """Order-insensitive bit-exact hash (mirrors the in-suite sweep)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    def cell(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else v.hex()
        return repr(v)

    rows = sorted(
        "|".join(cell(v) for v in rec) for rec in pdf.itertuples(index=False)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main(argv: list[str]) -> int:
    reshard = "--reshard" in argv
    ansi = "--ansi" in argv
    argv = [a for a in argv if a not in ("--reshard", "--ansi")]
    sf_dir = (
        argv[0]
        if argv and os.path.isdir(argv[0])
        else "/root/testdata/sf0.001"
    )
    only = set(argv[1:] if argv and os.path.isdir(argv[0]) else argv)

    from nyc_taxi_pyspark_spark.catalog import QUERIES
    from nyc_taxi_pyspark_spark.session import get_spark

    base = get_spark("layout-audit")
    if reshard:
        # one session, two INPUT layouts: original vs multi-file reshard
        import tempfile

        reshard_dir = tempfile.mkdtemp(prefix="reshard_")
        print(f"building resharded copy of {sf_dir} -> {reshard_dir}")
        _build_resharded(base, sf_dir, reshard_dir)
        run_a = lambda fn: fn(base, sf_dir)  # noqa: E731
        run_b = lambda fn: fn(base, reshard_dir)  # noqa: E731
    elif ansi:
        # identical layout, two ANSI modes: values must not notice
        sess_a = base.newSession()
        sess_a.conf.set("spark.sql.ansi.enabled", "true")
        sess_b = base.newSession()
        sess_b.conf.set("spark.sql.ansi.enabled", "false")
        run_a = lambda fn: fn(sess_a, sf_dir)  # noqa: E731
        run_b = lambda fn: fn(sess_b, sf_dir)  # noqa: E731
    else:
        # one input layout, two SESSION layouts (shuffle count + AQE)
        sess_a = base.newSession()
        sess_a.conf.set("spark.sql.shuffle.partitions", "3")
        sess_a.conf.set("spark.sql.adaptive.enabled", "false")
        sess_b = base.newSession()
        sess_b.conf.set("spark.sql.shuffle.partitions", "32")
        sess_b.conf.set("spark.sql.adaptive.enabled", "true")
        run_a = lambda fn: fn(sess_a, sf_dir)  # noqa: E731
        run_b = lambda fn: fn(sess_b, sf_dir)  # noqa: E731

    n_pass = n_diverge = n_error = 0
    unexpected: list[str] = []
    expected_seen: list[str] = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ha = _canon_hash(run_a(fn).toPandas())
            hb = _canon_hash(run_b(fn).toPandas())
        except Exception as e:  # noqa: BLE001
            n_error += 1
            line = f"ERROR {name}: {type(e).__name__}: {str(e)[:200]}"
            print(line, flush=True)
            # _EXPECTED documents legitimate HASH divergence, never a
            # crash — a raising query is always an audit failure, even
            # for allowlisted names (else a hard regression in e.g.
            # sampled_agg would exit 0 silently).
            unexpected.append(line)
            continue
        dt = time.time() - t0
        if ha == hb:
            n_pass += 1
            print(f"pass  {name} ({dt:.1f}s)", flush=True)
        else:
            n_diverge += 1
            line = f"DIVERGE {name}: A={ha[:12]} B={hb[:12]} ({dt:.1f}s)"
            print(line, flush=True)
            if name in _EXPECTED:
                expected_seen.append(f"{name}: {_EXPECTED[name]}")
            else:
                unexpected.append(line)

    if reshard:
        import shutil

        shutil.rmtree(reshard_dir, ignore_errors=True)

    print(f"\n{n_pass} pass, {n_diverge} diverge, {n_error} error")
    print(f"--- audit: {len(expected_seen)} documented layout-dependent ---")
    for e in expected_seen:
        print("  documented:", e)
    if unexpected:
        print(f"--- audit: {len(unexpected)} UNEXPECTED divergences ---")
        for u in unexpected:
            print("  UNEXPECTED:", u)
        return 1
    print("--- audit: catalog is layout-invariant outside documented contracts ---")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
