"""Enforce the approx_percentile exact-mode precondition at oracle SFs.

Several catalog queries (``histogram_equidepth``, ``customer_rfm``,
``orders_pareto_share``, ``events_value_winsorized``, ``events_qq_compare``,
``events_watermark_tuning``, ``group_quantiles``, ``lineitem`` p99) hash-gate
Spark's ``approx_percentile`` sketch against DuckDB's exact
``quantile_disc``. That adjudication is only sound while the aggregated
input cardinality stays under the sketch's accuracy parameter (1e6 for the
global sketches, 1e5 for the per-``event_type`` grouped one): below the
bound the sketch is exact; past it the oracle silently flips from
adjudicating to false-failing (ADVICE r7, catalog/quality.py:853).

The queries themselves must NOT raise past the bound — at 100 TB the sketch
degrades gracefully to its documented approximate semantics and only the
oracle comparison becomes invalid — so the guard lives here: if a driver SF
ever breaches a bound, this test fails and the affected queries must be
downgraded to rows-only (drop their oracle_sql entries) before re-running
parity. Counts come from parquet footers (no Spark session needed).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

TESTDATA = "/root/testdata"
ORACLE_SFS = ["sf0.001", "sf0.01", "sf0.1"]

# (table, accuracy bound, queries relying on it)
GLOBAL_SKETCH_BOUNDS = [
    ("orders", 1_000_000, "histogram_equidepth / orders_pareto_share"),
    (
        "events",
        1_000_000,
        "events_value_winsorized / events_qq_compare / "
        "events_watermark_tuning",
    ),
    ("customer", 1_000_000, "customer_rfm"),
    ("lineitem", 1_000_000, "lineitem p99 latency"),
]


def _sf_dirs():
    return [
        os.path.join(TESTDATA, sf)
        for sf in ORACLE_SFS
        if os.path.isdir(os.path.join(TESTDATA, sf))
    ]


@pytest.mark.parametrize("table,bound,users", GLOBAL_SKETCH_BOUNDS)
def test_global_sketch_inputs_under_accuracy_bound(table, bound, users):
    for d in _sf_dirs():
        path = os.path.join(d, f"{table}.parquet")
        n = pq.read_metadata(path).num_rows
        assert n <= bound, (
            f"{path} has {n} rows > sketch accuracy {bound}; "
            f"approx_percentile is no longer exact there — downgrade "
            f"{users} to rows-only before trusting hash parity"
        )


def test_grouped_sketch_inputs_under_accuracy_bound():
    # group_quantiles sketches per event_type with accuracy 1e5 — the
    # bound applies to the LARGEST group, not the table.
    bound = 100_000
    for d in _sf_dirs():
        t = pq.read_table(
            os.path.join(d, "events.parquet"), columns=["event_type"]
        )
        counts = t.column("event_type").value_counts()
        biggest = max(
            row["counts"].as_py() for row in counts
        )
        assert biggest <= bound, (
            f"{d}/events.parquet: largest event_type group {biggest} > "
            f"sketch accuracy {bound}; downgrade group_quantiles to "
            f"rows-only"
        )
