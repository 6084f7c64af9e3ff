"""Whole-catalog empty-input sweep (VERDICT r7 item 8).

Every registered query must behave on zero-row tables: either run to
completion with count-semantics columns equal to 0 (never SUM's NULL), or
fail with the documented clean ``ValueError`` contract for parameterized
similarity queries whose parameter row (query vector, centroid seeds,
k-means/PQ seeds) cannot exist in an empty corpus. Anything else — raw
AnalysisException, TypeError from a driver-side ``head()[...]``, NULL in a
count column — is an empty-input defect.

Value-statistics columns (min/max/avg/quantiles/corr/recall/...) are
allowed to be NULL on empty input: that is the honest SQL answer, and the
DuckDB oracles return the same NULLs, so hash parity holds at sf0.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
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
)

# columns with count semantics: must be 0 (not NULL) on empty input
_COUNT_PREFIXES = ("n_", "num_", "count", "total_", "token_budget")

# the documented clean-failure contract for parameter-lookup queries
_ALLOWED_ERRORS = (
    "query vector vec_id=0 not found",
    "no centroid vectors",
    "no PQ seed vectors",
    "no k-means seed vectors",
)


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("emptysf")
    for t in TABLES:
        schema = pq.read_schema(
            f"/root/testdata/sf0.001/{t}.parquet"
        ).remove_metadata()
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


def test_every_query_handles_empty_input(spark, empty_sf_dir):
    import __spark_entry__ as entry

    failures = []
    for name, fn in entry.queries().items():
        try:
            rows = fn(spark, empty_sf_dir).collect()
        except ValueError as ex:
            if not any(a in str(ex) for a in _ALLOWED_ERRORS):
                failures.append(f"{name}: unexpected ValueError: {ex}")
            continue
        except Exception as ex:  # noqa: BLE001 — collecting a report
            failures.append(
                f"{name}: {type(ex).__name__}: {str(ex).splitlines()[0][:140]}"
            )
            continue
        for r in rows:
            for k, v in r.asDict().items():
                if v is None and (
                    k.startswith(_COUNT_PREFIXES)
                    or k.endswith("_nulls")
                    or k in ("n", "cnt")
                ):
                    failures.append(f"{name}: count column {k} is NULL")
    assert not failures, "\n".join(failures)
