"""Set operations (SURVEY.md §2.7 — absent in the reference; needed the
moment a second month of data exists, per the survey's multi-month note).

``union_by_name`` is the safe union: the positional ``union`` silently
misaligns columns when two extracts disagree on column order — a real hazard
for month-partitioned ingest.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_by_name(*dfs: DataFrame, allow_missing: bool = False) -> DataFrame:
    """N-way unionByName (schema-aligned union)."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs
    )


def intersect_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL EXCEPT (set semantics). Note ``exceptAll`` is the *bag* variant —
    it subtracts per-occurrence and would keep a key that merely appears more
    often in ``a`` than ``b``; both are exposed, this one matches EXCEPT."""
    return a.subtract(b)
