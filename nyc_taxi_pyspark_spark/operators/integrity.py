"""Dataset content fingerprints — integrity / reproducibility audits.

A 100 TB training corpus is rebuilt, recompacted, and replicated; "is this
STILL the same data?" needs an answer cheaper than a full diff. The
fingerprint here is ORDER-INDEPENDENT (bit_xor of per-row hashes), so it is
invariant under repartitioning, file compaction, and row reordering — the
transformations that must NOT change a dataset — while any value change,
row loss, or duplication flips it. XOR keeps the aggregate overflow-free at
any row count (unlike an integer sum) and mergeable across partitions,
files, and days.

Caveat (documented, inherent to XOR): inserting the SAME row twice cancels
out in the xor lane; the row count in the same manifest catches that case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex digits < 2^60: fits a BIGINT with headroom, keeps the DuckDB twin
# a plain fold with no modulus.
_HEX_DIGITS = 15


def row_hash(key: Column) -> Column:
    """Per-row BIGINT hash of a canonical key string (md5 → first 15 hex)."""
    return F.conv(F.substring(F.md5(key), 1, _HEX_DIGITS), 16, 10).cast("bigint")


def content_fingerprint(df: DataFrame, key: Column) -> DataFrame:
    """One row: (n_rows, fingerprint). ``key`` must be a deterministic
    canonical string per row (cast floats to scaled ints, dates to ISO
    strings — raw float/timestamp casts differ between engines)."""
    return df.select(row_hash(key).alias("h")).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.expr("bit_xor(h)").alias("fingerprint"),
    )


def duck_row_hash(key_sql: str) -> str:
    """DuckDB twin of :func:`row_hash` — Horner fold of the first 15 md5
    hex digits (no modulus; < 2^60)."""
    return (
        f"list_reduce(list_transform(split(md5({key_sql})[1:{_HEX_DIGITS}], ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
        "(acc, x) -> acc * 16 + x)"
    )
