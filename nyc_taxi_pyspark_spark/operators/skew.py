"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in the session defaults) handles most
skew at runtime; explicit salting remains the tool for EXTREME single-key
skew in aggregations and joins — a hot key whose single post-shuffle
partition would exceed executor memory no matter how AQE splits input
splits.

Both helpers preserve exact results: salted aggregation re-aggregates the
partials (valid for algebraic aggregates — sums/counts/min/max, including
the engine's integer-cents sums, which are plain additive longs); the
salted join replicates the small side per salt, so the join set is
unchanged and only the left side's hash distribution widens.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salt: int, cols: Sequence[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, n_salt): xxhash64 of the row's columns —
    stable across retries (no rand()), uniform enough to split a hot key."""
    cols = list(cols or df.columns)
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt))
    )


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    measures: dict[str, Column],
    finals: dict[str, Column],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) finals. ``measures`` computes the partials; ``finals``
    recombines them (column names refer to partial aliases)."""
    partial = (
        with_salt(df, n_salt)
        .groupBy(*keys, "__salt")
        .agg(*[c.alias(n) for n, c in measures.items()])
    )
    return partial.groupBy(*keys).agg(*[c.alias(n) for n, c in finals.items()])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 16,
) -> DataFrame:
    """Equi-join with the hot-key shuffle split n_salt ways: left rows get a
    deterministic salt, the (small) right side is replicated once per salt
    value, and the join key becomes (key, salt)."""
    lsalted = with_salt(left, n_salt)
    rexpl = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = lsalted.join(rexpl, [key, "__salt"])
    return out.drop("__salt")
