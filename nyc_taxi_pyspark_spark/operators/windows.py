"""Window-function operators (SURVEY.md §2.5 — absent in the reference,
added as the idiomatic way to express per-group ranking/analytics that the
reference can only do globally via A8).

Scale: every window here partitions by a key (never a global
``Window.orderBy`` without partitioning, which funnels all data through one
task). Running/rolling double sums go through the exact-decimal scheme so
results are engine-portable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def ranked(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    rank_fn=F.row_number,
    alias: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(alias, rank_fn().over(w))


def top_n_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    n: int,
) -> DataFrame:
    """Top-N per group — the canonical window use. order_by must be a total
    order (include a unique tie-breaker) for deterministic results."""
    return ranked(df, partition_by, order_by).filter(F.col("rn") <= n)


def running_dsum(col: str, w: WindowSpec, scale: int = 2) -> Column:
    """Order-independent running sum: decimal accumulation over the frame,
    cast back to double (both engines produce identical values regardless of
    how their window aggregators associate the additions)."""
    return (
        F.sum(F.col(col).cast(f"decimal(18,{scale})"))
        .over(w)
        .cast("double")
    )
