"""Incremental aggregate maintenance: mergeable partial states.

At 100 TB you cannot recompute a KPI rollup from scratch every time a new
day of data lands. The standard fix — what materialized-view maintenance,
Spark's own partial/final aggregation, and every incremental ETL framework
rely on — is to keep the aggregate as a *mergeable state* per group:

    state(base UNION delta) == merge(state(base), state(delta))

which holds exactly for algebraic aggregates (count, sum, min, max, and
anything derivable from them, e.g. avg = sum/count). The refresh cost is
then O(|delta| + |affected groups|), not O(|base|).

Exactness discipline: the sum component is kept as integer cents
(:mod:`~nyc_taxi_pyspark_spark.functions.exact`), so merging is integer
addition — associative, commutative, and bit-identical no matter how the
input was split or partitioned. A double-sum state would drift under
re-splitting (float addition is not associative) and break both the merge
law and the cross-engine hash gate. Holistic aggregates (exact medians,
distinct counts) have no bounded mergeable state — they need sketches
(see ``approx_quantiles`` / ``sketch_hll_union_distinct``) or a recompute.

``catalog/aggregates.orders_incremental_kpis`` drives the full cycle
(split -> partial states -> merge -> finalize) against a one-shot oracle;
``tests/test_heavy.py`` pins the merge law itself under random splits.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def partial_agg_state(
    df: DataFrame,
    key_cols: list[str],
    value_col: str | Column,
    scale: int = 2,
) -> DataFrame:
    """Per-group mergeable state over a slice of the data.

    Columns: keys..., ``n`` (non-null value count), ``sum_cents``
    (exact integer sum at ``scale`` decimal digits), ``min_v``, ``max_v``.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    cents = F.round(v * F.lit(float(10**scale))).try_cast("bigint")
    return df.groupBy(*key_cols).agg(
        F.count(v).alias("n"),
        F.sum(cents).alias("sum_cents"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_agg_states(*states: DataFrame) -> DataFrame:
    """Merge any number of partial states; same schema out.

    Integer adds for n/sum_cents, min/max for the extrema — associative
    and commutative, so any merge tree (pairwise, all-at-once, repeated
    over many deltas) yields the identical state.
    """
    key_cols = [
        c for c in states[0].columns
        if c not in ("n", "sum_cents", "min_v", "max_v")
    ]
    return (
        reduce(DataFrame.unionByName, states)
        .groupBy(*key_cols)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def finalize_agg_state(state: DataFrame, scale: int = 2) -> DataFrame:
    """Derive the presented aggregates from a state.

    ``sum_v`` and ``avg_v`` reproduce :func:`functions.exact.dsum` /
    ``davg`` float-op-for-float-op ((cents as double / 10^s), then / n),
    so a finalized merged state is hash-identical to a direct one-shot
    aggregate of the union.
    """
    denom = F.lit(float(10**scale))
    sum_v = F.col("sum_cents").cast("double") / denom
    return state.select(
        *[c for c in state.columns if c not in ("n", "sum_cents", "min_v", "max_v")],
        F.col("n"),
        sum_v.alias("sum_v"),
        (sum_v / F.col("n")).alias("avg_v"),
        F.col("min_v"),
        F.col("max_v"),
    )
