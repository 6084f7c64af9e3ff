"""Dataset profiling and consistent (hash-deterministic) sampling.

Profiling generalizes the reference's per-column null scan and describe
surface (``spark_jobs/02c_nulls_and_stats.py:31-52``,
``spark_jobs/02_clean_eda.py:58-66``) into a single-pass, long-form column
profiler — the "what is in this table" primitive a 100 TB ingest runs
before anything else.

Consistent sampling is the training-data counterpart of the reference's
seeded ``df.sample`` (``streamlit_app/app5.py:155``): instead of a seeded
RNG (whose output depends on partitioning), membership is a pure function
of the row key's md5, so the same rows are selected on any cluster layout,
any engine, and any rerun — which is what makes held-out splits and
ablation subsets reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-pass long-form profile: (col_name, n_rows, n_nulls, n_distinct,
    min_val, max_val) per requested column.

    Single wide aggregation -> one scan. Exact multi-column DISTINCT counts
    make Catalyst plan an Expand (input ×(n_cols+1)) feeding partial aggs —
    the standard cost of exact multi-distinct; at 100 TB swap
    ``approx_count_distinct`` in via the caller if ±2% suffices. min/max are
    stringified through DECIMAL(18,2) for doubles so every engine renders
    them identically.
    """

    def _minmax(c: str) -> tuple:
        t = dict(df.dtypes)[c]
        col = F.col(c)
        if t == "double":
            col = col.cast("decimal(18,2)")
        elif t == "timestamp":
            col = col.cast("date")
        return (
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        )

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            *_minmax(c),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return wide.select(F.inline(rows))


def consistent_sample_rate(
    df: DataFrame, key_col: str, hex_prefix_lt: str = "1"
) -> DataFrame:
    """Keep rows whose md5(key) is lexicographically below ``hex_prefix_lt``
    — e.g. ``"1"`` keeps md5s starting with '0': a deterministic ~1/16
    sample.

    A pure row-local filter: no shuffle, no RNG state, pushdown-friendly,
    and the sample is STABLE under repartitioning, retries, and engine
    swaps (md5 is md5 everywhere). This is the scale path for "give me k%
    of the corpus, the same k% every time".
    """
    fp = F.md5(F.col(key_col).cast("string"))
    return df.where(fp < F.lit(hex_prefix_lt))


def consistent_sample_per_group(
    df: DataFrame, group_cols: Sequence[str], key_col: str, k: int
) -> DataFrame:
    """Exactly ``k`` rows per group, chosen by md5(key) rank — a
    deterministic stratified sample (same rows on every run/engine).

    One shuffle on the group keys; the per-group sort is bounded by group
    size. For rate-based sampling at scale prefer
    :func:`consistent_sample_rate` (no shuffle at all).
    """
    fp = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(fp, F.col(key_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
