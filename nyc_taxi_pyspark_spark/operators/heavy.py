"""Distributed heavy hitters: Misra-Gries candidate pruning + exact verify.

The scale problem: exact frequency mining over a 100 TB corpus vocabulary
(`explode(tokens) -> groupBy(token)`) shuffles one row per token occurrence
and materialises hash-agg state proportional to the *distinct* vocabulary —
both explode at web scale. The classic fix is a two-phase plan:

1. **Candidate pruning** — each input partition maintains a Misra-Gries
   summary with ``k`` counters (Misra & Gries 1982; the *mergeable
   summaries* batched form of Agarwal et al., PODS 2012). A partition over
   ``n_p`` items emits at most ``k`` ``(item, lb)`` rows where ``lb``
   undercounts the partition-local frequency by at most ``n_p / k``.
   Summing the per-partition summaries keeps the bound additive: for every
   item, ``true_count - sum(lb) <= n / k``. Hence **every item with global
   frequency > n/k survives with a positive merged count** — the candidate
   set is a guaranteed superset of the heavy hitters, yet the shuffle it
   feeds is at most ``k x num_partitions`` rows instead of ``n``.
2. **Exact verify** — the (tiny) candidate set is broadcast back against
   the token stream as a semi-join, and only the surviving occurrences are
   counted exactly. Output = exact counts, so the operator is
   deterministic, order/partitioning-invariant, and oracle-checkable with
   plain ``GROUP BY ... HAVING`` SQL.

Reference parity: the reference repo's frequency analyses are driver-side
pandas ``value_counts`` (see SURVEY.md section 2.4 A4 "group-count desc");
this module is the scale-first re-expression for cardinalities where the
full group-by state no longer fits.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def misra_gries_partial(
    df: DataFrame,
    item_col: str | Column,
    k: int,
    emit_total: bool = False,
) -> DataFrame:
    """Per-partition Misra-Gries summaries via ``mapInPandas``.

    Returns a DataFrame ``(item string, lb bigint)`` with at most ``k``
    rows per input partition. ``lb`` is a lower bound on the partition's
    frequency of ``item``; the undercount is at most ``n_p / k``.

    Batches are folded with the mergeable-summaries reduce: add the
    batch's exact ``value_counts`` to the running counters, then — if more
    than ``k`` survive — subtract the ``(k+1)``-th largest count from all
    and drop the non-positives. Each prune charges its subtraction against
    the mass it removes, preserving the ``n_p / k`` error bound; the
    per-batch work is vectorised pandas, never a per-row Python loop.

    ``emit_total=True`` additionally emits one sentinel row per partition
    with ``item IS NULL`` and ``lb`` = the partition's count of non-null
    items. NULL can never collide with a real candidate (value_counts
    drops nulls before counting), so the caller gets the exact global
    non-null total from ``SUM(lb) WHERE item IS NULL`` without a second
    pass over the stream.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    projected = df.select(
        (F.col(item_col) if isinstance(item_col, str) else item_col)
        .cast("string")
        .alias("item")
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        n_seen = 0
        for batch in batches:
            vc = batch["item"].dropna().value_counts()
            n_seen += int(vc.sum())
            counters = counters.add(vc, fill_value=0).astype("int64")
            if len(counters) > k:
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters.sub(cut)
                counters = counters[counters > 0]
        if len(counters):
            yield pd.DataFrame(
                {"item": counters.index.astype(str), "lb": counters.values}
            )
        if emit_total:
            yield pd.DataFrame({"item": [None], "lb": [n_seen]})

    return projected.mapInPandas(summarize, schema="item string, lb long")


def heavy_hitters_exact(
    df: DataFrame, item_col: str | Column, k: int
) -> DataFrame:
    """Exact items with frequency strictly above ``total/k`` (phi = 1/k).

    Plan: MG candidate pruning (bounded per-partition state, ~k rows per
    partition into the merge shuffle) -> broadcast the candidate set ->
    semi-join the token stream -> exact count of survivors only ->
    ``HAVING cnt * k > total`` (integer compare; no float threshold).
    Returns ``(item, n_occ)`` ordered by ``n_occ`` desc, then item.
    """
    from nyc_taxi_pyspark_spark.operators.iterative import cut_lineage

    col = F.col(item_col) if isinstance(item_col, str) else item_col
    items = df.select(col.cast("string").alias("item"))
    # the global non-null total rides the SAME MG pass as NULL-item
    # sentinel rows (one per partition): the old separate
    # ``items.agg(count)`` was a full second pass over the stream — at
    # corpus scale a whole extra table read per call. The merged summary
    # (≤ k·P candidate rows + 1 total row) is lineage-cut so the two
    # consumers below read the materialized sketch instead of re-running
    # the Python pass per reference.
    merged = cut_lineage(
        misra_gries_partial(items, "item", k, emit_total=True)
        .groupBy("item")
        .agg(F.sum("lb").alias("lb")),
        None,
    )
    candidates = (
        merged.where(F.col("item").isNotNull() & (F.col("lb") > 0))
        .select("item")
    )
    total = merged.where(F.col("item").isNull()).select(
        F.col("lb").alias("_total")
    )
    return (
        items.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").cast("bigint").alias("n_occ"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n_occ") * F.lit(k) > F.col("_total"))
        .select("item", "n_occ")
        .orderBy(F.desc("n_occ"), "item")
    )
