"""Data-quality auditing, snapshot reconciliation, and group-aware repair.

Generalizes the reference's validation surface (null scan
``spark_jobs/02c_nulls_and_stats.py:31-52``, range-rule filter battery
``spark_jobs/02_clean_eda.py:31-43``, null-fill ``spark_jobs/02c_nulls_and_
stats.py:54-63``) into the constraint-audit / table-diff / imputation
primitives a production pipeline runs before and after every load:

- :func:`dq_audit` — Deequ-style single-pass constraint report (not-null,
  set-membership, range, pattern, uniqueness) in long form.
- :func:`table_diff` — snapshot reconciliation: full-outer key join with
  null-safe column compare → added / removed / changed / same per row.
- :func:`fill_group_mean` — impute missing values with the group mean,
  computed order-independently (integer-cents window sums).

All three are one-or-two-shuffle plans with no driver-side state, so they
hold at 100 TB: the audit is a single scan + conditional aggregates; the
diff shuffles each snapshot once on the key (AQE handles skew); the
imputation is one window shuffle on the group key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dq_audit(
    df: DataFrame,
    checks: Sequence[tuple[str, Column]],
    unique_keys: Sequence[tuple[str, Sequence[str]]] = (),
) -> DataFrame:
    """Single-pass constraint audit.

    ``checks`` is ``[(constraint_name, predicate)]`` where the predicate is
    TRUE for conforming rows; ``unique_keys`` is ``[(constraint_name,
    key_cols)]`` checked as ``COUNT(*) == COUNT(DISTINCT keys)``. Returns
    one row per constraint: ``(constraint, n_rows, n_violations, passed)``.

    Plan shape: ONE scan, one hash aggregate (the distinct counts add an
    Expand, still a single pass over the data), then a constant-width
    explode on the 1-row result — no second scan per constraint, which is
    what makes a 50-constraint audit affordable at 100 TB.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in checks:
        # coalesce: SUM over zero rows is NULL — an empty input must report
        # 0 violations / passed=true, not passed=NULL
        aggs.append(
            F.coalesce(
                F.sum(F.when(pred, F.lit(0)).otherwise(F.lit(1))), F.lit(0)
            ).alias(f"__v_{name}")
        )
    for name, keys in unique_keys:
        aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(*[F.col(k) for k in keys])
            ).alias(f"__v_{name}")
        )
    one = df.agg(*aggs)
    names = [name for name, _ in checks] + [name for name, _ in unique_keys]
    rows = one.select(
        F.col("__n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("constraint"),
                        F.col(f"__v_{n}").cast("bigint").alias("n_violations"),
                    )
                    for n in names
                ]
            )
        ).alias("c"),
    )
    return rows.select(
        F.col("c.constraint").alias("constraint"),
        F.col("__n").alias("n_rows"),
        F.col("c.n_violations").alias("n_violations"),
        (F.col("c.n_violations") == 0).alias("passed"),
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Row-status reconciliation between two snapshots of a table.

    Full outer join on ``keys``; a row is ``added`` (key only in new),
    ``removed`` (key only in old), ``changed`` (key in both, any compare
    column differs under null-safe equality), else ``same``. Returns the
    coalesced keys plus ``status``.

    Columns are compared directly (null-safe ``<=>``) rather than through a
    string-concat hash: no double→string round-trip to diverge between
    engines, and Catalyst keeps the whole compare in codegen. At very wide
    schemas swap the OR-chain for ``xxhash64(struct(*cols))`` per side —
    same plan shape, one hash per row.
    """
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    # presence markers, not key-null checks: a NULL-keyed row never joins,
    # so testing the opposite side's key would misreport an old-side
    # NULL-keyed row as 'added' instead of 'removed'
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
            for k in keys
        ],
        status.alias("status"),
    )


def key_sequence_gaps(
    df: DataFrame, key: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """Ranges of missing values in an integer key sequence, computed
    partition-parallel.

    Never a single-task global LEAD: ``repartitionByRange`` on the key,
    LEAD *within* each range partition, then a boundary handoff — each
    partition's last row (in-partition LEAD is NULL) takes the NEXT
    partition's minimum key as its successor. The handoff table is one row
    per non-empty partition (bounded by the shuffle-partition count, never
    by data volume), so its own LEAD window and the broadcast join back
    are O(partitions). Output — ``(gap_start, gap_end, n_missing)`` — is
    identical to the global form for ANY boundary placement, so the range
    partitioner's sampling nondeterminism is invisible — PROVIDED both
    physical subtrees below (the in-partition LEAD and the boundary min
    aggregate) read the SAME placement. Exchange reuse usually guarantees
    that, but it is an optimizer courtesy, not a contract (AQE can re-plan
    one branch; RangePartitioner sampling is nondeterministic per run), so
    the keyed frame is pinned with an eager lineage cut before branching:
    one materialization, and both branches provably consume the identical
    pid→range mapping. ``checkpoint_dir`` picks the cut strategy
    (operators/iterative.py): executor-pinned localCheckpoint by default,
    reliable ``checkpoint`` to durable storage for cluster runs where the
    pinned key column must survive executor loss. Assumes distinct keys
    (duplicates are never reported as gaps either way).
    """
    from nyc_taxi_pyspark_spark.operators.iterative import cut_lineage

    keys = cut_lineage(
        df.select(key)
        .repartitionByRange(key)
        .withColumn("__pid", F.spark_partition_id()),
        checkpoint_dir,
    )
    w_in = Window.partitionBy("__pid").orderBy(key)
    with_lead = keys.withColumn("__next_in", F.lead(key).over(w_in))
    # range partitions are monotone in partition id, so LEAD over this
    # tiny per-partition table is the next non-empty range's minimum
    bounds = keys.groupBy("__pid").agg(F.min(key).alias("__pmin"))
    handoff = bounds.select(
        "__pid",
        F.lead("__pmin").over(Window.orderBy("__pid")).alias("__next_min"),
    )
    joined = with_lead.join(F.broadcast(handoff), "__pid", "left")
    next_key = F.coalesce(F.col("__next_in"), F.col("__next_min"))
    return joined.filter(next_key - F.col(key) > 1).select(
        (F.col(key) + 1).alias("gap_start"),
        (next_key - 1).alias("gap_end"),
        (next_key - F.col(key) - 1).alias("n_missing"),
    )


def fill_group_mean(
    df: DataFrame,
    group_cols: Sequence[str],
    col: str,
    scale: int = 2,
    broadcast_means: bool = True,
) -> DataFrame:
    """Impute nulls in ``col`` with the group mean, order-independently.

    The mean is an exact integer-cents sum divided by the non-null count
    (see functions/exact.py for why this is bit-stable across engines and
    partitionings where ``AVG(double)`` is not).

    Plan (r13 re-plan, caught by the plan audit's low-cardinality-window
    axis): a grouped AGGREGATE broadcast-joined back, not an unordered
    group window. The window form hash-shuffled EVERY row on the group
    key — with a type/flag-grade key that is #distinct-values tasks over
    the whole table at any cluster width. The aggregate form map-side
    combines to one row per group and the fact never shuffles at all.

    CONTRACT (ADVICE r13): the default ``broadcast_means=True`` requires
    the GROUP-KEY CARDINALITY to be broadcast-sized (one means row per
    distinct key must fit an executor/driver broadcast — the type/flag/
    category keys this engine uses it for). For a high-cardinality key
    (user_id-grade), pass ``broadcast_means=False``: the plan falls back
    to a shuffle join that AQE still converts to broadcast at runtime
    when the means frame turns out small — slower, never OOM.

    The join is NULL-SAFE on the group keys: a window PARTITION BY puts
    null-keyed rows in one group (both engines), so the join twin must
    match them too or null-keyed holes would silently stay null.
    """
    cents = F.round(F.col(col) * F.lit(float(10**scale))).try_cast("bigint")
    means = df.groupBy(*group_cols).agg(
        (
            (F.sum(cents).cast("double") / F.lit(float(10**scale)))
            / F.count(F.col(col))
        ).alias("__grp_mean")
    )
    for c in group_cols:
        means = means.withColumnRenamed(c, f"__g_{c}")
    cond = F.lit(True)
    for c in group_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__g_{c}"))
    if broadcast_means:
        means = F.broadcast(means)
    return (
        df.join(means, cond, "left")
        .withColumn(col, F.coalesce(F.col(col), F.col("__grp_mean")))
        .drop("__grp_mean", *[f"__g_{c}" for c in group_cols])
    )
