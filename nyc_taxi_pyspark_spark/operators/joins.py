"""Join operators (SURVEY.md §2.3).

The reference contains exactly one join — a broadcast left equi-join to a
6-row dimension (spark_jobs/02e_join_lookup.py:57-59). The engine generalizes
to the full idiomatic Spark join surface and adds the two join shapes a
100 TB pipeline needs that Spark lacks natively: as-of join and range join.

Scale strategy per shape:
  - dim enrich        → broadcast hash join (no shuffle of the fact side)
  - fact ⋈ fact       → sort-merge on the keys; AQE converts to broadcast /
                        splits skewed partitions at runtime
  - semi/anti         → left_semi / left_anti (no payload shuffle of right)
  - range join        → broadcast nested-loop against a small bucket dim, or
                        bucketize-the-range-key + equi-join when both sides
                        are large
  - as-of join        → union + partitioned window scan: ONE shuffle on
                        (by-keys), no per-row lookups, no skew cliff — the
                        standard distributed as-of formulation
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def enrich_with_lookup(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """J1 — broadcast dimension enrich, preserving unmatched fact rows
    (reference spark_jobs/02e_join_lookup.py:57-59)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (direction="backward", the default) or the
    earliest right row with ``right_ts >= left_ts`` ("forward") within the
    same ``by`` group.

    Implemented as union + window (last/first_value ignoring nulls over a
    one-sided row frame): a single shuffle on ``by``, linear scan per
    group — the scalable distributed formulation. At equal timestamps the
    right row sorts on the frame side of the left row, so ties match in
    both directions (<= / >= semantics, same as DuckDB's ASOF JOIN).
    """
    assert direction in ("backward", "forward"), direction
    lcols = left.columns
    tagged_left = left.withColumn("__is_left", F.lit(1))
    for c in value_cols:
        tagged_left = tagged_left.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    tagged_right = right.select(
        F.col(by),
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    for c in lcols:
        if c not in (by, left_ts):
            tagged_right = tagged_right.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = tagged_left.unionByName(tagged_right)
    if direction == "backward":
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(left_ts).asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(f"__r_{c}", ignorenulls=True).over(w)  # noqa: E731
    else:
        # left rows sort BEFORE right rows at equal ts, so the
        # current..following frame still sees an equal-ts right row
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(left_ts).asc(), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(f"__r_{c}", ignorenulls=True).over(w)  # noqa: E731
    filled = unioned.select(
        *lcols,
        F.col("__is_left"),
        *[pick(c).alias(f"asof_{c}") for c in value_cols],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")


def range_join_buckets(
    fact: DataFrame,
    buckets: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Range join of a fact value column against [lo, hi) bucket intervals.

    With a small bucket dim this is a broadcast nested-loop join — each fact
    partition streams against the in-memory dim, no shuffle. (For two large
    sides, bucketize the range key to an equi-join first.)
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(buckets), on=cond, how="left")


def runtime_bloom_session(spark):
    """Sibling session tuned for runtime Bloom-filter join injection —
    the 100 TB shuffle-join complement to broadcast pruning: when the
    selective side is too big to broadcast, Catalyst builds a Bloom
    filter from its join keys at runtime and pushes a ``might_contain``
    probe into the fact-side scan, discarding non-joining rows before
    the shuffle instead of after it.

    Spark gates the rewrite on size thresholds tuned for clusters
    (application side ≥ 10 GB by default), so at test scale the knobs
    are lowered to make the injection observable; broadcast is disabled
    to force the shuffle-join plan the filter exists for. Sibling-
    session scoped: the shared session's broadcast behavior is
    untouched."""
    s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold",
        "0",
    )
    s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB",
    )
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return s
