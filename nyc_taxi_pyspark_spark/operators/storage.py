"""Storage-layout operators for shuffle avoidance at scale.

Bucketing pre-partitions a table on its join/agg key at WRITE time so every
later join or aggregation on that key is co-located — the single biggest
shuffle eliminator for repeated 100 TB fact⋈fact joins. Locally this uses
the Spark warehouse (managed tables); on a cluster the same API writes to
the metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets lets a later sort-merge join skip its sort too —
    the plan degenerates to a zip-merge of co-located, pre-sorted buckets.
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: str | list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-cluster on write: ``repartitionByRange`` + in-partition sort.

    Every output file — and every parquet row group inside it — then covers
    a narrow, disjoint slice of the cluster key, so the footer min/max
    statistics let a later selective scan skip whole files and row groups
    instead of reading and filtering them. This is the write-time half of
    predicate pushdown: pushdown decides WHAT can be skipped, clustering
    decides HOW MUCH actually is. At 100 TB, clustering the fact table on
    its dominant filter column (event date, typically) turns a full scan
    into a touch of the few files whose range matches; the same layout is
    what lakehouse OPTIMIZE/ZORDER approximates for one dimension.

    The range repartition samples key quantiles (one extra Spark job) —
    a write-time cost paid once, amortized over every later read.
    """
    cols = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
    out = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables: no Exchange on either side (verified
    by tests via plan inspection)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
