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


def zorder_key(qcols: list, bits: int = 16):
    """Morton (Z-curve) interleave of pre-quantized non-negative int
    columns: bit b of column j lands at position b·n_cols + j. Pure
    shift/mask expressions — whole-stage codegen, no UDF. n_cols·bits must
    stay < 63 (int64)."""
    from pyspark.sql import functions as F

    c = len(qcols)
    if c * bits > 62:
        raise ValueError(f"{c} cols x {bits} bits exceeds int64")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for j, q in enumerate(qcols):
            z = z + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * c + j
            )
    return z


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Multi-column cluster on write via Z-curve interleaving — the layout
    lakehouse OPTIMIZE ZORDER BY produces.

    Range-clustering (``write_clustered``) gives one column perfect
    file-level locality and the others none; interleaving the quantized
    bits of k columns gives EVERY listed column ~1/2^(bits_used/k) range
    locality per row group, so min/max stats prune selective predicates on
    any of them. That trade is what a 100 TB fact table filtered sometimes
    by key A and sometimes by key B needs: neither scan degenerates to
    full-table.

    Columns are linearly quantized to [0, 2^bits) from their observed
    min/max (one tiny agg job at write time). Linear quantization assumes
    roughly uniform keys; for heavy skew substitute rank-based bucket ids —
    the interleave and write path are unchanged.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"mn{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"mx{i}") for i, c in enumerate(cols)],
    ).head()
    qcols = []
    for i, cname in enumerate(cols):
        mn, mx = stats[f"mn{i}"], stats[f"mx{i}"]
        if mn is None or mx is None or mx <= mn:
            qcols.append(F.lit(0).cast("bigint"))
            continue
        scale = float(2**bits - 1) / float(mx - mn)
        qcols.append(
            F.floor((F.col(cname) - F.lit(mn)).cast("double") * F.lit(scale)).cast(
                "bigint"
            )
        )
    z = zorder_key(qcols, bits)
    out = df.withColumn("__z", z)
    out = (
        out.repartitionByRange(n_files, "__z")
        if n_files
        else out.repartitionByRange("__z")
    )
    out.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout (``partitionBy`` directories).

    Partition columns become directory keys, so a filter on them is
    PartitionFilters-level pruning: pruned directories are never even
    listed, cheaper still than footer-stats skipping. The standard 100 TB
    fact layout is partition on the coarse key (event date) + cluster
    within partitions on the fine key (``write_clustered``/``write_zorder``).
    """
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def compact_files(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
    out_path: str | None = None,
) -> int:
    """Small-file compaction: write the parquet directory's rows to a NEW
    directory (``out_path``, default ``path + "_compacted"``) as
    ceil(rows/target) evenly-sized files. Returns the new file count.
    The output must differ from the input: overwriting the directory a
    lazy plan is still reading would clobber the input mid-scan — a real
    lakehouse OPTIMIZE stages new files and commits a metadata swap.

    Streaming ingest and over-parallel writes leave thousands of KB-sized
    files; each costs a task + a footer read + object-store request, and at
    100 TB the file count — not the byte count — becomes the scheduler
    bottleneck. Compaction is the OPTIMIZE half of lakehouse maintenance
    (``write_clustered``/``write_zorder`` are the ZORDER half); rewriting
    through ``repartition`` (round-robin) sizes files evenly without
    skew-sensitivity to the input layout.
    """
    import os

    dest = out_path or path + "_compacted"
    if os.path.abspath(dest) == os.path.abspath(path):
        raise ValueError(
            "compact_files: out_path must differ from path — mode('overwrite') "
            "on the directory being lazily re-read clobbers the input mid-scan"
        )
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(dest)
    return n_files
