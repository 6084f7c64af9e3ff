"""Lakehouse-format connectors (Delta / Iceberg / Hudi) — gated stubs.

The table-format jars are not on this environment's classpath, so these
readers/writers detect availability and fail with an actionable message
instead of an opaque ClassNotFoundException. The MERGE/SCD2 capability the
formats provide is emulated natively in :func:`merge_upsert` (anti-join +
union), which is format-agnostic and runs anywhere.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# catalog.db.table — plain identifier parts only; anything fancier must go
# through a typed API, not string interpolation into MERGE SQL
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")

_FORMATS = ("delta", "iceberg", "hudi")


def format_available(spark: SparkSession, fmt: str) -> bool:
    """Probe whether a lakehouse format's classes are on the classpath."""
    probes = {
        "delta": "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        "iceberg": "org.apache.iceberg.spark.SparkCatalog",
        "hudi": "org.apache.hudi.DefaultSource",
    }
    try:
        spark._jvm.java.lang.Class.forName(probes[fmt])
        return True
    except Exception:  # noqa: BLE001 — Py4J wraps ClassNotFound opaquely
        return False


def read_table(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unknown lakehouse format {fmt!r}; one of {_FORMATS}")
    if not format_available(spark, fmt):
        raise NotImplementedError(
            f"{fmt} jars are not on the classpath in this environment; add the "
            f"spark-{fmt} package to spark.jars.packages to enable this reader"
        )
    return spark.read.format(fmt).load(path)


def read_table_as_of(
    spark: SparkSession,
    fmt: str,
    path: str,
    version: int | None = None,
    timestamp: str | None = None,
) -> DataFrame:
    """Time-travel read — the ``VERSION AS OF`` / ``TIMESTAMP AS OF`` the
    lakehouse formats provide natively (Delta ``versionAsOf`` /
    ``timestampAsOf``; Iceberg ``snapshot-id`` / ``as-of-timestamp``; Hudi
    ``as.of.instant``), completing the staged-batch story next to
    :func:`delta_merge_upsert`: reproduce yesterday's training set from
    today's table, diff two snapshot states, audit a bad merge. Exactly
    one of ``version``/``timestamp`` must be given. The format-agnostic
    emulation of the same capability is ``scd2_close_and_insert`` +
    ``scd2_point_in_time_join`` (catalog), which run anywhere; this is
    the formats-native path behind the same availability gate as MERGE
    (tests/test_sinks_lakehouse.py runs it in a subprocess where the
    delta jars exist, and skips cleanly here)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown lakehouse format {fmt!r}; one of {_FORMATS}")
    if (version is None) == (timestamp is None):
        raise ValueError("pass exactly one of version= or timestamp=")
    if fmt == "hudi" and version is not None:
        raise ValueError("hudi time travel is timestamp-based; pass timestamp=")
    if not format_available(spark, fmt):
        raise NotImplementedError(
            f"{fmt} jars are not on the classpath in this environment; add the "
            f"spark-{fmt} package to spark.jars.packages to enable time travel"
        )
    reader = spark.read.format(fmt)
    if fmt == "delta":
        reader = (
            reader.option("versionAsOf", version)
            if version is not None
            else reader.option("timestampAsOf", timestamp)
        )
    elif fmt == "iceberg":
        reader = (
            reader.option("snapshot-id", version)
            if version is not None
            else reader.option("as-of-timestamp", timestamp)
        )
    else:  # hudi
        reader = reader.option("as.of.instant", timestamp)
    return reader.load(path)


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Format-agnostic MERGE emulation: rows of ``target`` whose key has an
    update are replaced; new keys are inserted. (With Delta/Iceberg on the
    classpath this becomes a real transactional MERGE INTO —
    :func:`delta_merge_upsert`.)"""
    untouched = target.join(updates.select(*keys), list(keys), "left_anti")
    return untouched.unionByName(updates)


def delta_merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
) -> None:
    """REAL transactional MERGE INTO against a Delta table at
    ``target_path`` — update-all on key match, insert-all otherwise: the
    same row semantics :func:`merge_upsert` emulates, so the two are
    interchangeable and the conditional test asserts their equivalence
    when the jars are present (tests/test_sinks_lakehouse.py). Requires
    the delta-spark package + jars (optional dev dependency in
    pyproject.toml); raises the same actionable NotImplementedError as
    :func:`read_table` where they are absent."""
    if not format_available(spark, "delta"):
        raise NotImplementedError(
            "delta jars are not on the classpath in this environment; "
            "install the delta-spark extra and build the session via "
            "delta.configure_spark_with_delta_pip to enable real MERGE INTO"
        )
    from delta.tables import DeltaTable  # gated: optional dev dependency

    cond = " AND ".join(f"t.{k} = u.{k}" for k in keys)
    (
        DeltaTable.forPath(spark, target_path)
        .alias("t")
        .merge(updates.alias("u"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def iceberg_merge_upsert(
    spark: SparkSession,
    table_ident: str,
    updates: DataFrame,
    keys: Sequence[str],
) -> None:
    """REAL transactional MERGE INTO against an Iceberg table — the
    Iceberg twin of :func:`delta_merge_upsert`, completing the lakehouse
    story for both mainstream formats. Same row semantics as the
    format-agnostic :func:`merge_upsert` (update-all on key match,
    insert-all otherwise), so all three are interchangeable and the
    conditional test asserts equivalence where the runtime exists
    (tests/test_sinks_lakehouse.py, gated on ICEBERG_SPARK_RUNTIME_JAR).

    ``table_ident`` is a CATALOG identifier (e.g. ``local.db.t``), not a
    path: unlike Delta's path-first python API, Iceberg's MERGE goes
    through the Spark SQL extensions against a configured catalog
    (``spark.sql.extensions = …IcebergSparkSessionExtensions`` plus a
    ``spark.sql.catalog.<name>`` entry), so the session must be built
    with those confs — raises the same actionable NotImplementedError as
    the other gated paths where the runtime jar is absent. The updates
    frame is exposed to SQL through a uuid-suffixed temp view, dropped in
    a finally (concurrent serving threads never collide on the name)."""
    # Identifiers are interpolated into SQL (unlike the Delta path, which
    # goes through a typed API): validate the table identifier against the
    # catalog-path grammar and backtick-quote every key so a column named
    # with a space/keyword still parses — and an untrusted string cannot
    # smuggle extra SQL into the statement (ADVICE r12). Validation runs
    # BEFORE the availability gate so bad input fails the same way with
    # and without the runtime jar.
    if not _IDENT_RE.match(table_ident):
        raise ValueError(
            f"iceberg_merge_upsert: {table_ident!r} is not a valid "
            "dot-separated catalog identifier"
        )
    for k in keys:
        if "`" in k:
            raise ValueError(
                f"iceberg_merge_upsert: key column {k!r} contains a "
                "backtick, which cannot be quoted into the MERGE condition"
            )
    if not format_available(spark, "iceberg"):
        raise NotImplementedError(
            "iceberg jars are not on the classpath in this environment; add "
            "the iceberg-spark-runtime package to spark.jars.packages (and "
            "the IcebergSparkSessionExtensions + a catalog conf) to enable "
            "real MERGE INTO"
        )
    import uuid

    view = f"__iceberg_updates_{uuid.uuid4().hex[:8]}"
    updates.createOrReplaceTempView(view)
    try:
        cond = " AND ".join(f"t.`{k}` = u.`{k}`" for k in keys)
        spark.sql(
            f"MERGE INTO {table_ident} t USING {view} u ON {cond} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    finally:
        spark.catalog.dropTempView(view)


def scd2_close_and_insert(
    dim: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    effective_col: str = "valid_from",
    end_col: str = "valid_to",
    as_of: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2: close current rows for changed keys
    (set valid_to), append the new versions as open rows."""
    as_of_lit = F.lit(as_of).cast("timestamp") if as_of else F.current_timestamp()
    changed = dim.join(updates.select(*keys), list(keys), "left_semi").withColumn(
        end_col, F.when(F.col(end_col).isNull(), as_of_lit).otherwise(F.col(end_col))
    )
    unchanged = dim.join(updates.select(*keys), list(keys), "left_anti")
    opened = updates.withColumn(effective_col, as_of_lit).withColumn(
        end_col, F.lit(None).cast("timestamp")
    )
    return unchanged.unionByName(changed).unionByName(opened)
