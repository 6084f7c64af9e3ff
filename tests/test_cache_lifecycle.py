"""Session-layout cache lifecycle (VERDICT r9 item 7).

The catalog's persisted layouts (_COPURCHASE_CACHE, the MinHash/SimHash
signature layouts, IVF centroids, the trigram postings) are all instances
of SessionLayoutCache, keyed by (applicationId, sf_dir). These tests pin
the documented contract: an entry is a SNAPSHOT of the table at first use
(same semantics as Spark's CACHE TABLE — in-place file mutation is not
detected), invalidate() is the explicit escape hatch, and switching
sf_dir or session rebuilds without manual action.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_pyspark_spark.catalog._cache import SessionLayoutCache  # noqa: E402


def _write(spark, path: str, n: int) -> None:
    spark.range(n).withColumnRenamed("id", "k").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_same_session_writes_are_seen_through_the_cache(spark, tmp_path):
    """A write THROUGH this session refreshes Spark's cached blocks by
    path (InsertIntoHadoopFsRelation → refreshByPath), so the layout
    transparently re-materializes from the new files — with no rebuild
    of the Python-side entry."""
    table = str(tmp_path / "t.parquet")
    _write(spark, table, 3)
    cache = SessionLayoutCache()
    builds = []

    def build():
        builds.append(1)
        return spark.read.parquet(table)

    first = cache.get_or_build(spark, str(tmp_path), build)
    assert first.count() == 3 and len(builds) == 1

    _write(spark, table, 5)  # same-session overwrite
    again = cache.get_or_build(spark, str(tmp_path), build)
    assert len(builds) == 1  # python entry reused
    assert again.count() == 5  # Spark refreshed the cached blocks itself


def test_out_of_band_mutation_follows_snapshot_contract(spark, tmp_path):
    """A mutation Spark does NOT see (external process writing the files
    directly) leaves the materialized blocks serving the snapshot — the
    documented contract — and invalidate() is the escape hatch."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = str(tmp_path / "t.parquet")
    _write(spark, table, 3)
    cache = SessionLayoutCache()
    builds = []

    def build():
        builds.append(1)
        return spark.read.parquet(table)

    first = cache.get_or_build(spark, str(tmp_path), build)
    assert first.count() == 3 and len(builds) == 1

    # out-of-band rewrite: no spark catalog refresh happens
    shutil.rmtree(table)
    os.makedirs(table)
    pq.write_table(
        pa.table({"k": pa.array(range(5), type=pa.int64())}),
        os.path.join(table, "part-0.parquet"),
    )
    again = cache.get_or_build(spark, str(tmp_path), build)
    assert len(builds) == 1
    assert again.count() == 3  # materialized snapshot, stale BY CONTRACT

    # the documented escape hatch picks up the mutation
    cache.invalidate()
    fresh = cache.get_or_build(spark, str(tmp_path), build)
    assert len(builds) == 2
    assert fresh.count() == 5


def test_dir_switch_rebuilds_and_displaces(spark, tmp_path):
    """A different sf_dir is a different key: rebuilds immediately and
    unpersists the displaced layout (single-live-entry discipline)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _write(spark, a + "/t.parquet", 2)
    _write(spark, b + "/t.parquet", 7)
    cache = SessionLayoutCache()
    da = cache.get_or_build(
        spark, a, lambda: spark.read.parquet(a + "/t.parquet")
    )
    assert da.count() == 2 and da.storageLevel.useMemory
    db = cache.get_or_build(
        spark, b, lambda: spark.read.parquet(b + "/t.parquet")
    )
    assert db.count() == 7
    assert not da.storageLevel.useMemory  # displaced entry unpersisted
    # switching back is also a rebuild (single entry, not an LRU)
    da2 = cache.get_or_build(
        spark, a, lambda: spark.read.parquet(a + "/t.parquet")
    )
    assert da2.count() == 2


def test_invalidate_is_safe_when_empty():
    SessionLayoutCache().invalidate()  # no entry, no error
