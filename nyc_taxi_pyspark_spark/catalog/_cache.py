"""Single-entry per-session persisted-layout cache.

Catalog queries that reuse a derived layout (bucketed embeddings, MinHash /
SimHash signature scans, candidate pair sets) persist it once per
(SparkSession, table dir) — locally a ``persist()``, at 100 TB a layout
written next to the table at ingest. Keeping ONE live entry per cache and
unpersisting the displaced DataFrame bounds executor storage in long-lived
multi-session processes: a stale applicationId (or a switch to another
table dir) can never pin dead blocks.

Staleness contract (tests/test_cache_lifecycle.py pins it): an entry has
the same semantics as Spark's own ``persist()`` because it IS one —
writes that go THROUGH the session are picked up automatically (Spark's
``InsertIntoHadoopFsRelation`` refreshes cached blocks by path), while a
mutation Spark cannot see (an external process rewriting the files) keeps
serving the materialized snapshot. That out-of-band case is deliberate:
the testdata dirs are read-only and a 100 TB ingest-time layout is
versioned with its table, so change detection would buy nothing and cost
a listing per call. External writers must call
:meth:`SessionLayoutCache.invalidate` (or open a new session / new dir)
before reading layout-backed queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class SessionLayoutCache:
    """One live persisted DataFrame, keyed by (applicationId, sf_dir)."""

    def __init__(self) -> None:
        self._key: tuple[str, str] | None = None
        self._value: DataFrame | None = None

    def get_or_build(
        self,
        spark: SparkSession,
        sf_dir: str,
        build: Callable[[], DataFrame],
    ) -> DataFrame:
        key = (spark.sparkContext.applicationId, sf_dir)
        if self._key != key:
            displaced = self._value
            self._key, self._value = key, build().persist()
            if displaced is not None:
                try:
                    displaced.unpersist()
                except Exception:
                    pass  # dead session: blocks are already gone
        return self._value

    def invalidate(self) -> None:
        """Drop the live entry so the next get_or_build rebuilds from the
        current table state — the explicit escape hatch of the snapshot
        contract (module docstring) for in-place table mutation."""
        displaced, self._key, self._value = self._value, None, None
        if displaced is not None:
            try:
                displaced.unpersist()
            except Exception:
                pass  # dead session: blocks are already gone
