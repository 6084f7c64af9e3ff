"""Event-time windowed aggregations (SURVEY.md §2.9 extension — the
reference is batch-only; this module adds the Structured Streaming surface
over the ``events`` table).

Each window shape is defined ONCE as a batch-compatible transform
(``F.window`` / ``F.session_window`` work identically on batch and streaming
DataFrames). Batch mode feeds the DuckDB oracle; ``streaming.runner`` drives
the same transform through readStream → memory sink with a watermark for the
real streaming path. That twin structure is what makes a stateful streaming
op oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.functions.exact import dsum


def _measures() -> list[Column]:
    return [
        F.count("*").alias("n_events"),
        dsum("value", 2).alias("sum_value"),
    ]


def tumbling_counts(
    events: DataFrame, size: str = "1 hour", keys: tuple[str, ...] = ("event_type",)
) -> DataFrame:
    """Tumbling event-time window aggregation."""
    return (
        events.groupBy(F.window("ts", size).alias("w"), *keys)
        .agg(*_measures())
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "sum_value")
    )


def sliding_counts(
    events: DataFrame, size: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding window aggregation — each event lands in size/slide windows."""
    return (
        events.groupBy(F.window("ts", size, slide).alias("w"))
        .agg(*_measures())
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of silence.

    In batch this compiles to a sort-within-user + merge; in streaming it is
    Spark's native stateful session operator.
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(*_measures())
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def with_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Late-data bound for the streaming path: state for windows older than
    max(event time) − delay is finalized and dropped — bounded state at
    100 TB/day ingest rates."""
    return events.withWatermark("ts", delay)


def dedup_keys(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    bucket: str = "1 hour",
) -> DataFrame:
    """Streaming-compatible exact dedup on a semantic key: one row per
    (key…, event-time bucket).

    Batch: compiles to a hash-distinct. Streaming: ``dropDuplicates`` over
    the same columns keeps per-key state; with the watermark attached
    (``with_watermark``) state for buckets older than the late bound is
    evicted, so memory stays bounded by (keys × buckets in flight) — the
    shape a 100 TB/day ingest dedup needs. Only the key columns are
    emitted: keep-first payload semantics depend on arrival order, which no
    cross-engine (or cross-run) contract can hash-match."""
    b = F.window("ts", bucket).alias("w")
    return (
        events.select(*keys, b)
        .dropDuplicates([*keys, "w"])
        .select(*keys, F.col("w.start").alias("bucket_start"))
    )


def interval_join(
    clicks: DataFrame, errors: DataFrame, gap: str = "10 minutes"
) -> DataFrame:
    """Stream-stream interval join: each click matched to every error by
    the same user in the preceding ``gap``.

    The time-range predicate is what makes this a STREAMING join: with
    watermarks on both inputs it bounds how long either side's rows stay
    in join state (errors older than click-watermark − gap are evicted),
    so state is O(rate × gap), not unbounded. The identical transform runs
    in batch (where it compiles to a plain range-predicated SortMergeJoin)
    — which is what the DuckDB oracle checks.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    e = errors.select(
        F.col("user_id").alias("e_user_id"), F.col("ts").alias("error_ts")
    )
    return c.join(
        e,
        (c.user_id == e.e_user_id)
        & (F.col("error_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {gap}"))
        & (F.col("error_ts") <= F.col("click_ts")),
    ).select("click_id", "user_id", "click_ts", "error_ts")


SEVERITY_ROWS = [
    ("view", "low"),
    ("click", "low"),
    ("signup", "medium"),
    ("purchase", "high"),
    ("error", "critical"),
]


def severity_dim(spark) -> DataFrame:
    """Static severity lookup (in-memory tuples, the reference's S5 idiom)."""
    return spark.createDataFrame(
        SEVERITY_ROWS, "event_type STRING, severity STRING"
    )


def enrich_static(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static broadcast enrichment — the canonical Structured
    Streaming join: an unbounded event stream joined to a bounded dimension.

    Stateless (no watermark needed, append-mode safe): each micro-batch
    hash-joins against the broadcast dim and emits immediately, so there is
    no join state at all — the streaming shape that scales to any ingest
    rate. In batch the identical transform is a plain broadcast hash join,
    which is what the DuckDB oracle checks.
    """
    return events.join(F.broadcast(dim), "event_type").select(
        "event_id", "event_type", "severity", "value"
    )
