"""Structured Streaming execution harness.

``run_stream_once`` drives a parquet-directory source through a
transformation to a memory sink synchronously — the local-mode stand-in for
a Kafka→sink pipeline, and what the streaming tests use to prove the batch
twins really run as streams (same plan, watermark attached).
"""

from __future__ import annotations

import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def run_stream_once(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    transform: Callable[[DataFrame], DataFrame],
    output_mode: str = "append",
) -> DataFrame:
    """Read ``source_dir`` as a file stream, apply ``transform``, drain all
    available input into an in-memory table, and return it as a DataFrame.
    """
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        transform(stream)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def parquet_stream_dir(src_file: str) -> str:
    """Expose a single parquet FILE as a readStream-able DIRECTORY via a
    deterministic per-source symlink dir (no data copy; reused across
    invocations instead of leaking a mkdtemp per run; stale links from a
    regenerated source are replaced)."""
    import hashlib
    import os
    import tempfile

    src = os.path.realpath(src_file)
    tag = hashlib.sha1(src.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"stateful_stream_{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(src))
    if os.path.islink(link) and os.path.realpath(link) != src:
        os.unlink(link)
    if not os.path.exists(link):
        os.symlink(src, link)
    return d
