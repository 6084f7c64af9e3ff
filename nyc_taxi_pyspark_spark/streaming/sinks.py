"""Streaming sinks: exactly-once via foreachBatch.

``foreachBatch`` hands each micro-batch to arbitrary batch code with an
epoch id; writing idempotently by epoch (here: one parquet dir per epoch,
overwritten on retry) gives end-to-end exactly-once on top of the source's
replay — the standard pattern for sinks without native transactional
support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_stream_exactly_once(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Start a foreachBatch parquet sink: epoch-keyed overwrite makes batch
    replays idempotent; the checkpoint ties epochs to source offsets."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
