"""Streaming sinks with exactly-once semantics.

Two patterns a production pipeline uses:

1. `parquet_stream_sink` — Spark's transactional file sink: committed
   files are recorded in the checkpoint's sink log, so a restarted or
   replayed query never duplicates output (the engine-level version of
   the reference's temp-file+rename atomic commit, worker.go:184-198,
   extended across restarts).

2. `foreach_batch_overwrite` — the idempotent-foreachBatch pattern for
   sinks without a transaction log: each micro-batch overwrites its own
   `batch=<id>` partition, so re-delivery of a batch after a crash
   rewrites the same partition instead of appending twice.

Scale notes: both write one file per shuffle partition per batch; at
real scale compact small files downstream or raise the per-batch
trigger size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def parquet_stream_sink(
    result: DataFrame, path: str, checkpoint: str, available_now: bool = True
) -> StreamingQuery:
    """Append-mode transactional parquet sink; resuming from the same
    checkpoint is exactly-once."""
    w = (
        result.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def foreach_batch_overwrite(result: DataFrame, path: str, checkpoint: str) -> StreamingQuery:
    """Idempotent foreachBatch: overwrite the batch's own partition —
    redelivered batches replace, never duplicate."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/batch={batch_id}")

    return (
        result.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
