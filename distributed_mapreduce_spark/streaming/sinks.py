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


def foreach_batch_rollup_partials(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    keys: list[str],
    measures,
) -> StreamingQuery:
    """Streaming incremental-rollup ingest, exactly-once without a
    transactional store: each micro-batch writes its PARTIAL aggregate
    (operators/incremental.rollup) into its own `batch=<id>` directory
    with overwrite — redelivery after a crash rewrites the same bytes
    instead of double-merging. Readers fold the partials with
    operators/incremental.merge_partials; the fold is associative and
    commutative per measure kind, so read-time results equal the
    one-shot batch rollup bit-for-bit (decimal/HLL measures — ✓test).

    This is the composition a 100 TB metrics pipeline runs
    continuously: partial-agg in the stream (tiny per-batch output),
    merge-at-read, compact partials into a base on a maintenance
    cadence (the same merge, written back). Merging IN the stream
    (refresh_rollup per batch) would be smaller at read time but is
    not idempotent under foreachBatch redelivery — the partials
    pattern is the exactly-once-safe default."""
    from distributed_mapreduce_spark.operators.incremental import rollup

    def write_batch(df: DataFrame, batch_id: int) -> None:
        rollup(df, keys, measures).write.mode("overwrite").parquet(
            f"{path}/batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


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
