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


def foreach_batch_cdc_merge(
    changes: DataFrame,
    store_path: str,
    checkpoint: str,
    key: str,
    init: DataFrame | None = None,
    ord_col: str = "ord",
    delete_col: str = "is_delete",
) -> StreamingQuery:
    """Streaming MERGE INTO — the Delta streaming-upsert pattern on
    plain parquet: each micro-batch of keyed changes (upserts +
    delete tombstones, last-writer-wins by `ord_col`) is applied onto
    the maintained table with operators/cdc.merge_changes (broadcast
    left-anti + union — the base side never shuffles).

    Exactly-once without a transaction log, via VERSIONED-DIRECTORY
    commits: batch N reads the newest COMMITTED version `v=<m>` with
    m < N, merges, and overwrites `v=<N>`. Redelivery of batch N after
    a crash re-reads the same m (a half-written v=N is ignored by the
    `< N` rule and clobbered by the overwrite), so replays converge to
    the same content — the foreach_batch_overwrite idempotence rule
    applied to stateful maintenance. `read_current_version` gives
    readers the newest committed snapshot (_SUCCESS-gated).

    Ordering contract: the snapshot stores no `ord`, so last-writer-
    wins across micro-batches relies on the source delivering each
    key's changes in nondecreasing `ord_col` order batch-to-batch
    (Spark sources replay a CDC log in offset order, so this holds;
    see operators/cdc.merge_changes for the out-of-order caveat).

    Scale notes: each batch rewrites the whole current snapshot — the
    plain-parquet cost of not having a transaction log. At real scale
    partition the snapshot (sources/files.write_partitioned
    dynamic=True) so a batch rewrites only touched partitions, and
    vacuum versions older than the checkpoint's committed batch on a
    maintenance cadence."""
    import pathlib

    from distributed_mapreduce_spark.operators.cdc import merge_changes

    def _committed(below: int | None = None) -> list[int]:
        return [
            int(p.name.split("=", 1)[1])
            for p in pathlib.Path(store_path).glob("v=*")
            if (p / "_SUCCESS").exists()
            and (below is None or int(p.name.split("=", 1)[1]) < below)
        ]

    # Seed the initial base as committed version v=-1 (distributed
    # write, never a driver collect) — only when the store is fresh,
    # so a resumed stream keeps its maintained state.
    if init is not None and not _committed():
        init.write.mode("overwrite").parquet(f"{store_path}/v=-1")
    payload_cols = (
        init.columns
        if init is not None
        else [c for c in changes.columns if c not in (ord_col, delete_col)]
    )

    def write_batch(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        committed = _committed(below=batch_id)
        if committed:
            base = spark.read.parquet(f"{store_path}/v={max(committed)}")
        else:
            base = spark.createDataFrame([], df.select(*payload_cols).schema)
        merged = merge_changes(base, df, key, ord_col, delete_col)
        merged.write.mode("overwrite").parquet(f"{store_path}/v={batch_id}")

    return (
        changes.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_current_version(spark, store_path: str) -> DataFrame:
    """Newest COMMITTED snapshot of a foreach_batch_cdc_merge store
    (_SUCCESS-gated, so a crash mid-write never surfaces)."""
    import pathlib

    store = pathlib.Path(store_path)
    committed = [
        int(p.name.split("=", 1)[1])
        for p in store.glob("v=*")
        if (p / "_SUCCESS").exists()
    ]
    if not committed:
        raise FileNotFoundError(f"no committed version under {store_path}")
    return spark.read.parquet(f"{store_path}/v={max(committed)}")


def vacuum_versions(store_path: str, keep: int = 2) -> list[int]:
    """Maintenance companion to foreach_batch_cdc_merge: delete all but
    the newest `keep` COMMITTED versions (plus any uncommitted debris
    older than them). keep >= 2 preserves the redelivery contract — a
    crashed batch N re-reads the newest version < N, so the
    second-newest must survive until N commits. Returns the deleted
    version numbers."""
    import pathlib
    import shutil

    if keep < 2:
        raise ValueError("keep < 2 breaks crash-redelivery (see docstring)")
    store = pathlib.Path(store_path)
    committed = sorted(
        int(p.name.split("=", 1)[1])
        for p in store.glob("v=*")
        if (p / "_SUCCESS").exists()
    )
    if not committed:
        # Nothing committed -> nothing is provably debris: any v=* here
        # may be a live stream's in-flight write (ADVICE r6 — the old
        # fallthrough deleted ALL versions in this state).
        return []
    survivors = set(committed[-keep:])
    deleted = []
    for p in store.glob("v=*"):
        v = int(p.name.split("=", 1)[1])
        # strictly older than the newest survivor: an uncommitted v=N
        # NEWER than every committed version is an in-flight write,
        # not debris.
        if v not in survivors and v < max(survivors):
            shutil.rmtree(p)
            deleted.append(v)
    return sorted(deleted)


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
