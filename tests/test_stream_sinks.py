"""Exactly-once sink semantics: resuming a file-sink stream from its
checkpoint must not duplicate rows; new data appends incrementally."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import os
import time

from distributed_mapreduce_spark.streaming import event_stream
from distributed_mapreduce_spark.streaming.sinks import parquet_stream_sink


def chunk(path, ids, mtime):
    tbl = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array([i * 1_000_000 for i in ids], pa.timestamp("us")),
            "user_id": pa.array([1] * len(ids), pa.int64()),
            "event_type": pa.array(["x"] * len(ids)),
            "value": pa.array([1.0] * len(ids)),
            "props": pa.array(["{}"] * len(ids)),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def read_ids(spark, out):
    return sorted(r["event_id"] for r in spark.read.parquet(out).collect())


def test_file_sink_exactly_once_on_resume(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = time.time()
    chunk(str(src / "c1.parquet"), [1, 2, 3], base)

    def run():
        q = parquet_stream_sink(event_stream(spark, str(src)), out, ckpt)
        q.awaitTermination()

    run()
    assert read_ids(spark, out) == [1, 2, 3]

    # resume with NO new data: nothing duplicated
    run()
    assert read_ids(spark, out) == [1, 2, 3]

    # new chunk arrives: only the delta is appended
    chunk(str(src / "c2.parquet"), [4, 5], base + 5)
    run()
    assert read_ids(spark, out) == [1, 2, 3, 4, 5]


def test_streaming_rollup_partials_equal_batch_rollup(spark, tmp_path):
    """Streaming incremental-rollup ingest: per-batch partials folded
    at read time must equal the one-shot batch rollup bit-for-bit
    (decimal measure), resume with no data changes nothing, a new
    chunk folds in incrementally, and redelivering a batch's write is
    byte-idempotent."""
    from pyspark.sql import functions as F

    from distributed_mapreduce_spark.operators.incremental import (
        merge_partials,
        rollup,
    )
    from distributed_mapreduce_spark.streaming.sinks import (
        foreach_batch_rollup_partials,
    )

    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    base = time.time()
    chunk(str(src / "c1.parquet"), [1, 2, 3, 10, 11], base)

    keys = ["user_id", "event_type"]
    measures = {"n": ("count", None), "total": ("sum", "v")}

    def prep(df):
        return df.withColumn("v", F.col("value").cast("decimal(18,4)"))

    def run():
        q = foreach_batch_rollup_partials(
            prep(event_stream(spark, str(src))), store, ckpt, keys, measures
        )
        q.awaitTermination()

    def merged():
        return {
            (r.user_id, r.event_type): (r.n, r.total)
            for r in merge_partials(
                spark.read.parquet(store), keys, measures
            ).collect()
        }

    def full():
        return {
            (r.user_id, r.event_type): (r.n, r.total)
            for r in rollup(
                prep(spark.read.parquet(str(src))), keys, measures
            ).collect()
        }

    run()
    assert merged() == full()

    run()  # resume, no new data
    assert merged() == full()

    chunk(str(src / "c2.parquet"), [4, 5], base + 5)
    run()  # new chunk arrives as its own batch partial
    assert merged() == full()

    # redelivery: rewriting an existing batch partial with the same
    # data replaces, never duplicates
    import pathlib

    batches = sorted(
        p.name for p in pathlib.Path(store).iterdir() if p.name.startswith("batch=")
    )
    assert len(batches) >= 2
    first = spark.read.parquet(f"{store}/{batches[0]}")
    redelivered = spark.createDataFrame(first.collect(), first.schema)
    before = merged()
    redelivered.write.mode("overwrite").parquet(f"{store}/{batches[0]}")
    assert merged() == before
