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
