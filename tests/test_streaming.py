"""Streaming ([EXT]): replayed-stream results must equal the batch twin
on the same data (the SURVEY §5.2 sequential-oracle pattern applied to
streams), plus watermark late-drop semantics."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from distributed_mapreduce_spark.operators.kv import fold_kv_log, ops_projection
from distributed_mapreduce_spark.sources import table
from distributed_mapreduce_spark.streaming import (
    event_stream,
    run_available_now,
    stage_event_chunks,
)
from distributed_mapreduce_spark.streaming.stateful import kv_state_stream, latest_state
from distributed_mapreduce_spark.streaming.windows import (
    session_stats,
    sliding_counts,
    tumbling_counts,
)


def rows_set(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture(scope="module")
def chunks(sf_dir):
    d = stage_event_chunks(sf_dir, n_chunks=3)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def batch_events(spark, sf_dir):
    return table(spark, sf_dir, "events")


def test_tumbling_stream_equals_batch(spark, sf_dir, chunks):
    streamed = run_available_now(
        tumbling_counts(event_stream(spark, chunks)), "complete"
    )
    batch = tumbling_counts(batch_events(spark, sf_dir))
    assert rows_set(streamed) == rows_set(batch)


def test_sliding_stream_equals_batch(spark, sf_dir, chunks):
    streamed = run_available_now(
        sliding_counts(event_stream(spark, chunks)), "complete"
    )
    batch = sliding_counts(batch_events(spark, sf_dir))
    assert rows_set(streamed) == rows_set(batch)


def test_session_append_is_watermark_closed_subset(spark, sf_dir, chunks):
    streamed = run_available_now(
        session_stats(event_stream(spark, chunks), "30 minutes", "1 hour"), "append"
    )
    batch = session_stats(batch_events(spark, sf_dir), "30 minutes")
    got, want = rows_set(streamed), rows_set(batch)
    assert got <= want
    # exactly the sessions the final watermark (max ts − 1h) closed
    max_ts = batch_events(spark, sf_dir).agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - __import__("datetime").timedelta(hours=1)
    assert got == {r for r in want if r[2] <= cutoff}  # r[2] = session_end


def test_stateful_kv_stream_equals_batch_fold(spark, sf_dir, chunks):
    ops_stream = ops_projection(event_stream(spark, chunks)).where(F.col("op") != "get")
    updates = run_available_now(kv_state_stream(ops_stream), "update")
    streamed = latest_state(updates)
    batch = fold_kv_log(ops_projection(batch_events(spark, sf_dir)))
    assert rows_set(streamed) == rows_set(batch)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Hand-built 3-chunk replay: a row arriving after the watermark
    passed its window is dropped; on-time rows in the same batch survive."""

    def chunk(path, rows, mtime):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [int(r[1] * 3_600_000_000) for r in rows], pa.timestamp("us")
                ),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["x"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    d = tmp_path / "late"
    d.mkdir()
    base = time.time()
    # hours: c1 fills windows h1,h2 · c2 advances the watermark to h9 ·
    # c3 is separation (the wm committed after batch N filters batch
    # N+2 — micro-batch wm propagation lags one batch) · c4 has a late
    # h1 row (dropped) and an open-window h9.5 row (never emitted).
    chunk(str(d / "c1.parquet"), [(0, 1), (1, 2)], base)
    chunk(str(d / "c2.parquet"), [(2, 10)], base + 1)
    chunk(str(d / "c3.parquet"), [(3, 10.2)], base + 2)
    chunk(str(d / "c4.parquet"), [(4, 1), (5, 9.5)], base + 3)

    out = run_available_now(
        tumbling_counts(event_stream(spark, str(d)), "1 hour", watermark="1 hour"),
        "append",
    )
    got = {(r["window_start"].hour, r["n_events"]) for r in out.collect()}
    # h1 window emitted with ONE event (late duplicate dropped); the
    # h9.5 window is still open at stream end, so never emitted.
    assert (1, 1) in got
    assert all(h != 9 for h, _ in got)


def test_stream_dedup_state_spans_micro_batches(spark, sf_dir, chunks):
    """dropDuplicates state must persist across batches: the replay has
    duplicate (user_id, event_type) keys in different chunks, yet the
    sink holds each key exactly once — equal to batch DISTINCT."""
    from distributed_mapreduce_spark.streaming.stateful import stream_distinct

    cols = ["user_id", "event_type"]
    streamed = run_available_now(
        stream_distinct(event_stream(spark, chunks), cols), "append"
    )
    batch = batch_events(spark, sf_dir).select(*cols).distinct()
    n_raw = batch_events(spark, sf_dir).count()
    assert n_raw > batch.count()  # fixture really has cross-batch dupes
    assert streamed.count() == batch.count()  # emitted once, never re-emitted
    assert rows_set(streamed) == rows_set(batch)


def test_interval_join_stream_equals_batch(spark, sf_dir, chunks):
    """Stream-stream interval join across micro-batches equals the
    batch interval join — including matches whose two sides arrive in
    DIFFERENT micro-batches (asserted non-empty)."""
    from distributed_mapreduce_spark.streaming.joins import interval_join

    ev = event_stream(spark, chunks)
    streamed = run_available_now(
        interval_join(
            ev.where(F.col("event_type") == "click"),
            ev.where(F.col("event_type") == "purchase"),
        ),
        "append",
    )
    bev = batch_events(spark, sf_dir)
    batch = (
        bev.where("event_type = 'click'")
        .select("user_id", F.col("ts").alias("click_ts"))
        .join(
            bev.where("event_type = 'purchase'").select(
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"),
                "value",
            ),
            F.expr(
                "user_id = p_user AND purchase_ts >= click_ts "
                "AND purchase_ts <= click_ts + INTERVAL 30 minutes"
            ),
        )
        .select("user_id", "click_ts", "purchase_ts", "value")
    )
    assert rows_set(streamed) == rows_set(batch)
    assert len(rows_set(streamed)) > 0
