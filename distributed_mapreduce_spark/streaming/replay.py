"""Bounded replay of the `events` fixture as a Structured Streaming
source ([EXT] — the reference has no stream surface, SURVEY.md §2.4).

The fixture is one parquet file; a stream needs an unbounded-looking
source. `stage_event_chunks` splits the table into K seq-ordered chunk
files and `event_stream` reads them back with the file source at one
file per micro-batch (`maxFilesPerTrigger=1` + `Trigger.AvailableNow`),
giving a deterministic K-batch replay that terminates — the standard
fixture-replay pattern for Structured Streaming tests.

In production the same downstream code runs off `readStream` on a Kafka
topic or a landing directory: everything below the source is
source-agnostic, which is the point of the DataFrame streaming API.

Scale notes: the file source tracks seen-file state in the checkpoint
(driver-side, O(files)); window/state operators shuffle on their grouping
key exactly like batch. State stores are per shuffle partition — sized
by `spark.sql.shuffle.partitions` at first run, so a real deployment
sets it before the first checkpoint, not after.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def ephemeral_dir(prefix: str, need_bytes: int = 0) -> str:
    """Tempdir for REPLAY-ONLY state (staged chunks, fixture
    checkpoints): prefers memory-backed /dev/shm — checkpoint commits
    fsync many small files, which dominates fixture replay cost on
    disk (measured ~1.4× total st-family speedup on this host).

    Falls back to disk when /dev/shm is unwritable, lacks `need_bytes`
    (+64 MB headroom for checkpoint metadata) of free space, or
    DMR_FORCE_DISK=1 — tmpfs ENOSPC mid-replay is strictly worse than a
    slower run (ADVICE r3).

    Durability note, deliberately loud: a real deployment puts
    checkpoints on durable shared storage (HDFS/S3/ABFS) because the
    checkpoint IS the exactly-once contract across restarts. That is
    exactly why memory-backed is correct HERE and only here: this
    bounded fixture replay is rerunnable from scratch, its checkpoint
    dies with the process by design (run_available_now deletes it), and
    the durable-sink tests pass their own explicit checkpoint paths."""
    base = None
    if os.environ.get("DMR_FORCE_DISK") != "1" and os.access("/dev/shm", os.W_OK):
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize >= need_bytes + 64 * 1024 * 1024:
            base = "/dev/shm"
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def stage_event_chunks(sf_dir: str, n_chunks: int = 4, workdir: str | None = None) -> str:
    """Split the events fixture into `n_chunks` seq-ordered parquet
    files with strictly increasing mtimes (the file source replays in
    mtime order). Returns the chunk directory; caller owns cleanup.

    ts is cast ns→µs at staging (Spark has no ns timestamp; this is the
    same truncation sources/catalog.py applies on the batch path).
    """
    src = f"{sf_dir}/events.parquet"
    # Staged chunks ≈ source size; ask for 2× to cover re-encoding slack.
    workdir = workdir or ephemeral_dir("dmr_stream_", need_bytes=2 * os.path.getsize(src))
    tbl = pq.read_table(src).sort_by("event_id")
    i = tbl.schema.get_field_index("ts")
    us = pa.compute.floor_temporal(tbl.column("ts"), unit="microsecond").cast(
        pa.timestamp("us")
    )
    tbl = tbl.set_column(i, "ts", us)
    n = tbl.num_rows
    base = time.time()
    for c in range(n_chunks):
        lo, hi = c * n // n_chunks, (c + 1) * n // n_chunks
        path = os.path.join(workdir, f"chunk_{c:04d}.parquet")
        pq.write_table(tbl.slice(lo, hi - lo), path)
        os.utime(path, (base + c, base + c))
    return workdir


def stage_embedding_chunks(
    sf_dir: str, n_chunks: int = 3, workdir: str | None = None
) -> str:
    """Split the embeddings fixture into `n_chunks` vec_id-ordered
    parquet files with strictly increasing mtimes — the vector-feed
    twin of stage_event_chunks, staged for the streaming SemDeDup /
    ANN ingest sinks. Returns the chunk directory; caller owns
    cleanup."""
    src = f"{sf_dir}/embeddings.parquet"
    workdir = workdir or ephemeral_dir(
        "dmr_embstream_", need_bytes=2 * os.path.getsize(src)
    )
    tbl = pq.read_table(src, columns=["vec_id", "embedding"]).sort_by("vec_id")
    n = tbl.num_rows
    base = time.time()
    for c in range(n_chunks):
        lo, hi = c * n // n_chunks, (c + 1) * n // n_chunks
        path = os.path.join(workdir, f"chunk_{c:04d}.parquet")
        pq.write_table(tbl.slice(lo, hi - lo), path)
        os.utime(path, (base + c, base + c))
    return workdir


def stage_document_chunks(
    sf_dir: str,
    n_chunks: int = 3,
    workdir: str | None = None,
    exclude_source: str | None = None,
) -> str:
    """Split the documents fixture into `n_chunks` doc_id-ordered
    parquet files with strictly increasing mtimes — the crawl-feed twin
    of stage_event_chunks, staged for the streaming decontamination
    ingest sink. `exclude_source` drops one source before chunking
    (the benchmark corpus is the static index side, not feed)."""
    src = f"{sf_dir}/documents.parquet"
    workdir = workdir or ephemeral_dir(
        "dmr_docstream_", need_bytes=2 * os.path.getsize(src)
    )
    tbl = pq.read_table(src)
    if exclude_source is not None:
        tbl = tbl.filter(pa.compute.field("source") != exclude_source)
    tbl = tbl.sort_by("doc_id")
    n = tbl.num_rows
    base = time.time()
    for c in range(n_chunks):
        lo, hi = c * n // n_chunks, (c + 1) * n // n_chunks
        path = os.path.join(workdir, f"chunk_{c:04d}.parquet")
        pq.write_table(tbl.slice(lo, hi - lo), path)
        os.utime(path, (base + c, base + c))
    return workdir


def event_stream(spark: SparkSession, chunk_dir: str) -> DataFrame:
    """File-source stream over staged chunks, one chunk per micro-batch."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
    )


def run_available_now(result: DataFrame, output_mode: str) -> DataFrame:
    """Execute a streaming result to completion (Trigger.AvailableNow)
    into a memory sink; return the sink as a DataFrame.

    AvailableNow processes everything staged, honoring per-batch limits,
    then stops — bounded replay with real micro-batch/state semantics.
    """
    name = "s" + uuid.uuid4().hex[:12]
    ckpt = ephemeral_dir("dmr_ckpt_")
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return result.sparkSession.table(name)
