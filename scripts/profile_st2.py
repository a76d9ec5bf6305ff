#!/usr/bin/env python
"""Profile st_q6 (stream-stream join) and st_q4 (stateful KV) batch durations."""
import atexit
import os
import shutil
import sys
import time
import uuid

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHUF = os.environ.get("SHUF", "4")

from distributed_mapreduce_spark.session import get_spark
from distributed_mapreduce_spark.streaming.replay import (
    ephemeral_dir,
    event_stream,
    stage_event_chunks,
)

spark = get_spark(app_name="profile_st2")
from pyspark.sql import functions as F

n = spark.sparkContext.defaultParallelism
warm = spark.range(n * 1000).repartition(n)
warm.groupBy((F.col("id") % 7).alias("k")).count().write.format("noop").mode(
    "overwrite"
).save()


def _identity(batches):
    yield from batches


warm.mapInPandas(_identity, schema="id bigint").write.format("noop").mode(
    "overwrite"
).save()

chunks = stage_event_chunks(sf_dir, 2)
atexit.register(shutil.rmtree, chunks, ignore_errors=True)
spark.conf.set("spark.sql.shuffle.partitions", SHUF)

from distributed_mapreduce_spark.operators.kv import ops_projection
from distributed_mapreduce_spark.streaming.joins import interval_join
from distributed_mapreduce_spark.streaming.stateful import kv_state_stream


def build_q6():
    ev = event_stream(spark, chunks)
    return interval_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
    ), "append"


def build_q4():
    ev = event_stream(spark, chunks)
    return kv_state_stream(ops_projection(ev).where(F.col("op") != "get")), "update"


for label, build in [("q6_join", build_q6), ("q4_kv", build_q4)]:
    for i in range(3):
        df, mode = build()
        name = "p" + uuid.uuid4().hex[:8]
        ckpt = ephemeral_dir("dmr_prof_")
        atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
        t0 = time.perf_counter()
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        print(f"== {label} run {i}: wall {wall:.2f}s shuf={SHUF}", file=sys.stderr)
        for p in q.recentProgress:
            d = p["durationMs"]
            print(
                f"  batch {p['batchId']}: rows {p['numInputRows']} "
                f"trig {d.get('triggerExecution')} (add {d.get('addBatch')}, "
                f"plan {d.get('queryPlanning')}, wal {d.get('walCommit')}, "
                f"off {d.get('commitOffsets')})",
                file=sys.stderr,
            )
            for sop in p.get("stateOperators", []):
                print(
                    f"    state[{sop.get('operatorName')}]: upd {sop.get('allUpdatesTimeMs')} "
                    f"rm {sop.get('allRemovalsTimeMs')} commit {sop.get('commitTimeMs')}",
                    file=sys.stderr,
                )
