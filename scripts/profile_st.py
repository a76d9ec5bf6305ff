#!/usr/bin/env python
"""Profile one streaming query's batch-level durations (dev tool)."""
import atexit
import json
import os
import shutil
import sys
import time
import uuid

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from distributed_mapreduce_spark.session import get_spark
from distributed_mapreduce_spark.streaming.replay import (
    ephemeral_dir,
    event_stream,
    stage_event_chunks,
)
from distributed_mapreduce_spark.streaming.windows import tumbling_counts

spark = get_spark(app_name="profile_st")
from pyspark.sql import functions as F

n = spark.sparkContext.defaultParallelism
warm = spark.range(n * 1000).repartition(n)
warm.groupBy((F.col("id") % 7).alias("k")).count().write.format("noop").mode(
    "overwrite"
).save()

chunks = stage_event_chunks(sf_dir, 2)
atexit.register(shutil.rmtree, chunks, ignore_errors=True)
spark.conf.set("spark.sql.shuffle.partitions", "4")

for i in range(3):
    name = "p" + uuid.uuid4().hex[:8]
    ckpt = ephemeral_dir("dmr_prof_")
    atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
    t0 = time.perf_counter()
    q = (
        tumbling_counts(event_stream(spark, chunks), "1 hour")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    print(f"== run {i}: wall {wall:.2f}s", file=sys.stderr)
    for p in q.recentProgress:
        d = p["durationMs"]
        print(
            f"  batch {p['batchId']}: rows {p['numInputRows']} "
            f"trigger {d.get('triggerExecution')}ms "
            f"(addBatch {d.get('addBatch')}ms, getBatch {d.get('getBatch')}ms, "
            f"latestOffset {d.get('latestOffset')}ms, queryPlanning {d.get('queryPlanning')}ms, "
            f"walCommit {d.get('walCommit')}ms, commitOffsets {d.get('commitOffsets')}ms)",
            file=sys.stderr,
        )
        for sop in p.get("stateOperators", []):
            print(
                f"    state: commitMs {sop.get('allUpdatesTimeMs')}/{sop.get('commitTimeMs')} "
                f"mem {sop.get('memoryUsedBytes')}",
                file=sys.stderr,
            )
