#!/usr/bin/env python
"""Quick timing of the streaming family at sf0.1 (dev tool)."""
import os
import sys
import time

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from distributed_mapreduce_spark.session import get_spark
from distributed_mapreduce_spark.queries.streaming_queries import QUERIES

spark = get_spark(app_name="time_st")
if os.environ.get("ROCKSDB"):
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
# Arbitrary conf experiments: DMR_ST_CONF="key=value;key=value"
for kv in filter(None, os.environ.get("DMR_ST_CONF", "").split(";")):
    k, _, v = kv.partition("=")
    print(f"  conf: {k}={v}", file=sys.stderr)
    spark.conf.set(k.strip(), v.strip())
from pyspark.sql import functions as F

n = spark.sparkContext.defaultParallelism
warm = spark.range(n * 1000).repartition(n)
warm.groupBy((F.col("id") % 7).alias("k")).count().write.format("noop").mode(
    "overwrite"
).save()

passes = int(os.environ.get("PASSES", "2"))
for p in range(passes):
    total = 0.0
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        total += dt
        print(f"  {name}: {dt:.2f}s", file=sys.stderr)
    print(f"pass {p}: st family total = {total:.2f}s", file=sys.stderr)
