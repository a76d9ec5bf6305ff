#!/usr/bin/env python
"""A/B the streaming replay family's lever matrix at current HEAD
(VERDICT r16 #4): state-store provider (HDFS-backed default vs RocksDB,
with and without changelog checkpointing) x stream shuffle partitions,
timed with the bench methodology (noop sink, min over interleaved
passes, cache hygiene between samples). Results land in SCALE.md /
OPTIMIZATION_r17.md; never read by bench.py or the driver.

Usage: python scripts/ab_streaming.py [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

# (label, provider conf or None for default, changelog, shuffle partitions)
CONFIGS = [
    ("hdfs_p4", None, False, 4),
    ("rocksdb_p4", ROCKSDB, False, 4),
    ("rocksdb_changelog_p4", ROCKSDB, True, 4),
    ("hdfs_p2", None, False, 2),
    ("hdfs_p8", None, False, 8),
]

QUERIES = ["st_q3_session", "st_q4_stateful_kv", "st_q6_click_purchase_join"]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from distributed_mapreduce_spark.registry import all_queries
    from distributed_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="ab-streaming")
    qs = all_queries()
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    chg_key = (
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    )
    default_provider = spark.conf.get(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider",
    )

    # warm: one full pass of each query under the default conf pays the
    # one-time streaming machinery costs (bench.py's rationale)
    import distributed_mapreduce_spark.queries.streaming_queries as sq

    for name in QUERIES:
        force(qs[name](spark, SF_DIR))
    spark.catalog.clearCache()

    samples: dict[tuple[str, str], list[float]] = {}
    for _ in range(passes):
        for label, provider, changelog, parts in CONFIGS:
            spark.conf.set(prov_key, provider or default_provider)
            spark.conf.set(chg_key, str(changelog).lower())
            prev = sq.STREAM_SHUFFLE_PARTITIONS
            sq.STREAM_SHUFFLE_PARTITIONS = parts
            try:
                for name in QUERIES:
                    t0 = time.perf_counter()
                    force(qs[name](spark, SF_DIR))
                    samples.setdefault((label, name), []).append(
                        time.perf_counter() - t0
                    )
                    spark.catalog.clearCache()
            finally:
                sq.STREAM_SHUFFLE_PARTITIONS = prev
                spark.conf.set(prov_key, default_provider)
                spark.conf.set(chg_key, "false")
    for name in QUERIES:
        print(name)
        for label, *_ in CONFIGS:
            v = samples[(label, name)]
            print(f"  {label:22s} min {min(v):6.3f}s  (max {max(v):.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
