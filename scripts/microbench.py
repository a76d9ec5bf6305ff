#!/usr/bin/env python
"""Targeted sub-plan timing harness for the optimization rounds.

Times named DataFrame builders with the bench's own methodology (noop
sink, min over K interleaved passes, per-query cache hygiene) without
running the whole tier. Experiments live in EXPERIMENTS below — the
round's scratchpad; results are copied into OPTIMIZATION notes, never
read by bench.py or the driver.

Usage: python scripts/microbench.py <experiment> [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _clean(spark) -> None:
    spark.catalog.clearCache()
    for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        jrdd.unpersist(False)


def run(spark, builders: dict, passes: int = 3) -> None:
    samples = {n: [] for n in builders}
    # warm pass identical to bench warmup: first execution pays codegen
    for name in builders:
        try:
            force(builders[name](spark))
        except Exception as exc:
            print(f"  warm {name} FAILED: {exc}")
        _clean(spark)
    for _ in range(passes):
        for name in builders:
            t0 = time.perf_counter()
            force(builders[name](spark))
            samples[name].append(time.perf_counter() - t0)
            _clean(spark)
    for name, v in samples.items():
        print(f"  {min(v):7.3f}s min (max {max(v):.3f})  {name}")


def main() -> int:
    exp = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from distributed_mapreduce_spark.session import get_spark

    spark = get_spark(app_name=f"microbench-{exp}")
    from pyspark.sql import functions as F  # noqa: F401

    from distributed_mapreduce_spark.sources import table, widen  # noqa: F401

    builders = EXPERIMENTS[exp](spark)
    # engine warmup (bench.py parity)
    n = spark.sparkContext.defaultParallelism
    warm = spark.range(n * 1000).repartition(n)
    force(warm.groupBy((F.col("id") % 7).alias("k")).count())
    run(spark, builders, passes)
    return 0


# --- experiments -------------------------------------------------------------


def _exp_lineitem_agg(spark):
    """Where does rel_q1's time go: scan, exchange, or agg?"""
    from distributed_mapreduce_spark.queries.relational import (
        rel_q1_pricing_summary,
    )

    def scan_only(s):
        return table(s, SF_DIR, "lineitem")

    def q1_current(s):
        return rel_q1_pricing_summary(s, SF_DIR)

    return {
        "scan_noop_full_rows": lambda s: scan_only(s),
        "rel_q1_current": q1_current,
    }


EXPERIMENTS = {
    "lineitem_agg": _exp_lineitem_agg,
}


if __name__ == "__main__":
    sys.exit(main())
