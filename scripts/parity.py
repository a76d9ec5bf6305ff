#!/usr/bin/env python3
"""Driver-emulating end-to-end check of the __spark_entry__ contract.

Creates a plain SparkSession the way the driver would (no engine
tuning), calls entry()/queries()/oracle_sql(), and compares every
oracle-backed query against DuckDB at the given sf dir (default the
driver's correctness scale, sf0.01). Exit 0 iff everything matches.

Usage: python scripts/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from distributed_mapreduce_spark.testing import check_query

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("parity-driver-emulation")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    rows = e.entry(spark).count()
    print(f"entry(): {rows} rows in {time.time() - t0:.1f}s")
    assert rows > 0

    qs, oracles = e.queries(), e.oracle_sql()
    from distributed_mapreduce_spark.registry import GRADING_CAP, check_declared_counts

    # Hard gate (VERDICT r7 #3): registry tier sizes must match the
    # counts COVERAGE.md declares, so no query can register without
    # its evidence chain landing in the same commit.
    reg_n, sh_n = check_declared_counts()
    print(f"declared counts OK: {reg_n} registered + {sh_n} shadow")

    if len(qs) > GRADING_CAP:
        print(
            f"WARNING: {len(qs)} registered queries > driver grading cap "
            f"{GRADING_CAP}; queries past position {GRADING_CAP} get NO "
            f"correctness row (round-1 observation) — move twins to the "
            f"shadow tier (registry.py)"
        )
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        if name in oracles:
            res = check_query(spark, name, fn, oracles[name], sf_dir)
            status = "OK " if res.ok else "FAIL"
            print(f"{status} {name}: {res.detail} ({time.time() - t0:.1f}s)")
            if not res.ok:
                failures.append(name)
        else:
            n = fn(spark, sf_dir).count()
            print(f"OK  {name}: rows-only, {n} rows ({time.time() - t0:.1f}s)")
        # Queries that persist() intermediates (jaccard/contam/text_q7)
        # would otherwise accumulate cached blocks for the whole run.
        spark.catalog.clearCache()
    if failures:
        print(f"\nFAILED: {failures}")
        return 1
    print(f"\nall {len([q for q in qs if not only or q in only])} queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
