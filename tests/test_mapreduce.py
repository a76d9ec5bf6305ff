"""Generic map/reduce surface vs the sequential pure-Python oracle —
the reference's own test strategy (distributed output `sort|cmp`'d
against mrsequential, /root/reference/src/main/test-mr.sh:59-67)."""

from __future__ import annotations

import pytest

from distributed_mapreduce_spark.operators.mapreduce import (
    crash_map,
    crash_reduce,
    indexer_map,
    indexer_reduce,
    run_mapreduce,
    run_mapreduce_sequential,
    wc_map,
    wc_reduce,
)
from distributed_mapreduce_spark.sources import whole_documents


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    df = whole_documents(spark, sf_dir)
    rows = [(r.filename, r.contents) for r in df.collect()]
    return df, rows


@pytest.mark.parametrize(
    "mapf,reducef",
    [(wc_map, wc_reduce), (indexer_map, indexer_reduce), (crash_map, crash_reduce)],
    ids=["wc", "indexer", "crash"],
)
def test_distributed_matches_sequential(spark, corpus, mapf, reducef):
    df, rows = corpus
    got = sorted((r.key, r.value) for r in run_mapreduce(df, mapf, reducef).collect())
    want = sorted(run_mapreduce_sequential(rows, mapf, reducef))
    assert got == want


def test_partitioning_groups_keys(spark, corpus):
    """O3: every distinct key lands in exactly one output partition
    (the invariant behind the reference's ihash%n routing)."""
    df, _ = corpus
    out = run_mapreduce(df, wc_map, wc_reduce, num_partitions=5)
    keys = [r.key for r in out.collect()]
    assert len(keys) == len(set(keys))


def test_custom_udfs(spark, corpus):
    """Arbitrary user closures — the pluggable-UDF contract
    (worker.go:25-26), not just the shipped apps."""
    df, rows = corpus

    def mapf(fname, contents):
        return [(w[:2], str(len(w))) for w in contents.split()]

    def reducef(key, values):
        return str(sum(int(v) for v in values))

    got = sorted((r.key, r.value) for r in run_mapreduce(df, mapf, reducef).collect())
    want = sorted(run_mapreduce_sequential(rows, mapf, reducef))
    assert got == want


def test_crash_retry_matches_golden(spark, corpus):
    """Fault-injection e2e — the reference's flagship robustness test
    (crash app under worker kill/respawn, still golden output:
    /root/reference/src/main/test-mr.sh:163-203,
    /root/reference/src/mrapps/crash.go:20-32). Here the injected fault
    is an unconditional raise on every FIRST task attempt in both the
    map and the reduce stage (TaskContext.attemptNumber == 0); Spark's
    task retry (O8) reruns each task and the FileOutputCommitter-style
    attempt isolation (O7) means no partial output from the dead
    attempts leaks — the job must still match the sequential oracle
    exactly. Requires the session's maxFailures ≥ 2 (conftest
    local[4, 2])."""
    from pyspark import TaskContext

    df, rows = corpus

    def crashing_map(filename, contents):
        if TaskContext.get().attemptNumber() == 0:
            raise RuntimeError("injected map-stage crash (first attempt)")
        return wc_map(filename, contents)

    def crashing_reduce(key, values):
        if TaskContext.get().attemptNumber() == 0:
            raise RuntimeError("injected reduce-stage crash (first attempt)")
        return wc_reduce(key, values)

    out = run_mapreduce(df, crashing_map, crashing_reduce)
    got = sorted((r.key, r.value) for r in out.collect())
    want = sorted(run_mapreduce_sequential(rows, wc_map, wc_reduce))
    assert got == want


def test_parallelism_probe(spark, corpus):
    """Q5/Q6 analog (mtiming/rtiming, SURVEY.md §2.2): the reference
    asserts ≥2 concurrent map and reduce workers; here the analogous
    guarantees are engine parallelism and multi-partition shuffles."""
    df, _ = corpus
    assert spark.sparkContext.defaultParallelism >= 2
    shuffled = df.select("filename").repartition(4, "filename")
    assert shuffled.rdd.getNumPartitions() == 4
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert n >= 2
