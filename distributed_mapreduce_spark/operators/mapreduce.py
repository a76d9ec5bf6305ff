"""Generic MapReduce UDF surface — SURVEY.md §2.1 O1-O7, faithfully.

The reference's whole engine is one parameterized pipeline
(/root/reference/src/mr/worker.go:76-223):

    scan(file → (filename, contents))          O1
    → mapf(filename, contents) -> [(k, v)]     O2  flatMap
    → hash-partition on k into nReduce buckets O3  (ihash%n, worker.go:40-44)
    → gather + sort by key                     O4/O5
    → per-key reducef(key, [values]) -> value  O6
    → "key value" text sink                    O7

Here that pipeline is ``run_mapreduce``: the ONE place the engine uses
RDDs, because arbitrary user ``mapf``/``reducef`` closures are exactly
the per-partition imperative case the DataFrame API can't express. The
idiomatic fast paths for the reference's actual workloads live in
queries/mapreduce_queries.py — at scale prefer those (JVM-side,
partial-agg); this surface exists for parity with the reference's
pluggable-UDF contract (worker.go:25-26).

Scale notes: ``repartitionAndSortWithinPartitions`` gives the
sort-based grouping of O5/O6 with Spark's external (spilling) sorter,
so a hot key's value list streams from disk instead of requiring the
reference's whole-partition-in-memory sort (worker.go:149-183). Output
contract is order-insensitive per key group, matching the reference's
`sort | cmp` oracle (src/main/test-mr.sh:59-67) — not byte-identical
file layout (SURVEY.md §7.3 hard spot 1).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

MapF = Callable[[str, str], list[tuple[str, str]]]
ReduceF = Callable[[str, list[str]], str]

OUT_SCHEMA = "key string, value string"


def run_mapreduce(
    inputs: DataFrame,
    mapf: MapF,
    reducef: ReduceF,
    num_partitions: int = 10,
) -> DataFrame:
    """Execute one generic MapReduce job over (filename, contents) rows.

    Exactly the reference contract: ``mapf`` is called once per input
    row and returns a list of (key, value) string pairs
    (worker.go:83-90); ``reducef`` is called once per distinct key with
    every value for that key (worker.go:200-223). Scheduling, shuffle,
    retry, stage barriers, and atomic output are Spark built-ins
    (SURVEY.md §4.2) — no custom scheduler.
    """
    spark = inputs.sparkSession

    def apply_map(row) -> Iterable[tuple[str, str]]:
        return mapf(row[0], row[1])

    pairs = inputs.rdd.flatMap(apply_map)

    # O3+O5: one shuffle that hash-partitions on key AND sorts each
    # partition by key (the reference does these as two steps:
    # ihash%n at worker.go:123-131, then an in-memory sort at :181-183).
    keyed = pairs.map(lambda kv: (kv[0], kv[1]))
    # default partitionFunc = portable_hash: deterministic across
    # executors (Spark pins PYTHONHASHSEED for workers), playing the
    # role of the reference's FNV-32a ihash%n.
    shuffled = keyed.repartitionAndSortWithinPartitions(numPartitions=num_partitions)

    # O6: streaming group-run loop over the sorted partition — the same
    # single pass as worker.go:205-221, but spill-safe.
    def reduce_runs(it: Iterator[tuple[str, str]]) -> Iterator[tuple[str, str]]:
        cur_key: str | None = None
        values: list[str] = []
        for k, v in it:
            if cur_key is not None and k != cur_key:
                yield (cur_key, reducef(cur_key, values))
                values = []
            cur_key = k
            values.append(v)
        if cur_key is not None:
            yield (cur_key, reducef(cur_key, values))

    out = shuffled.mapPartitions(reduce_runs, preservesPartitioning=True)
    return spark.createDataFrame(out, schema=OUT_SCHEMA)


def run_mapreduce_sequential(
    rows: list[tuple[str, str]], mapf: MapF, reducef: ReduceF
) -> list[tuple[str, str]]:
    """Pure-Python sequential oracle — the mrsequential pattern
    (/root/reference/src/main/mrsequential.go:25-87): map everything,
    one global sort, one group-run pass. Used by tests to golden-check
    the distributed path, exactly like test-mr.sh does."""
    intermediate: list[tuple[str, str]] = []
    for filename, contents in rows:
        intermediate.extend(mapf(filename, contents))
    intermediate.sort(key=lambda kv: kv[0])
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(intermediate):
        j = i
        while j < len(intermediate) and intermediate[j][0] == intermediate[i][0]:
            j += 1
        key = intermediate[i][0]
        out.append((key, reducef(key, [kv[1] for kv in intermediate[i:j]])))
        i = j
    return out


# ---------------------------------------------------------------------------
# The reference's application UDFs (src/mrapps/*.go), as Python pairs.
# ---------------------------------------------------------------------------

import re

_WORD_RE = re.compile(r"[A-Za-z]+")


def wc_map(filename: str, contents: str) -> list[tuple[str, str]]:
    """wc.go:21-34 — emit (word, "1") per occurrence, words = letter runs."""
    return [(w, "1") for w in _WORD_RE.findall(contents)]


def wc_reduce(key: str, values: list[str]) -> str:
    """wc.go:41-44 — occurrence count."""
    return str(len(values))


def indexer_map(filename: str, contents: str) -> list[tuple[str, str]]:
    """indexer.go:20-31 — per-document distinct words → (word, docname)."""
    return [(w, filename) for w in set(_WORD_RE.findall(contents))]


def indexer_reduce(key: str, values: list[str]) -> str:
    """indexer.go:36-39 — "<count> <doc1,doc2,...>" with sorted docs."""
    return f"{len(values)} {','.join(sorted(values))}"


def crash_map(filename: str, contents: str) -> list[tuple[str, str]]:
    """crash.go:34-43 / nocrash.go:26-37 — 4 fixed keys per document.
    (The random crash/sleep is fault-injection, not query semantics —
    Spark's task retry is the analog; SURVEY.md §2.2 Q3.)"""
    return [
        ("a", filename),
        ("b", str(len(filename))),
        ("c", str(len(contents))),
        ("d", "xyzzy"),
    ]


def crash_reduce(key: str, values: list[str]) -> str:
    """crash.go:45-55 — sort values, join with space."""
    return " ".join(sorted(values))


# ---------------------------------------------------------------------------
# queries() entries: the generic surface run over the documents corpus.
# ---------------------------------------------------------------------------


def mr_generic_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 via the *generic* UDF pipeline (counts as strings — the
    reference is stringly-typed, SURVEY.md §1.1)."""
    from distributed_mapreduce_spark.sources import whole_documents

    return run_mapreduce(whole_documents(spark, sf_dir), wc_map, wc_reduce)


def mr_generic_indexer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 via the generic UDF pipeline: value = "<n> <docs,...>"."""
    from distributed_mapreduce_spark.sources import whole_documents

    return run_mapreduce(whole_documents(spark, sf_dir), indexer_map, indexer_reduce)


# mr_generic_wordcount is the deliberate twin of the idiomatic
# mr_q1_wordcount (same answer, generic-UDF engine vs DataFrame plan);
# it sits in the shadow tier so the generic engine keeps one graded
# representative (mr_generic_indexer) without spending two grading-cap
# slots on one operator family (registry.py docstring).
SHADOW_ORACLES = {
    "mr_generic_wordcount": """
        SELECT word AS key, CAST(count(*) AS VARCHAR) AS value
        FROM (
            SELECT unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS word
            FROM documents
        )
        WHERE word <> ''
        GROUP BY word
    """,
}

ORACLES = {
    "mr_generic_indexer": """
        WITH word_doc AS (
            SELECT DISTINCT word, doc FROM (
                SELECT unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS word,
                       source || '-' || CAST(doc_id AS VARCHAR) AS doc
                FROM documents
            )
            WHERE word <> ''
        )
        SELECT word AS key,
               CAST(count(doc) AS VARCHAR) || ' ' || string_agg(doc, ',' ORDER BY doc) AS value
        FROM word_doc
        GROUP BY word
    """,
}

QUERIES = {
    "mr_generic_indexer": mr_generic_indexer,
}

SHADOW_QUERIES = {
    "mr_generic_wordcount": mr_generic_wordcount,
}
