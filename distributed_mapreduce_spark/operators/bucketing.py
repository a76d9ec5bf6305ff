"""Bucketed (co-located) joins: the pre-shuffle strategy for repeated
big-big joins.

A shuffle join moves both fact tables across the network every query.
Bucketing pays that shuffle ONCE at write time — both tables are
hash-partitioned into the same number of buckets on the join key and
stored that way — and every subsequent join on that key runs with NO
exchange on either side (SortMergeJoin over matching bucket files).
At 100 TB this is the difference between re-shuffling petabyte facts
per query and a scan-side merge; it's also the durable analog of the
reference's fixed `ihash(key) % nReduce` layout (SURVEY.md §1.4) —
same idea, but owned by the table format and exploited by the planner.

Caveats encoded here: both sides must agree on bucket count; the join
key must equal the bucket key; `spark.sql.sources.bucketing.enabled`
(default true) governs whether scans expose the bucketed distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int, sort: bool = True
) -> None:
    """Materialize as a bucketed managed table (one shuffle, at write
    time). Sorting within buckets lets SortMergeJoin skip its sort."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner
    elides both exchanges (assert via plans.physical_plan: no Exchange
    above either scan)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
