"""Zone-map data skipping: pruned reads must equal full filtered reads
(soundness) and actually skip files on range-clustered layout
(effectiveness); uncorrelated layout degrades to reading everything,
never to wrong answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_spark.sources import table
from distributed_mapreduce_spark.sources.manifest import (
    read_pruned,
    write_manifest,
)


def _rows(df):
    return sorted((r.event_id, float(r.value)) for r in df.collect())


def test_pruned_read_equals_full_on_clustered_layout(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events").select("event_id", "value")
    path = str(tmp_path / "clustered")
    # range-cluster by value: the write-side half of the contract
    ev.repartitionByRange(8, "value").sortWithinPartitions("value").write.parquet(path)
    write_manifest(path, ["value"])

    lo, hi = 3.0, 6.0
    pruned, read, total = read_pruned(spark, path, "value", lo, hi)
    full = spark.read.parquet(path).where(F.col("value").between(lo, hi))
    assert _rows(pruned) == _rows(full)
    assert total == 8
    assert read < total, "clustered layout must skip files"


def test_pruned_read_sound_on_uncorrelated_layout(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events").select("event_id", "value")
    path = str(tmp_path / "hashed")
    ev.repartition(8, "event_id").write.parquet(path)  # value spans every file
    write_manifest(path, ["value"])

    pruned, read, total = read_pruned(spark, path, "value", 3.0, 6.0)
    full = spark.read.parquet(path).where(F.col("value").between(3.0, 6.0))
    assert _rows(pruned) == _rows(full)
    assert read == total, "no correlation -> nothing skippable"


def test_pruned_read_empty_range(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events").select("event_id", "value")
    path = str(tmp_path / "c2")
    ev.repartitionByRange(4, "value").write.parquet(path)
    write_manifest(path, ["value"])
    pruned, read, total = read_pruned(spark, path, "value", 1e9, 2e9)
    assert pruned.count() == 0
    assert read == 0 and total == 4
