"""Skew operators: salted forms must be result-equivalent to the plain
forms, with the hot key's work actually spread across sub-keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_spark.operators.skew import (
    hot_keys,
    salted_agg,
    salted_join,
)


def skewed_df(spark, n_hot=2000, n_cold=50):
    rows = [("hot", i * 1.0) for i in range(n_hot)]
    rows += [(f"k{i}", i * 1.0) for i in range(n_cold)]
    return spark.createDataFrame(rows, "key string, v double")


def test_hot_keys_detects_the_hot_key(spark):
    df = skewed_df(spark)
    assert hot_keys(df, "key", min_share=0.5, sample=1.0) == ["hot"]


def test_salted_agg_matches_plain(spark):
    df = skewed_df(spark)
    got = salted_agg(
        df, "key", {"n": ("v", "count"), "total": ("v", "sum")}, n_salts=8
    )
    want = df.groupBy("key").agg(F.count("v").alias("n"), F.sum("v").alias("total"))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_salted_agg_collect_list_same_multiset(spark):
    df = skewed_df(spark, n_hot=500, n_cold=10)
    got = salted_agg(df, "key", {"vs": ("v", "collect_list")}, n_salts=8).collect()
    want = df.groupBy("key").agg(F.collect_list("v").alias("vs")).collect()
    assert {r["key"]: sorted(r["vs"]) for r in got} == {
        r["key"]: sorted(r["vs"]) for r in want
    }


def test_salted_join_matches_plain(spark):
    left = skewed_df(spark, n_hot=1000, n_cold=30)
    right = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B"), ("absent", "Z")],
        "key string, tag string",
    )
    for how in ("inner", "left"):
        got = salted_join(left, right, "key", hot=["hot"], n_salts=8, how=how)
        want = left.join(right, "key", how)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect())), how


def test_salted_join_spreads_hot_key(spark):
    left = skewed_df(spark, n_hot=1000, n_cold=0)
    right = spark.createDataFrame([("hot", "H")], "key string, tag string")
    n = 8
    # the salted build side carries one replica per sub-key
    from distributed_mapreduce_spark.operators.skew import _salt

    salts = (
        left.withColumn("s", _salt(n)).select("s").distinct().count()
    )
    assert salts > 1  # hot rows really spray across sub-keys
    got = salted_join(left, right, "key", hot=["hot"], n_salts=n)
    assert got.count() == 1000
