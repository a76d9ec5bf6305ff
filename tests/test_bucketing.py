"""Bucketed-join strategy: joining two same-bucketed tables must run
without a shuffle (no Exchange in the plan), and match the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce_spark import plans
from distributed_mapreduce_spark.operators.bucketing import bucketed_join, write_bucketed
from distributed_mapreduce_spark.sources import table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_quantity").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(li, "b_lineitem", "o_orderkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # Model the 100 TB case: neither fact side fits a broadcast, so the
    # planner must pick SortMergeJoin — which the shared bucketing then
    # runs with zero exchanges (at sf0.01 it would broadcast instead).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = plans.physical_plan(df)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed):
    got = (
        bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .collect()[0]
    )
    orders = table(spark, SF, "orders")
    li = table(spark, SF, "lineitem")
    want = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .collect()[0]
    )
    assert tuple(got) == tuple(want)
