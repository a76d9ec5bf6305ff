"""Sketch contract tests: error bounds vs exact, and exact mergeability
(the property that makes sketches the 100 TB path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    distinct_sketch_by,
    hll_estimate,
    hll_merge,
    merged_distinct_estimate,
)
from distributed_mapreduce_spark.sources import table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return table(spark, SF, "documents")


def test_approx_distinct_within_rsd(spark, docs):
    exact = docs.select(F.countDistinct("text")).collect()[0][0]
    est = docs.select(approx_distinct("text", rsd=0.02)).collect()[0][0]
    assert abs(est - exact) / exact < 0.1  # 5 sigma of rsd=0.02


def test_hll_sketch_merge_within_bounds_and_deterministic(spark, docs):
    """Union of per-source sketches estimates the global distinct count
    within HLL error bounds (it need not bit-match a single-pass sketch:
    sparse→dense mode transitions differ by merge order), and the merge
    is deterministic."""
    parts = distinct_sketch_by(docs, "source", "text")
    merged = merged_distinct_estimate(parts).collect()[0][0]
    merged2 = merged_distinct_estimate(parts).collect()[0][0]
    assert merged == merged2
    exact = docs.select(F.countDistinct("text")).collect()[0][0]
    assert abs(merged - exact) / exact < 0.1
    whole = docs.agg(
        hll_estimate(F.hll_sketch_agg("text", F.lit(12)))
    ).collect()[0][0]
    assert abs(whole - exact) / exact < 0.1


def test_approx_quantiles_bracket_exact(spark, docs):
    got = docs.select(approx_quantiles("n_chars", [0.5, 0.95])).collect()[0][0]
    exact_med = docs.selectExpr("percentile(n_chars, 0.5)").collect()[0][0]
    lo, hi = docs.select(F.min("n_chars"), F.max("n_chars")).collect()[0]
    assert lo <= got[0] <= hi and lo <= got[1] <= hi
    assert abs(got[0] - exact_med) / max(exact_med, 1) < 0.05
