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


def test_kll_quantile_sketch_merges_within_rank_error(spark, docs):
    """Per-source KLL sketches merged into a global sketch: the merged
    p50/p95 must sit within ~3x the k=200 normalized rank error (1.65%)
    of the exact rank positions, and the recorded stream length n is
    EXACT under merging (n is counted, never estimated)."""
    from distributed_mapreduce_spark.operators.sketches import (
        kll_merge,
        kll_n,
        kll_quantile,
        kll_sketch,
    )

    parts = docs.groupBy("source").agg(
        kll_sketch(F.col("n_chars").cast("double")).alias("sk")
    )
    merged = parts.agg(kll_merge("sk").alias("sk")).select(
        kll_quantile("sk", 0.5).alias("p50"),
        kll_quantile("sk", 0.95).alias("p95"),
        kll_n("sk").alias("n"),
    ).collect()[0]
    n_exact = docs.count()
    assert merged.n == n_exact
    # rank-error contract: the estimated quantile's true RANK is within
    # eps of the requested rank (value-space error can be anything on a
    # skewed column, rank-space is what KLL bounds)
    for q, v in ((0.5, merged.p50), (0.95, merged.p95)):
        rank = docs.where(F.col("n_chars") <= v).count() / n_exact
        assert abs(rank - q) < 0.05, (q, v, rank)


def test_theta_source_overlap_matrix_within_bounds(spark, docs):
    """Theta-sketch set algebra vs exact set ops per source pair:
    |A∩B| and |A∪B| estimates within 5% (theta default k ⇒ <1% rsd;
    5% ≈ 5 sigma). The doc_id keyspace is disjoint per source in the
    fixture, so intersect on the CONTENT hash instead — real overlap."""
    from distributed_mapreduce_spark.operators.sketches import (
        source_overlap_matrix,
    )

    keyed = docs.select("source", F.md5("text").alias("k"))
    got = {
        (r.source_a, r.source_b): r
        for r in source_overlap_matrix(keyed, "source", "k").collect()
    }
    sources = [r[0] for r in keyed.select("source").distinct().collect()]
    assert len(got) == len(sources) * (len(sources) - 1) // 2
    sets = {
        s: {r.k for r in keyed.where(F.col("source") == s).collect()}
        for s in sources
    }
    for (a, b), r in got.items():
        inter, uni = len(sets[a] & sets[b]), len(sets[a] | sets[b])
        assert abs(r.n_union - uni) / uni < 0.05
        # intersection error is relative to the UNION size (theta
        # intersection error compounds from both operands)
        assert abs(r.n_intersection - inter) <= max(0.05 * uni, 2.0)


def test_cms_merged_estimates_bound_exact_counts(spark, docs):
    """Count-min contract on per-source token sketches merged
    driver-side: estimates NEVER underestimate, overestimate by at
    most eps x total stream length, and the merged total equals the
    exact stream length. Probed items: the true global top tokens plus
    an absent item (estimate ~0, bounded by eps x N)."""
    from distributed_mapreduce_spark.functions.text import tokens
    from distributed_mapreduce_spark.operators.sketches import (
        CMS_EPS,
        CmsReader,
        cms_sketch_by,
    )

    toks = docs.select("source", F.explode(tokens("text")).alias("w"))
    parts = cms_sketch_by(toks, "source", "w")
    reader = CmsReader(spark, [r.sketch for r in parts.collect()])

    n_total = toks.count()
    assert reader.total() == n_total

    top = toks.groupBy("w").count().orderBy(F.desc("count"), "w").limit(10).collect()
    slack = int(CMS_EPS * n_total) + 1
    for r in top:
        est = reader.estimate(r.w)
        assert est >= r["count"], (r.w, est, r["count"])
        assert est <= r["count"] + slack, (r.w, est, r["count"])
    assert reader.estimate("__definitely_not_a_token__") <= slack
