"""Sketch aggregations ([EXT]): approximate distincts and quantiles.

At 100 TB, exact countDistinct shuffles every distinct value; a sketch
shuffles a few KB per group and — critically — MERGES: per-partition
(or per-day, per-shard) sketches union into the global answer without
re-reading data. That mergeability is the whole point; tests assert the
merged estimate stays within error bounds and is deterministic (it may
differ by a hair from a single-pass sketch — sparse→dense transitions
depend on merge order).

Built on Spark's Apache DataSketches HLL functions (hll_sketch_agg /
hll_union_agg — binary, persistable, cross-job mergeable) plus HLL++
approx_count_distinct and percentile_approx for in-query use. No
oracle parity here — DuckDB's approx functions use different sketch
implementations, so correctness is error-bound tests against exact
answers (tests/test_sketches.py), the standard sketch contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col: str | Column, rsd: float = 0.02) -> Column:
    """HLL++ distinct estimate with target relative standard deviation."""
    return F.approx_count_distinct(col, rsd=rsd)


def hll_sketch(col: str | Column, lg_k: int = 12) -> Column:
    """Mergeable DataSketches HLL sketch (binary) — persist per
    partition/day/shard, union later with `hll_merge`."""
    return F.hll_sketch_agg(col, F.lit(lg_k))


def hll_merge(sketch_col: str | Column, allow_different_lg_k: bool = False) -> Column:
    """Union previously materialized sketches."""
    return F.hll_union_agg(sketch_col, F.lit(allow_different_lg_k))


def hll_estimate(sketch_col: str | Column) -> Column:
    return F.hll_sketch_estimate(sketch_col)


def approx_quantiles(
    col: str | Column, probs: list[float], accuracy: int = 10000
) -> Column:
    """Mergeable quantile estimate (Greenwald-Khanna variant)."""
    return F.percentile_approx(col, probs, accuracy)


def distinct_sketch_by(df: DataFrame, group: str, col: str, lg_k: int = 12) -> DataFrame:
    """Materializable per-group sketch table: (group, sketch). The
    scale pattern — write this per ingest batch, merge at query time."""
    return df.groupBy(group).agg(hll_sketch(col, lg_k).alias("sketch"))


def merged_distinct_estimate(sketches: DataFrame) -> DataFrame:
    """Merge a sketch table to one global estimate."""
    return sketches.agg(hll_estimate(hll_merge("sketch")).alias("n_distinct_est"))


# --- KLL quantile sketches (DataSketches, Spark 4.1 built-ins) -------
#
# The mergeable form of the OTHER canonical non-algebraic aggregate:
# percentiles. percentile_approx answers in-query; KLL materializes —
# a persistable binary whose merge is again a KLL sketch, so per-batch
# latency sketches union into the global p99 without re-reading data.
# Unlike HLL union (elementwise register max — byte-deterministic in
# any order), KLL compaction is RANDOMIZED: merged bytes and estimates
# vary slightly run-to-run and by merge order. The contract is the
# published normalized rank error (~1.65% at k=200), not bit equality
# — tests assert rank-error bounds against exact quantiles.

KLL_K = 200  # sketch size parameter: ~1.65% normalized rank error


def kll_sketch(col: str | Column, k: int = KLL_K) -> Column:
    """Mergeable KLL quantile sketch over a DOUBLE column (binary)."""
    return F.kll_sketch_agg_double(col, F.lit(k))


def kll_merge(sketch_col: str | Column, k: int = KLL_K) -> Column:
    """Union previously materialized KLL sketches."""
    return F.kll_merge_agg_double(sketch_col, F.lit(k))


def kll_quantile(sketch_col: str | Column, q: float) -> Column:
    """Quantile estimate (rank q in [0,1]) from a KLL sketch."""
    return F.kll_sketch_get_quantile_double(sketch_col, F.lit(q))


def kll_n(sketch_col: str | Column) -> Column:
    """EXACT stream length recorded by the sketch (n is not estimated)."""
    return F.kll_sketch_get_n_double(sketch_col)


# --- Theta sketches: distinct counts WITH set algebra ----------------
#
# HLL answers |A| only; theta sketches keep a hash sample so
# |A ∪ B|, |A ∩ B|, |A \ B| all estimate from per-set sketches —
# the audience-overlap / cross-source-coverage primitive ("how many
# documents appear in BOTH crawls" at 100 TB without a join: sketch
# each source in one pass, intersect driver-side KB objects).


def theta_sketch(col: str | Column) -> Column:
    """Mergeable theta sketch (binary) over a column's values."""
    return F.theta_sketch_agg(col)


def theta_estimate(sketch_col: str | Column) -> Column:
    return F.theta_sketch_estimate(sketch_col)


def theta_union(a: str | Column, b: str | Column) -> Column:
    return F.theta_union(a, b)


def theta_intersection(a: str | Column, b: str | Column) -> Column:
    return F.theta_intersection(a, b)


def theta_difference(a: str | Column, b: str | Column) -> Column:
    return F.theta_difference(a, b)


# --- Count-min sketch: mergeable per-item frequency estimates --------
#
# The frequency sibling of HLL/KLL: a per-batch/per-group CMS answers
# "how often did THIS item occur" for arbitrary items later, without
# re-scanning — overestimate-only (never under), error ≤ eps·N with
# the configured confidence. The serving pattern: store one sketch per
# day/source (a few KB-MB each), merge driver-side (sketches are
# KB-sized objects, the bounded-collect kind), probe for the items of
# interest (suspected heavy hitters, watchlists, known contaminants).

CMS_EPS = 0.001
CMS_CONFIDENCE = 0.99
CMS_SEED = 42  # merge requires identical (eps, confidence, seed)


def cms_sketch(
    col: str | Column,
    eps: float = CMS_EPS,
    confidence: float = CMS_CONFIDENCE,
    seed: int = CMS_SEED,
) -> Column:
    """Mergeable count-min sketch (binary) over a string column."""
    return F.count_min_sketch(
        col, F.lit(eps), F.lit(confidence), F.lit(seed)
    )


def cms_sketch_by(
    df: DataFrame, group: str, col: str, eps: float = CMS_EPS
) -> DataFrame:
    """Materializable per-group frequency-sketch table: (group,
    sketch). Write per ingest batch, merge + probe at query time."""
    return df.groupBy(group).agg(cms_sketch(col, eps).alias("sketch"))


class CmsReader:
    """Driver-side probe over one or more serialized CMS blobs (merged
    in place — blobs must share eps/confidence/seed). Deserialization
    uses Spark's own org.apache.spark.util.sketch.CountMinSketch, the
    class that wrote the bytes."""

    def __init__(self, spark, blobs):
        jvm = spark._jvm
        self._cms = None
        for blob in blobs:
            bis = jvm.java.io.ByteArrayInputStream(bytes(blob))
            s = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
            if self._cms is None:
                self._cms = s
            else:
                self._cms.mergeInPlace(s)
        if self._cms is None:
            raise ValueError("no sketches given")

    def estimate(self, item: str) -> int:
        return int(self._cms.estimateCount(item))

    def total(self) -> int:
        return int(self._cms.totalCount())


def source_overlap_matrix(
    df: DataFrame, source_col: str, key_col: str
) -> DataFrame:
    """Pairwise |A∩B| / |A∪B| estimates across sources from ONE scan:
    sketch each source's key set, then combine the (few) per-source
    sketches pairwise — #sources² tiny-sketch combines, never a
    key-space self-join. Returns (source_a, source_b, n_a, n_b,
    n_intersection, n_union) for source_a < source_b."""
    sk = df.groupBy(source_col).agg(theta_sketch(key_col).alias("sk"))
    a, b = sk.alias("a"), sk.alias("b")
    asrc, bsrc = F.col(f"a.{source_col}"), F.col(f"b.{source_col}")
    return (
        a.join(b, asrc < bsrc)
        .select(
            asrc.alias("source_a"),
            bsrc.alias("source_b"),
            theta_estimate("a.sk").alias("n_a"),
            theta_estimate("b.sk").alias("n_b"),
            theta_estimate(theta_intersection("a.sk", "b.sk")).alias(
                "n_intersection"
            ),
            theta_estimate(theta_union("a.sk", "b.sk")).alias("n_union"),
        )
    )
