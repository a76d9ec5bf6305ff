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
