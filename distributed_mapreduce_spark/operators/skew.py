"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized *partitions*; salting is the explicit
plan-level tool for the cases AQE can't fix:
- a single hot KEY inside one partition (AQE can split the partition,
  but a sort-merge join still sends every hot-key row to one task pair);
- skewed aggregations whose agg functions aren't partial-friendly
  (collect_list/distinct) — partial agg doesn't shrink a hot group.

Two-phase pattern: spray the hot key across `n_salts` sub-keys, do the
heavy work per sub-key, then combine. The reference has no analog — its
fixed `ihash(key)%10` partitioning (SURVEY.md §1.4) sends every
occurrence of a hot key to one reduce task.

Scale notes: `salted_agg` adds one extra (cheap, combiner-friendly)
shuffle stage; `salted_join` replicates only the build side's hot-key
rows n_salts-fold. Identify hot keys with `hot_keys` on a sample —
at 100 TB never on the full table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def hot_keys(df: DataFrame, key: str, min_share: float = 0.01, sample: float = 0.01) -> list:
    """Keys whose frequency share exceeds `min_share`, estimated on a
    `sample` fraction (deterministic seed). Driver-side result is tiny
    by construction (≤ 1/min_share keys)."""
    s = df.sample(fraction=sample, seed=7) if sample < 1.0 else df
    total = s.count()
    if total == 0:
        return []
    rows = (
        s.groupBy(key)
        .count()
        .where(F.col("count") >= min_share * total)
        .select(key)
        .collect()
    )
    return [r[0] for r in rows]


def _salt(n_salts: int) -> Column:
    """Deterministic per-row salt (0..n_salts-1) from a whole-row hash —
    reproducible across retries, unlike rand()."""
    return F.pmod(F.xxhash64(F.struct("*")), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-safe aggregation: groupBy(key, salt) → partial,
    then groupBy(key) → combine. `aggs` maps output column →
    (input column, fn) with fn ∈ {count, sum, min, max, collect_list}.

    For algebraic fns Spark's own partial agg already does this inside
    one shuffle; the value here is for holistic aggs (collect_list)
    where phase 1 bounds any single task's group to ~|hot|/n_salts rows.
    """
    phase1_fns = {
        "count": lambda c: F.count(c),
        "sum": lambda c: F.sum(c),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
        "collect_list": lambda c: F.collect_list(c),
    }
    combine_fns = {
        "count": F.sum,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "collect_list": lambda c: F.flatten(F.collect_list(c)),
    }
    p1 = df.withColumn("__salt", _salt(n_salts)).groupBy(key, "__salt").agg(
        *[phase1_fns[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return p1.groupBy(key).agg(
        *[combine_fns[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot: Sequence,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: rows of `left` with a hot key are sprayed
    across n_salts sub-keys; `right`'s hot rows are replicated to every
    sub-key; cold keys join on salt 0 unreplicated. Equivalent to
    left.join(right, key, how) for how ∈ {inner, left}.

    Use when both sides are too big to broadcast and a few keys
    dominate — the classic fact⋈fact skew case.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    hot_arr = F.array(*[F.lit(k) for k in hot])
    is_hot = F.array_contains(hot_arr, F.col(key)) if hot else F.lit(False)

    l_salted = left.withColumn(
        "__salt", F.when(is_hot, _salt(n_salts)).otherwise(F.lit(0))
    )
    # Replicate only the build side's hot rows (explode is a generator,
    # so hot/cold split + union rather than a conditional explode).
    r_cold = right.where(~is_hot).withColumn("__salt", F.lit(0))
    r_hot = right.where(is_hot).withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_cold.unionByName(r_hot), [key, "__salt"], how).drop("__salt")
