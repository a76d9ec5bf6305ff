"""As-of (most-recent-prior) join — composed from DataFrame ops.

Spark has no ASOF JOIN operator (DuckDB/Pandas do). A naive range
join (`l.ts >= r.ts` + windowed max) explodes to O(L×R_key) pairs
before pruning; the composition here is the scale-correct union-scan
form:

    union(left tagged, right tagged)
      → window last(right_row, ignoreNulls) over
          (partition by key order by (ts, side) rows unbounded preceding)
      → keep left rows

One shuffle on the key (the window), zero joins, no pair blowup: each
row carries the latest right-side row seen so far as a single struct
(atomic — never mixes columns of different right rows), which is
exactly the as-of semantics (right.ts <= left.ts, ties inclusive —
right sorts before left at equal ts). This is the standard sort-based
as-of algorithm expressed declaratively, so Catalyst parallelizes it
by key the same way it runs any window.

Skew note: the window partitions by key; a single hot key serializes
its own timeline (inherent to as-of ordering), but distinct keys
spread across tasks — at 100 TB the key is user/device/symbol with
huge cardinality, which is the good case.

If several right rows share (key, ts), which one wins is unspecified
(same as SQL ASOF); pre-dedupe the right side when its payload matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """For every `left` row, attach the most recent `right` row of the
    same key with right.ts <= left.ts (inclusive). Left rows with no
    prior right row keep nulls. Output: all left columns + `asof_ts` +
    requested right columns prefixed `asof_`."""
    right_cols = right_cols or []
    r_payload = F.struct(
        F.col(ts).alias("ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(r_payload.alias("__r")).schema["__r"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        r_payload.alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__asof", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    return carried.select(
        "__l.*",
        F.col("__asof.ts").alias("asof_ts"),
        *[F.col(f"__asof.{c}").alias(f"asof_{c}") for c in right_cols],
    )
