"""Stream-stream interval join ([EXT] — the attribution-join shape:
match each purchase to the clicks that preceded it within a time
bound, both sides unbounded streams).

Both sides carry a watermark and the join condition carries a time
interval, which is what lets Spark bound the join state: a click row
can be evicted once the watermark passes click_ts + bound (no future
purchase can match it), symmetrically for purchases. Without the
interval condition the state grows forever — the watermark+interval
pair IS the operator's scale contract.

Scale notes: state is hash-partitioned by the equality key (user_id)
across the state stores; per-key state holds only rows inside the
current watermark horizon (≈ bound + watermark delay of traffic), so
state size tracks traffic *rate*, not stream length. On an in-order
replay (event-time ≈ arrival order, disorder < the watermark delay)
the inner join emits exactly the batch join — the equivalence the
oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    bound: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner join: (user_id, click_ts, purchase_ts, value) for every
    purchase within [click_ts, click_ts + bound] by the same user."""
    c = clicks.select("user_id", F.col("ts").alias("click_ts")).withWatermark(
        "click_ts", watermark
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        "value",
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {bound}"))
    )
    return c.join(p, cond, "inner").select(
        "user_id", "click_ts", "purchase_ts", "value"
    )


def interval_join_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    bound: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the semantics the inner
    form can't give: every click appears, unconverted ones with NULL
    purchase columns. The null row for an unmatched click is emitted
    by STATE TIMEOUT, not by data: only once the watermark passes
    click_ts + bound can the engine prove no future purchase will
    match, so the trailing no-data batch (needs_watermark_flush) is
    the emission point for the tail — the same mechanism as append-
    mode session closing (st_q3), here on join state. The oracle
    carries the matching cutoff: matched rows are the batch interval
    join; null rows are exactly the clicks with no match whose
    [click_ts, click_ts + bound] window closed before the final
    watermark. State contract is identical to the inner form (interval
    + watermark bound eviction)."""
    c = clicks.select("user_id", F.col("ts").alias("click_ts")).withWatermark(
        "click_ts", watermark
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        "value",
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {bound}"))
    )
    return c.join(p, cond, "leftOuter").select(
        "user_id", "click_ts", "purchase_ts", "value"
    )
