"""Event-time window aggregations ([EXT]): tumbling, sliding, session.

Each function takes *either* a batch or a streaming DataFrame and
returns the same logical aggregation — the batch twin IS the streaming
query, which is both the test oracle (tests/test_streaming.py asserts
stream == batch on the replayed fixture) and the deployment story
(backfill and live paths share one definition).

Watermarks bound state: a window/session closes once event time passes
its end + delay, so state size is O(open windows), not O(history) —
the difference between a stream job that runs forever and one that
OOMs in week two. Late rows beyond the watermark are dropped (asserted
in tests via an out-of-order replay).

Scale notes: window aggs shuffle once on (window, key) with partial
aggregation map-side, same as batch groupBy. Session windows shuffle on
the session key; per-key state is the open session only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributed_mapreduce_spark.queries.relational import dec, money

DEFAULT_WATERMARK = "1 hour"


def _maybe_watermark(ev: DataFrame, watermark: str | None) -> DataFrame:
    # withWatermark is streaming-only semantics; on batch it's a no-op
    # but Spark still validates — keep the call unified.
    return ev.withWatermark("ts", watermark) if watermark and ev.isStreaming else ev


def _flat_window(prefix: str = "window") -> list[Column]:
    return [
        F.col(f"{prefix}.start").alias("window_start"),
        F.col(f"{prefix}.end").alias("window_end"),
    ]


def tumbling_counts(
    ev: DataFrame, width: str = "1 hour", watermark: str | None = DEFAULT_WATERMARK
) -> DataFrame:
    """Per-(window, event_type) count + value sum, tumbling windows."""
    return (
        _maybe_watermark(ev, watermark)
        .groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            money(F.sum(dec("value"))).alias("total_value"),
        )
        .select(*_flat_window(), "event_type", "n_events", "total_value")
    )


def sliding_counts(
    ev: DataFrame,
    width: str = "2 hours",
    slide: str = "1 hour",
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per-window event counts, sliding (overlapping) windows — each
    event lands in width/slide windows."""
    return (
        _maybe_watermark(ev, watermark)
        .groupBy(F.window("ts", width, slide))
        .agg(F.count("*").alias("n_events"))
        .select(*_flat_window(), "n_events")
    )


def session_stats(
    ev: DataFrame, gap: str = "30 minutes", watermark: str | None = DEFAULT_WATERMARK
) -> DataFrame:
    """Per-user session windows (gap-merged): [first_ts, last_ts + gap).
    The streaming form of the batch gaps-and-islands sessionization
    (queries/events_queries.py::ev_q2)."""
    return (
        _maybe_watermark(ev, watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            money(F.sum(dec("value"))).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
