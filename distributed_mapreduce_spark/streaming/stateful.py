"""Streaming KV state fold via applyInPandasWithState — the streaming
form of the reference's declared KV semantics (SURVEY.md §2.3 K2/K3:
put replaces, append concatenates, exactly-once under redelivery;
/root/reference/src/models/kv.go:40-54).

The batch fold (operators/kv.py::fold_kv_log) computes the same final
state in one relational pass; this operator maintains it *incrementally*
per micro-batch with an arbitrary-stateful operator — per-key state is
(current value, high-water seq), redelivered ops (seq ≤ high water) are
ignored, which is the streaming analog of the batch whole-row distinct.

Scale notes: state is partitioned by key across the shuffle
(`spark.sql.shuffle.partitions` state stores); per-key state is O(value
length), not O(ops). Arrow-batched — each micro-batch moves one Arrow
batch per key-group, not per row. For TTL'd state (session-style
expiry) pass a GroupStateTimeout instead of NoTimeout.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

OUT_SCHEMA = "key string, value string, max_seq bigint"
STATE_SCHEMA = "value string, max_seq bigint"


def _fold_group(
    key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    value, max_seq = state.get if state.exists else ("", -1)
    # Vectorized fold (a per-row loop with value += v is quadratic in
    # string length): everything before the batch's LAST put is dead,
    # so the new value is that put's payload + one join of the appends
    # after it. seq ≤ high-water and in-batch re-deliveries drop first
    # — exactly-once (K3). Redelivery is assumed VERBATIM (same seq ⇒
    # same op/value, the at-least-once contract of a seq-numbered log);
    # sorting BEFORE drop_duplicates(keep="first") makes the resolution
    # deterministic (stable kind='stable' sort ⇒ first-seen per seq in
    # seq order) even if a producer ever violated that assumption.
    batch = (
        pd.concat(list(pdfs))
        .query("seq > @max_seq")
        .sort_values("seq", kind="stable")
        .drop_duplicates(subset=["seq"], keep="first")
    )
    if len(batch):
        ops = batch["op"].to_numpy()
        vals = batch["value"].to_numpy()
        puts = (ops == "put").nonzero()[0]
        if len(puts):
            p = puts[-1]
            tail = vals[p + 1 :][ops[p + 1 :] == "append"]
            value = vals[p] + "".join(tail)
        else:
            value = value + "".join(vals[ops == "append"])
        max_seq = int(batch["seq"].iloc[-1])
    state.update((value, max_seq))
    yield pd.DataFrame({"key": [key[0]], "value": [value], "max_seq": [max_seq]})


def kv_state_stream(ops: DataFrame) -> DataFrame:
    """Fold a streaming op log `(key, seq, op, value)` into running
    state; emits (key, value, max_seq) per key per micro-batch that
    touched it. `get` ops must be filtered upstream (reads don't
    mutate)."""
    return ops.groupBy("key").applyInPandasWithState(
        _fold_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_state(updates: DataFrame) -> DataFrame:
    """Collapse the update stream's sink table to the final state per
    key (highest high-water seq wins): one partial-aggregating shuffle
    (max_by), no Window sort. Ties (a key re-emitted at the same
    high-water seq by an all-redelivery batch) carry identical values
    by construction, so the pick is value-deterministic."""
    from pyspark.sql import functions as F

    return updates.groupBy("key").agg(
        F.max_by("value", "max_seq").alias("value")
    )


def stream_distinct(ev: DataFrame, cols: list[str]) -> DataFrame:
    """Streaming exact deduplication: emit each distinct key combination
    once, on first arrival (append mode). State = one entry per distinct
    key, shared across micro-batches — the streaming twin of the batch
    exact-dedup tier (operators/dedup.py).

    Scale notes: dedup state is hash-partitioned across the state
    stores and grows with key cardinality, never with row count. On an
    unbounded stream whose duplicates have bounded lateness, swap in
    `dropDuplicatesWithinWatermark` after `withWatermark(...)` so closed
    keys age out of the store; on a bounded replay (and for keys that
    can recur forever, like (user, event_type)) the unwindowed form
    below is the correct semantics."""
    return ev.select(*cols).dropDuplicates(cols)
