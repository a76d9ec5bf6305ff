"""Change-data-capture merge (the Delta/Iceberg MERGE INTO shape) as a
pure DataFrame operator: apply a batch of keyed changes — upserts and
deletes — onto a base table, last-writer-wins by a total change order.

Semantics:
- A change row is (key, ord, is_delete, payload...). Per key, only the
  change with the highest `ord` matters (last-writer-wins; `ord` must
  be a total order per key — a CDC log offset, never a wall clock).
- Winning upsert: replaces the base row (or inserts a new one).
- Winning delete: removes the key (a tombstone, whether or not the
  base had it).
- Keys without changes pass through untouched.

Scale shape: one keyed agg over the change batch (max_by — partial-agg
friendly, shuffle ∝ batch keys) + one equi-join against the base. The
join side is the BATCH key set, selective by nature, so AQE broadcasts
it; the base is never shuffled. This is the standard incremental-merge
cost model: ∝ base-scan + batch, not base-shuffle. Combine with
sources/files.write_partitioned(dynamic=True) to rewrite only the
partitions the batch touches (the operators/incremental.py pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    ord_col: str = "ord",
    delete_col: str = "is_delete",
) -> DataFrame:
    """MERGE the change batch into `base` (schemas must match on the
    payload columns; `changes` carries `ord_col` and `delete_col` in
    addition). Returns the merged table with base's schema."""
    payload = [c for c in base.columns if c != key]
    winner = (
        changes.groupBy(key)
        .agg(
            *[
                F.max_by(c, F.col(ord_col)).alias(c)
                for c in payload + [delete_col]
            ]
        )
    )
    joined = base.alias("b").join(F.broadcast(winner).alias("w"), key, "full_outer")
    keep = F.col(f"w.{delete_col}").isNull() | (F.col(f"w.{delete_col}") == 0)
    # full outer keeps: base-only rows (no change), matched rows
    # (upsert wins), change-only rows (insert). Deletes drop in all
    # arms. A change row's payload can itself be null-valued — the
    # winner side is detected via delete_col (non-null iff a change
    # row won), not via payload nullness.
    has_change = F.col(f"w.{delete_col}").isNotNull()
    final_cols = [
        F.when(has_change, F.col(f"w.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
        for c in payload
    ]
    return joined.where(keep).select(F.col(key), *final_cols)
