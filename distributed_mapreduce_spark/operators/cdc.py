"""Change-data-capture merge (the Delta/Iceberg MERGE INTO shape) as a
pure DataFrame operator: apply a batch of keyed changes — upserts and
deletes — onto a base table, last-writer-wins by a total change order.

Semantics:
- A change row is (key, ord, is_delete, payload...). Per key, only the
  change with the highest `ord` matters (last-writer-wins; `ord` must
  be a total order per key — a CDC log offset, never a wall clock; on
  an ord tie the winner is engine-nondeterministic by construction).
- Winning upsert: replaces the base row WHOLESALE (or inserts a new
  one). Replacement is row-at-a-time atomic: the winner's entire
  payload — including NULL-valued columns — is taken from one change
  row, picked by a single max_by over a struct, never column-by-column
  (per-column argmax would mix rows on ties and diverge cross-engine
  on NULL payloads).
- Winning delete: removes the key (a tombstone, whether or not the
  base had it).
- Keys without changes pass through untouched.

Scale shape (the incremental-merge cost model: ∝ base-scan + batch,
never base-shuffle): because winners replace base rows wholesale, the
merge needs no base↔batch column arbitration at all —

    survivors = base LEFT ANTI JOIN winner-keys   (broadcast build)
    result    = survivors UNION ALL winning-upserts

The batch key set is selective by nature, so it broadcasts; LEFT ANTI
is a broadcast-hash-join shape (unlike FULL OUTER, which Spark cannot
broadcast — a full-outer formulation silently drops the hint and
shuffle-sorts BOTH sides, the precise 100 TB scale-killer this shape
exists to avoid; asserted base-unshuffled in tests/test_plans.py).
The only shuffle anywhere is the batch's own max_by agg (partial-agg
friendly, ∝ batch keys). Combine with
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
    addition). Returns the merged table with base's schema.

    Cross-batch ordering contract (ADVICE r6): the base carries no
    `ord` column, so a batch winner replaces the stored row
    UNCONDITIONALLY — last-writer-wins across batches therefore
    requires that batches deliver each key's changes in nondecreasing
    `ord` order (true of a CDC log read in offset order, Spark's file
    and Kafka sources included). Under out-of-order cross-batch
    redelivery a stale change would overwrite a newer row. If the feed
    cannot guarantee per-key order, persist `ord` in the snapshot and
    gate the replace on `change.ord >= base.ord` — a one-column cost
    this operator deliberately avoids for ordered feeds."""
    payload = [c for c in base.columns if c != key]
    # One max_by over the whole change row as a struct: the winning
    # (delete flag, payload...) is picked atomically from the single
    # highest-ord row — NULL payload values ride along (they are data,
    # not absence), and no per-column tie mixing is possible.
    winner = (
        changes.groupBy(key)
        .agg(F.max_by(F.struct(delete_col, *payload), F.col(ord_col)).alias("_w"))
        .select(key, "_w.*")
    )
    survivors = base.join(F.broadcast(winner.select(key)), key, "left_anti")
    upserts = winner.where(
        F.col(delete_col).isNull() | (F.col(delete_col) == 0)
    ).select(key, *payload)
    return survivors.select(key, *payload).unionByName(upserts)
