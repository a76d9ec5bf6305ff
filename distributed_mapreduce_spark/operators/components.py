"""Connected components over a pair graph — the clustering step that
turns near-dup PAIRS (operators/dedup.py) into dedup GROUPS (keep one
doc per component).

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round, every node adopts the minimum label in its
neighborhood (via a join with the symmetrized edge list); stop when no
label changed. Converges in O(graph diameter) rounds — near-dup graphs
are unions of small cliques, so diameter is tiny (2-3) regardless of
corpus size. Each round is one broadcast-or-shuffle join + one min-agg;
the driver sees only a single converged? count per round, never data.

This is the simple variant of the large-star/small-star map-reduce CC
algorithm; for graphs with long chains swap in alternating star
rounds — same DataFrame shapes, fewer iterations.

localCheckpoint() per round truncates the lineage (iterative plans
otherwise grow exponentially and re-execute every prior round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERS = 25


def connected_components(
    edges: DataFrame, src: str = "id_i", dst: str = "id_j", max_iters: int = MAX_ITERS
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum
    node id reachable from it. Returns (id, component)."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    sym = sym.localCheckpoint()
    for _ in range(max_iters):
        # each node's new label: min(own, min over neighbors' labels)
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    "component", F.coalesce("nmin", F.col("component"))
                ).alias("component"),
                (F.col("nmin") < F.col("component")).alias("__chg"),
            )
            .localCheckpoint()
        )
        changed = updated.where(F.col("__chg")).limit(1).count()
        labels = updated.drop("__chg")
        if changed == 0:
            break
    return labels
