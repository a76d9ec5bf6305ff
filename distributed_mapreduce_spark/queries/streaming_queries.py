"""Structured Streaming queries over the replayed `events` fixture
([EXT] — SURVEY.md §7.1 step 5).

Each entry stages the fixture into seq-ordered chunks, replays them as
a K-micro-batch stream (Trigger.AvailableNow), and returns the sink
table — so the driver's DuckDB oracle checks *streaming* results
against batch SQL. st_q1/st_q2 run complete-mode window aggregations
(exact batch equivalence). st_q3 runs session windows in append mode
under a 1-hour watermark: only sessions the watermark has closed are
emitted, and the oracle carries the same cutoff — watermark semantics
are part of the checked contract, not just a test. st_q4 folds KV state
incrementally with applyInPandasWithState and must equal the one-shot
batch fold (operators/kv.py), i.e. the DuckDB state-fold SQL.
"""

from __future__ import annotations

import atexit
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mapreduce_spark.operators.kv import _FOLD_SQL, ops_projection
from distributed_mapreduce_spark.queries.relational import dec, money
from distributed_mapreduce_spark.sources import table
from distributed_mapreduce_spark.streaming.replay import (
    event_stream,
    run_available_now,
    stage_event_chunks,
)
from distributed_mapreduce_spark.streaming.stateful import (
    kv_state_stream,
    latest_state,
    stream_distinct,
)
from distributed_mapreduce_spark.streaming.windows import (
    session_stats,
    sliding_counts,
    tumbling_counts,
)

import os

# Replay granularity. Correctness is chunk-count-independent (state
# carries across batches; the AvailableNow final watermark flush closes
# the same sessions), so tests pin ≥2 to keep real cross-batch
# semantics while the default stays small: per-batch state-store
# commits are the dominant fixture cost (VERDICT r2 item 4).
N_CHUNKS = int(os.environ.get("DMR_STREAM_CHUNKS", "2"))
SESSION_WATERMARK = "1 hour"

# State-store count = shuffle partitions, fixed at a stream's first
# checkpoint. Size it to micro-batch volume, not cluster width: these
# replays carry ~50k rows/batch, where 32 state stores are pure
# per-batch commit overhead (measured 3×; 8→4 another ~12% off the
# family). A production deployment sets this per stream from expected
# rows/sec before first start.
STREAM_SHUFFLE_PARTITIONS = int(os.environ.get("DMR_STREAM_SHUFFLE", "4"))


# Staged-chunk cache: all five streaming queries replay the same
# fixture, so stage it once per (sf_dir, N_CHUNKS) and clean up at
# process exit. Chunk mtimes (replay order) are baked in at staging, so
# reuse is deterministic.
_CHUNK_CACHE: dict[tuple[str, int], str] = {}


def _staged(sf_dir: str) -> str:
    key = (sf_dir, N_CHUNKS)
    if key not in _CHUNK_CACHE:
        _CHUNK_CACHE[key] = stage_event_chunks(sf_dir, N_CHUNKS)
        atexit.register(shutil.rmtree, _CHUNK_CACHE[key], ignore_errors=True)
    return _CHUNK_CACHE[key]


def _replayed(
    spark: SparkSession,
    sf_dir: str,
    build,
    output_mode: str,
    needs_watermark_flush: bool = False,
) -> DataFrame:
    """Run one bounded replay. `needs_watermark_flush=True` keeps
    Spark's trailing no-data micro-batch — required ONLY when the final
    emission is watermark-triggered (append-mode windows/sessions: rows
    close when the watermark passes them, which happens one batch AFTER
    the last data batch). Complete/update-mode aggs and inner
    stream-stream joins emit on data arrival, so their no-data batch
    does nothing but advance state eviction — pure per-query overhead
    on a terminating replay (~0.9 s measured on the interval join,
    which runs 4×n_partitions join state stores through an empty
    commit). A production continuous job keeps the default (true);
    this is a per-replay choice, not an engine default."""
    chunks = _staged(sf_dir)
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    nodata_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev_nodata = spark.conf.get(nodata_key)
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS))
    spark.conf.set(nodata_key, str(needs_watermark_flush).lower())
    try:
        return run_available_now(build(event_stream(spark, chunks)), output_mode)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        spark.conf.set(nodata_key, prev_nodata)


def st_q1_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window counts (complete mode ⇒ exact batch
    equivalence on the bounded replay)."""
    # watermark=None: complete mode recomputes every window per batch
    # and never evicts, so a watermark adds per-batch event-time
    # tracking without changing a single output row (append/update
    # modes are where it is load-bearing — see st_q3).
    return _replayed(
        spark, sf_dir, lambda ev: tumbling_counts(ev, "1 hour", watermark=None), "complete"
    )


def st_q2_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding-window counts (2h window, 1h slide)."""
    return _replayed(
        spark, sf_dir, lambda ev: sliding_counts(ev, "2 hours", "1 hour"), "complete"
    )


def st_q3_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows, append mode under a 1h watermark —
    emits exactly the sessions the watermark closed."""
    return _replayed(
        spark,
        sf_dir,
        lambda ev: session_stats(ev, "30 minutes", SESSION_WATERMARK),
        "append",
        # Closed sessions are emitted by the watermark advancing AFTER
        # the last data batch — the trailing no-data batch IS the
        # emission point; without it the sink misses every session
        # closed by the final chunk.
        needs_watermark_flush=True,
    )


def st_q4_stateful_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental KV state fold over the replayed op log; final state
    must equal the one-shot batch fold."""
    updates = _replayed(
        spark,
        sf_dir,
        lambda ev: kv_state_stream(ops_projection(ev).where(F.col("op") != "get")),
        "update",
    )
    return latest_state(updates)


def st_q6_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (attribution): purchases matched to
    same-user clicks within 30 minutes, both sides streaming with
    watermarks — must equal the batch interval join on the bounded
    in-order replay."""
    from distributed_mapreduce_spark.streaming.joins import interval_join

    return _replayed(
        spark,
        sf_dir,
        lambda ev: interval_join(
            ev.where(F.col("event_type") == "click"),
            ev.where(F.col("event_type") == "purchase"),
        ),
        "append",
    )


def st_q5_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup of (user_id, event_type): each key emitted
    once on first arrival, with dedup state carried ACROSS micro-batches
    — the sink table must equal batch SELECT DISTINCT."""
    return _replayed(
        spark,
        sf_dir,
        lambda ev: stream_distinct(ev, ["user_id", "event_type"]),
        "append",
    )


_MONEY = "CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)"

ORACLES = {
    "st_q1_tumbling": f"""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
               event_type,
               count(*) AS n_events,
               {_MONEY} AS total_value
        FROM events
        GROUP BY 1, 2, 3
    """,
    "st_q3_session": f"""
        WITH o AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT user_id, ts, value,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM o
        ),
        sess AS (
            SELECT user_id,
                   min(ts) AS session_start,
                   max(ts) + INTERVAL '30 minutes' AS session_end,
                   count(*) AS n_events,
                   {_MONEY} AS total_value
            FROM s
            GROUP BY user_id, sid
        )
        SELECT * FROM sess
        WHERE session_end <= (SELECT max(ts) - INTERVAL '{SESSION_WATERMARK}' FROM events)
    """,
    "st_q4_stateful_kv": _FOLD_SQL,
    "st_q5_stream_dedup": "SELECT DISTINCT user_id, event_type FROM events",
    "st_q6_click_purchase_join": """
        SELECT c.user_id, c.ts AS click_ts, p.ts AS purchase_ts, p.value
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
    """,
}

QUERIES = {
    "st_q1_tumbling": st_q1_tumbling,
    "st_q3_session": st_q3_session,
    "st_q4_stateful_kv": st_q4_stateful_kv,
    "st_q5_stream_dedup": st_q5_stream_dedup,
    "st_q6_click_purchase_join": st_q6_click_purchase_join,
}

def st_q7_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the
    static `customer` dimension (user_id = c_custkey), then a
    complete-mode aggregation per (market segment, event type) — the
    canonical streaming-enrichment shape (a dimension snapshot joined
    into every micro-batch with no state on the static side).

    Scale notes: the static side is broadcast (explicit hint — each
    micro-batch probes an executor-local hash map; no shuffle of the
    stream, no join state store at all, unlike the stream-stream
    st_q6). A dimension too big to broadcast would instead pre-shuffle
    the stream on the join key once via the stateful-op partitioning.
    Oracle: the identical batch join+agg in DuckDB — a bounded
    in-order replay makes stream-static inner join exactly batch."""
    cust = F.broadcast(
        table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
    )
    return _replayed(
        spark,
        sf_dir,
        lambda ev: (
            ev.join(cust, "user_id")
            .groupBy("c_mktsegment", "event_type")
            .agg(
                F.count("*").alias("n_events"),
                money(F.sum(dec("value"))).alias("total_value"),
            )
        ),
        "complete",
    )


def st_q8_click_purchase_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join
    (streaming/joins.py::interval_join_outer): every click, converted
    or not — null purchase rows are emitted by join-state TIMEOUT when
    the watermark proves no match can arrive, so the trailing no-data
    batch is load-bearing (needs_watermark_flush, the st_q3
    mechanism). The oracle mirrors that contract: matched rows = the
    batch interval join; null rows = unmatched clicks whose window
    closed before the final watermark."""
    from distributed_mapreduce_spark.streaming.joins import interval_join_outer

    return _replayed(
        spark,
        sf_dir,
        lambda ev: interval_join_outer(
            ev.where(F.col("event_type") == "click"),
            ev.where(F.col("event_type") == "purchase"),
        ),
        "append",
        needs_watermark_flush=True,
    )


def _cdc_maintained_snapshot(
    spark: SparkSession,
    sf_dir: str,
    ord_expr,
    ordered: bool,
    tag: str,
    as_of: int | None = None,
) -> DataFrame:
    """Shared replay body of st_q9/st_q10 (the _replayed analog for the
    CDC maintenance sinks): stage the fixture chunks, derive the
    rel_q18 change feed with the caller's ord expression, run the
    partition-scoped MERGE sink over a fresh ephemeral store, and
    return the final committed snapshot. The feed's column mapping
    lives HERE, once — it must stay in lock-step with rel_q18's oracle
    SQL, which grades both queries."""
    import atexit as _atexit
    import shutil as _shutil

    from distributed_mapreduce_spark.streaming.replay import ephemeral_dir
    from distributed_mapreduce_spark.streaming.sinks import (
        foreach_batch_cdc_merge_partitioned,
        read_current_partitioned,
    )

    chunks = _staged(sf_dir)
    init = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    # fresh store+checkpoint per call (bench passes must not resume
    # each other's state); kept on disk until process exit because the
    # returned DataFrame reads the store lazily
    store = ephemeral_dir(f"dmr_cdc_{tag}_store_")
    ckpt = ephemeral_dir(f"dmr_cdc_{tag}_ckpt_")
    _atexit.register(_shutil.rmtree, store, ignore_errors=True)

    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS))
    try:
        changes = event_stream(spark, chunks).select(
            (F.col("user_id") + 1).alias("c_custkey"),
            ord_expr.alias("ord"),
            (F.col("event_type") == "error").cast("int").alias("is_delete"),
            F.upper("event_type").alias("c_mktsegment"),
            F.col("value").alias("c_acctbal"),
        )
        q = foreach_batch_cdc_merge_partitioned(
            changes, f"{store}/t", ckpt, "c_custkey", n_buckets=8, init=init,
            ordered=ordered,
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        _shutil.rmtree(ckpt, ignore_errors=True)
    if ordered:
        # the snapshot's persisted ord and delete tombstones are
        # maintenance state, not payload: live_only filters the
        # tombstones (they exist to stop stale-upsert resurrection of
        # deleted keys — see merge_changes_ordered); the ord watermark
        # is then dropped
        return read_current_partitioned(spark, f"{store}/t", live_only=True).select(
            "c_custkey", "c_mktsegment", "c_acctbal"
        )
    return read_current_partitioned(spark, f"{store}/t", as_of=as_of)


def st_q9_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION-SCOPED streaming MERGE INTO
    (streaming/sinks.foreach_batch_cdc_merge_partitioned): the rel_q18
    change feed — events as upserts keyed on user_id→custkey, `error`
    events as delete tombstones, last-writer-wins by event_id —
    replayed as K micro-batches that MAINTAIN a customer snapshot via
    versioned per-partition commits; the graded result is the final
    committed snapshot.

    Why a batch SQL oracle is sound for a streaming maintenance path:
    last-writer-wins by a total per-key order makes the final snapshot
    BATCH-BOUNDARY INVARIANT (merging chunk-by-chunk ≡ merging the
    whole feed once — ✓tested in test_stream_sinks.py), so the oracle
    is rel_q18's one-shot MERGE SQL verbatim and the streaming path is
    value-graded against an independent engine, not just row-counted.

    Scale shape per batch (the VERDICT r6 #1 fix): one max_by agg over
    the batch + broadcast left-anti against ONLY the hash-buckets the
    batch's keys touch (explicit leaf-path read — untouched buckets
    are never listed, opened, scanned, or rewritten; ✓byte-identity
    test) + a rewrite of just those buckets into the batch's version
    dir. Per-batch cost ∝ touched-bucket bytes + batch size, never
    table size."""
    return _cdc_maintained_snapshot(
        spark, sf_dir, F.col("event_id"), ordered=False, tag="lww"
    )


def st_q10_cdc_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-INDEPENDENT streaming MERGE
    (foreach_batch_cdc_merge_partitioned with ordered=True →
    operators/cdc.merge_changes_ordered): the st_q9 change feed but
    with the change order INVERTED (ord = -event_id), so the replay
    delivers each key's changes in mostly-DESCENDING ord — every batch
    after a key's first sighting carries stale, out-of-order changes.
    The ordered sink persists each key's last-applied ord in the
    snapshot and gates replacement on `change.ord >= stored.ord`, so
    stale deliveries are no-ops and the final snapshot equals the
    one-shot argmax(-event_id) MERGE regardless of batch boundaries OR
    delivery order — that one-shot SQL is the graded oracle. The
    unordered st_q9 sink on this same feed would instead keep the
    latest-DELIVERED change per key (wrong under the oracle;
    ✓negative-tested in test_cdc_ordered.py) — this query grades
    exactly the property merge_changes cannot provide.

    Scale shape per batch: st_q9's partition-scoped cost model plus
    one key+ord-only probe scan of the touched buckets (column-pruned
    to two columns); the base payload still never shuffles."""
    return _cdc_maintained_snapshot(
        spark, sf_dir, -F.col("event_id"), ordered=True, tag="ord"
    )


# Sliding windows are tumbling windows with an overlap factor (same
# state-store machinery, each event lands in duration/slide windows) —
# shadow tier behind st_q1 (registry.py grading cap). The stream-static
# join is shadow behind the stream-stream st_q6; the outer interval
# join is shadow behind st_q6 as well (same state machinery + timeout
# emission). The streaming MERGE is shadow behind its batch twin
# rel_q18 (identical oracle — see st_q9's invariance argument); the
# ordered MERGE is shadow behind st_q9 (same sink machinery + the
# ord-persisting gate).
# Mid-history version boundary for the time-travel query: after chunk
# AS_OF_BATCH committed (batch ids are 0-based chunk indices; the init
# base seeds v=-1). For the default 2-chunk replay this is the only
# non-final boundary.
AS_OF_BATCH = N_CHUNKS // 2 - 1


def st_q11_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERSION AS OF time travel, GRADED (streaming/sinks.
    read_current_partitioned(as_of=)): run exactly the st_q9 feed —
    the rel_q18 change stream maintaining a customer snapshot through
    partition-scoped versioned commits — but read the store AS OF the
    mid-history batch boundary instead of the head. The graded rows
    are the historical snapshot: init base merged with ONLY the first
    chunk's changes, reproduced from version manifests alone after
    later versions have already committed on top.

    Oracle soundness: chunks are event_id-ordered count-slices
    (streaming/replay.stage_event_chunks), so the change set batch v
    had seen is the exact rank prefix `rk·K ≤ n·(v+1)` of events —
    the oracle is rel_q18's one-shot MERGE SQL with `ch` restricted to
    that prefix (integer arithmetic only; no float boundary). This
    grades BOTH the as_of manifest fold and the per-version commit
    isolation: any leakage of a later batch's rewrite into an earlier
    version's read fails value-by-value.

    Scale shape: the historical read is metadata-only resolution over
    the same partition-pruned store as st_q9 — time travel costs what
    the live read costs (see SCALE.md Streaming, r13)."""
    return _cdc_maintained_snapshot(
        spark, sf_dir, F.col("event_id"), ordered=False, tag="tt",
        as_of=AS_OF_BATCH,
    )



# Embedding-feed replay granularity for the SemDeDup ingest query —
# ≥2 so real cross-batch probe/merge semantics are exercised; 3 keeps
# a middle batch that both probes the store AND is probed later.
SEMDEDUP_CHUNKS = 3


def st_q12_semdedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SemDeDup ingest
    (streaming/sinks.foreach_batch_semdedup_ingest) graded end-to-end:
    the embeddings fixture replayed as SEMDEDUP_CHUNKS vec_id-ordered
    micro-batches against FROZEN kmeans_train centroids — per batch,
    cell-assign (the shared _kmeans_best_cell expression), verify
    rounded cosine ≥ τ against the batch and the cell-pruned member
    store, fold the edges into the incremental component state
    (per-id labels + the append-only alias log), commit manifest-last.
    The graded result is the surviving representative set
    (rep_id, cell, n_members) read back from the store.

    Why dedup_q19's one-shot SQL is a sound oracle for the streaming
    path: the within-cell pair set is ARRIVAL-ORDER INDEPENDENT (every
    pair is found when the later member arrives — batch-internal or
    batch↔store), transitive closure is order-independent, and union
    is by min id, so the folded labels equal connected_components'
    min-reachable-id labels over the identical edge set; frozen
    kmeans_train centroids are bit-identical to the centroids
    dedup_q19's in-query trainer assigns with (shared training loop +
    shared assignment expression) — so streamed ≡ one-shot
    value-for-value (✓tested at every batch boundary in
    test_stream_sinks, incl. torn-commit replay under real executor
    JVMs in the local-cluster suite).

    Scale shape per batch: batch scan + ONE cell-pruned store read
    (only the batch's own cells, partition-level) + a driver
    union-find over edge-touching ids only (bounded by
    GREEDY_MAX_PAIRS, counted before any collect); store size enters
    only through collisions within probed cells — the SemDeDup
    Σ|cell|² bound, incrementalized."""
    import atexit as _atexit
    import shutil as _shutil

    from distributed_mapreduce_spark.operators.similarity import (
        KM_ITERS,
        KM_K,
        kmeans_train,
    )
    from distributed_mapreduce_spark.queries.simops import DIM, SEMDEDUP_TAU
    from distributed_mapreduce_spark.streaming.replay import (
        ephemeral_dir,
        stage_embedding_chunks,
    )
    from distributed_mapreduce_spark.streaming.sinks import (
        foreach_batch_semdedup_ingest,
        read_semdedup_representatives,
    )

    key = ("emb", sf_dir, SEMDEDUP_CHUNKS)
    if key not in _CHUNK_CACHE:
        _CHUNK_CACHE[key] = stage_embedding_chunks(sf_dir, SEMDEDUP_CHUNKS)
        _atexit.register(_shutil.rmtree, _CHUNK_CACHE[key], ignore_errors=True)
    chunks = _CHUNK_CACHE[key]
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = kmeans_train(emb, DIM, KM_K, KM_ITERS)
    # fresh store+checkpoint per call (bench passes must not resume
    # each other's state); store kept until process exit — the
    # returned DataFrame reads it lazily
    store = ephemeral_dir("dmr_semdedup_store_")
    ckpt = ephemeral_dir("dmr_semdedup_ckpt_")
    _atexit.register(_shutil.rmtree, store, ignore_errors=True)
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS))
    try:
        q = foreach_batch_semdedup_ingest(
            (
                spark.readStream.schema("vec_id bigint, embedding array<float>")
                .option("maxFilesPerTrigger", 1)
                .parquet(chunks)
            ),
            f"{store}/t",
            ckpt,
            cents,
            DIM,
            tau=SEMDEDUP_TAU,
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        _shutil.rmtree(ckpt, ignore_errors=True)
    return read_semdedup_representatives(spark, f"{store}/t")


# First EVO_SPLIT of the N_CHUNKS staged chunks run under the original
# schema; the rest resume over the same checkpoint with the added
# column. chunks are event_id-ordered count-slices, so the oracle's
# added-column CASE uses the exact integer rank predicate.
EVO_SPLIT = max(1, N_CHUNKS // 2)


def st_q13_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-feed SCHEMA EVOLUTION on the partition-scoped CDC sink
    (VERDICT r13 #3 — Delta mergeSchema): the st_q9 feed maintained in
    two stream runs over ONE checkpoint and ONE store. Run 1 (the
    first EVO_SPLIT chunks) merges the original (segment, balance)
    payload; run 2 resumes with an ADDED `c_note` column and
    merge_schema=True — pre-addition versions lack the column on disk,
    every version manifest records its snapshot schema, and the graded
    final read pads never-rewritten partitions with typed NULLs while
    post-addition winners carry values. Graded value-for-value on the
    full evolved snapshot (key, segment, balance, note).

    Oracle soundness: last-writer-wins makes the final snapshot
    batch-boundary invariant (the st_q9 argument), and the addition
    boundary is the exact integer rank prefix rk·N ≤ n·SPLIT over
    event_id order (the st_q11 predicate) — so the one-shot MERGE SQL
    computes c_note = CASE WHEN the winning change lies in the late
    slice THEN its derived value ELSE NULL END, independently of how
    the stream chunked it.

    Scale shape: run 2's per-batch cost is unchanged by evolution —
    the mixed-schema base read is the same touched-bucket fold under
    the newest recorded manifest schema (absent columns pad as typed
    NULLs at the reader), the NULL pad is a projection, and the schema
    record is manifest metadata; nothing rewrites pre-addition
    versions (the Delta add-column contract: old files are never
    touched)."""
    import atexit as _atexit
    import glob as _glob
    import shutil as _shutil

    from distributed_mapreduce_spark.streaming.replay import ephemeral_dir
    from distributed_mapreduce_spark.streaming.sinks import (
        foreach_batch_cdc_merge_partitioned,
        read_current_partitioned,
    )

    chunks = _staged(sf_dir)
    files = sorted(_glob.glob(chunks + "/*.parquet"))
    init = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    feed = ephemeral_dir("dmr_evo_feed_")
    store = ephemeral_dir("dmr_evo_store_")
    ckpt = ephemeral_dir("dmr_evo_ckpt_")
    _atexit.register(_shutil.rmtree, store, ignore_errors=True)
    base_cols = [
        (F.col("user_id") + 1).alias("c_custkey"),
        F.col("event_id").alias("ord"),
        (F.col("event_type") == "error").cast("int").alias("is_delete"),
        F.upper("event_type").alias("c_mktsegment"),
        F.col("value").alias("c_acctbal"),
    ]
    note = F.concat(
        F.upper("event_type"), F.lit("#"), F.col("event_id").cast("string")
    ).alias("c_note")

    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS))
    try:
        for f in files[:EVO_SPLIT]:
            _shutil.copy2(f, feed)
        q = foreach_batch_cdc_merge_partitioned(
            event_stream(spark, feed).select(*base_cols),
            f"{store}/t",
            ckpt,
            "c_custkey",
            n_buckets=8,
            init=init,
        )
        q.awaitTermination()
        for f in files[EVO_SPLIT:]:
            _shutil.copy2(f, feed)
        q = foreach_batch_cdc_merge_partitioned(
            event_stream(spark, feed).select(*base_cols, note),
            f"{store}/t",
            ckpt,
            "c_custkey",
            n_buckets=8,
            merge_schema=True,
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        _shutil.rmtree(ckpt, ignore_errors=True)
        _shutil.rmtree(feed, ignore_errors=True)
    return read_current_partitioned(spark, f"{store}/t")


DECONTAM_CHUNKS = 3

# Benchmark-index memo for st_q14/st_q15: the index is a DETERMINISTIC
# function of (benchmark corpus, pinned params) — bench runs this pair
# 3-5 passes per tier run, and rebuilding the index per pass is pure
# waste (the STORE stays fresh per call; only the static side is
# shared). Keyed per sf_dir; the bands table name carries the sf tag
# so two fixture scales in one session cannot collide.
_DECONTAM_INDEX: dict[str, str] = {}


def _shared_decontam_index(spark: SparkSession, sf_dir: str) -> str:
    from pyspark.sql import functions as F2

    from distributed_mapreduce_spark.queries.pipeline_queries import BENCH_SOURCE
    from distributed_mapreduce_spark.queries.textops import (
        MAX_SHINGLE_DF,
        MINHASH_BANDS,
    )
    from distributed_mapreduce_spark.sources import widen
    from distributed_mapreduce_spark.streaming.replay import ephemeral_dir
    from distributed_mapreduce_spark.streaming.sinks import build_decontam_index

    tag = sf_dir.rstrip("/").split("/")[-1].replace(".", "_").replace("-", "_")
    tbl = f"dmr_decontam_bench_bands_{tag}"
    # the bands table lives in the SESSION catalog while the memoized
    # dirs live on disk — a process that swapped sessions after the
    # first build would hit a stale memo, so validate the table too
    if sf_dir not in _DECONTAM_INDEX or not spark.catalog.tableExists(tbl):
        index = _DECONTAM_INDEX.get(sf_dir) or ephemeral_dir("dmr_decontam_index_")
        build_decontam_index(
            widen(table(spark, sf_dir, "documents")).where(
                F2.col("source") == BENCH_SOURCE
            ),
            index,
            tbl,
            num_hashes=32,
            bands=MINHASH_BANDS,
            max_bench_df=MAX_SHINGLE_DF,
        )
        if sf_dir not in _DECONTAM_INDEX:
            _DECONTAM_INDEX[sf_dir] = index
            atexit.register(shutil.rmtree, index, ignore_errors=True)
    return _DECONTAM_INDEX[sf_dir]


def st_q14_decontam_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming decontamination ingest
    (streaming/sinks.foreach_batch_decontam_ingest) graded end-to-end:
    the non-benchmark documents replayed as DECONTAM_CHUNKS
    doc_id-ordered micro-batches, each gated against the STATIC
    benchmark index (build_decontam_index over the BENCH_SOURCE
    corpus) — exact tier: per-doc shingle overlap ≥ CONTAM_MIN_OVERLAP
    against the distinct benchmark shingle set (contam_q2's scrub
    probe); fuzzy tier: MinHash-LSH candidates against the benchmark
    band index verified by exact jaccard ≥ NEAR_DUP_JACCARD over the
    hot-benchmark-shingle-excluded sets (contam_q3's cross-corpus
    probe, with the skew guard made STATIC: benchmark-side df is the
    only df a streaming ingest can know, so the hot set is a
    build-time decision). The graded result is the surviving training
    manifest read back from the store.

    Oracle soundness is stronger than every other ingest sink's: the
    benchmark index is FIXED, so each document's verdict is a pure
    function of (document, index) — the streamed survivor set equals
    the one-shot scrub under ANY batching, with no arrival-order
    argument needed. The one-shot SQL composes contam_q2's dirty set
    (verbatim CTEs) with the fuzzy tier's exact cross-corpus jaccard
    under the bench-df guard; LSH recall at the (32, 16) banding is
    exhaustive over the fixture's above-threshold pairs (dedup_q4's
    calibration argument, re-verified by this grade itself).

    Scale shape per batch: batch scan + probes against the
    FIXED-SIZE benchmark index (broadcast/bucket-join sides) + the
    id-bucket-pruned known-id gate — per-batch cost independent of
    the accepted store's growth."""
    import atexit as _atexit
    import shutil as _shutil

    from distributed_mapreduce_spark.queries.pipeline_queries import (
        BENCH_SOURCE,
        CONTAM_MIN_OVERLAP,
    )
    from distributed_mapreduce_spark.queries.textops import NEAR_DUP_JACCARD
    from distributed_mapreduce_spark.streaming.replay import (
        ephemeral_dir,
        stage_document_chunks,
    )
    from distributed_mapreduce_spark.streaming.sinks import (
        foreach_batch_decontam_ingest,
        read_decontam_accepted,
    )

    key = ("docs", sf_dir, DECONTAM_CHUNKS)
    if key not in _CHUNK_CACHE:
        _CHUNK_CACHE[key] = stage_document_chunks(
            sf_dir, DECONTAM_CHUNKS, exclude_source=BENCH_SOURCE
        )
        atexit.register(shutil.rmtree, _CHUNK_CACHE[key], ignore_errors=True)
    chunks = _CHUNK_CACHE[key]
    index = _shared_decontam_index(spark, sf_dir)
    store = ephemeral_dir("dmr_decontam_store_")
    ckpt = ephemeral_dir("dmr_decontam_ckpt_")
    _atexit.register(_shutil.rmtree, store, ignore_errors=True)
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS))
    try:
        q = foreach_batch_decontam_ingest(
            (
                spark.readStream.schema(
                    "doc_id bigint, text string, lang string, "
                    "source string, n_chars bigint"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(chunks)
            ),
            f"{store}/t",
            ckpt,
            index,
            min_overlap=CONTAM_MIN_OVERLAP,
            min_jaccard=NEAR_DUP_JACCARD,
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        _shutil.rmtree(ckpt, ignore_errors=True)
    return read_decontam_accepted(spark, f"{store}/t").select(
        "doc_id", "source", "lang", "n_chars"
    )


def st_q15_clean_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED cleaning ingest
    (streaming/sinks.foreach_batch_clean_ingest) graded end-to-end:
    the non-benchmark documents replayed as DECONTAM_CHUNKS
    doc_id-ordered micro-batches through ONE foreachBatch pass
    chaining every gate a production crawl ingest runs — text_q6's
    quality predicate → both decontamination tiers against the static
    benchmark index → exact-fingerprint keep-first → near-dup LSH
    greedy keep-first (the foreach_batch_dedup_ingest stage, shared
    code). Graded on the surviving training manifest.

    Oracle soundness composes the tiers' individual arguments:
    quality and decontamination are per-doc pure (batching-invariant
    outright); the exact and near-dup tiers are keep-first folds that
    an ascending-id feed reproduces exactly (the
    dedup_corpus_greedy/streaming-parity contract) — so the streamed
    survivor set equals the one-shot SQL composition, bit-exact.

    Scale shape: one batch scan feeds all gates; the stateful tiers'
    store reads are id/fp-bucket-pruned; the benchmark index is fixed
    size — the dedup-ingest cost model with two map-shaped filters in
    front, and ONE sink instead of four re-reading the feed."""
    import atexit as _atexit
    import shutil as _shutil

    from distributed_mapreduce_spark.functions.text import (
        avg_token_len,
        stopword_ratio,
        token_count,
        tokens,
    )
    from distributed_mapreduce_spark.queries.pipeline_queries import (
        BENCH_SOURCE,
        CONTAM_MIN_OVERLAP,
    )
    from distributed_mapreduce_spark.queries.textops import (
        NEAR_DUP_JACCARD,
        QF_MAX_TOK_LEN,
        QF_MAX_TOKENS,
        QF_MIN_SW_RATIO,
        QF_MIN_TOK_LEN,
        QF_MIN_TOKENS,
    )
    from distributed_mapreduce_spark.streaming.replay import (
        ephemeral_dir,
        stage_document_chunks,
    )
    from distributed_mapreduce_spark.streaming.sinks import (
        foreach_batch_clean_ingest,
        read_clean_accepted,
    )

    key = ("docs", sf_dir, DECONTAM_CHUNKS)
    if key not in _CHUNK_CACHE:
        _CHUNK_CACHE[key] = stage_document_chunks(
            sf_dir, DECONTAM_CHUNKS, exclude_source=BENCH_SOURCE
        )
        atexit.register(shutil.rmtree, _CHUNK_CACHE[key], ignore_errors=True)
    chunks = _CHUNK_CACHE[key]
    index = _shared_decontam_index(spark, sf_dir)
    store = ephemeral_dir("dmr_clean_store_")
    ckpt = ephemeral_dir("dmr_clean_ckpt_")
    _atexit.register(_shutil.rmtree, store, ignore_errors=True)
    # the near-dup index is per-run state: a table surviving from an
    # earlier call would pre-reject this run's first copies
    spark.sql("DROP TABLE IF EXISTS st_q15_corpus_bands")
    toks = tokens("text")
    quality = (
        token_count("text").between(QF_MIN_TOKENS, QF_MAX_TOKENS)
        & (stopword_ratio(toks, "en") >= QF_MIN_SW_RATIO)
        & avg_token_len(toks).between(QF_MIN_TOK_LEN, QF_MAX_TOK_LEN)
    )
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS))
    try:
        q = foreach_batch_clean_ingest(
            (
                spark.readStream.schema(
                    "doc_id bigint, text string, lang string, "
                    "source string, n_chars bigint"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(chunks)
            ),
            f"{store}/t",
            ckpt,
            "st_q15_corpus_bands",
            index,
            quality_predicate=quality,
            min_overlap=CONTAM_MIN_OVERLAP,
            min_jaccard=NEAR_DUP_JACCARD,
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        _shutil.rmtree(ckpt, ignore_errors=True)
    return read_clean_accepted(spark, f"{store}/t").select(
        "doc_id", "source", "lang", "n_chars"
    )


# Probe keys for the served-KV shadow query: a fixed literal list
# hitting 8 of the 10 shards (real pruning: 2 shard dirs are never
# listed) plus an absent key exercising the ""-pad contract. The
# derived op-log keyspace is CAST(user_id % 100 AS VARCHAR) — see
# operators/kv.ops_projection.
KV_SERVE_KEYS = ["7", "23", "42", "55", "88", "96", "5", "61", "19", "80", "absent"]


def kv_q5_served_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full declared product shape of the reference's Labs 3/4
    (VERDICT r15 #2): the replayed op log MAINTAINS a served KV store
    — streaming/kv_serving.foreach_batch_kv_serving folds each
    micro-batch through operators/kv.apply_kv_ops into a snapshot
    hash-partitioned on key2shard (the reference's own routing,
    /root/reference/src/shardkv/client.go:22-29) — and the graded rows
    are BATCHED POINT GETS served from the maintained snapshot:
    kv_served_multi_get over a fixed probe list, once at the head and
    once AS OF the mid-history batch (the kvraft snapshot concept,
    /root/reference/src/kvraft/config.go:54), absent keys padded ""
    (client.go:27-31 semantics).

    Oracle soundness: chunks are event_id-ordered count-slices, the op
    log maps seq = event_id, so (a) per-key seq order across batches is
    nondecreasing — apply_kv_ops' delivery contract — and the head
    state equals the one-shot _FOLD_SQL; (b) the as_of state equals
    _FOLD_SQL over the exact integer-rank prefix (the st_q11
    predicate). Both snapshots are graded value-by-value against
    DuckDB through the coalesce('')-padded probe join.

    Scale shape: per batch the store never shuffles (broadcast
    semi-probe + anti, touched shards only rewritten); each served
    multi-get lists ≤|probe shards| directories from driver-side
    manifest metadata, never the table."""
    import atexit as _atexit
    import shutil as _shutil

    from distributed_mapreduce_spark.streaming.kv_serving import (
        foreach_batch_kv_serving,
        kv_served_multi_get,
    )
    from distributed_mapreduce_spark.streaming.replay import ephemeral_dir

    chunks = _staged(sf_dir)
    store = ephemeral_dir("dmr_kvserve_store_")
    ckpt = ephemeral_dir("dmr_kvserve_ckpt_")
    _atexit.register(_shutil.rmtree, store, ignore_errors=True)
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS))
    try:
        q = foreach_batch_kv_serving(
            ops_projection(event_stream(spark, chunks)), f"{store}/t", ckpt
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        _shutil.rmtree(ckpt, ignore_errors=True)
    head = kv_served_multi_get(spark, f"{store}/t", KV_SERVE_KEYS)
    asof = kv_served_multi_get(
        spark, f"{store}/t", KV_SERVE_KEYS, as_of=AS_OF_BATCH
    )
    return head.select(
        F.lit("head").alias("snap"), "key", "value"
    ).unionByName(asof.select(F.lit("asof").alias("snap"), "key", "value"))


SHADOW_QUERIES = {
    "st_q2_sliding": st_q2_sliding,
    "st_q7_stream_static_enrich": st_q7_stream_static_enrich,
    "st_q8_click_purchase_outer": st_q8_click_purchase_outer,
    "st_q9_cdc_upsert": st_q9_cdc_upsert,
    "st_q10_cdc_ordered": st_q10_cdc_ordered,
    "st_q11_time_travel": st_q11_time_travel,
    "st_q12_semdedup_ingest": st_q12_semdedup_ingest,
    "st_q13_schema_evolution": st_q13_schema_evolution,
    "st_q14_decontam_ingest": st_q14_decontam_ingest,
    "st_q15_clean_ingest": st_q15_clean_ingest,
    "kv_q5_served_get": kv_q5_served_get,
}


def _st_q11_oracle() -> str:
    # rel_q18's MERGE SQL with `ch` restricted to the exact change
    # prefix batch AS_OF_BATCH had seen: chunks are event_id-ordered
    # count-slices, so prefix membership is the integer rank predicate
    # rk·K ≤ n·(v+1) (no division, no float boundary).
    base = _st_q9_oracle()
    prefix = f"""FROM (
                SELECT e.*,
                       row_number() OVER (ORDER BY event_id) AS __rk,
                       count(*) OVER () AS __n
                FROM events e
            ) WHERE __rk * {N_CHUNKS} <= __n * {AS_OF_BATCH + 1}"""
    sql = base.replace("FROM events\n", prefix + "\n", 1)
    assert sql != base, "rel_q18 oracle changed shape; fix the rewrite"
    return sql

def _st_q9_oracle() -> str:
    # rel_q18's one-shot MERGE SQL verbatim (single definition): sound
    # for the streaming path by last-writer-wins batch-boundary
    # invariance — see st_q9_cdc_upsert's docstring.
    from distributed_mapreduce_spark.queries.relational import _SQL

    return _SQL["rel_q18_cdc_merge"]


def _st_q10_oracle() -> str:
    # rel_q18's one-shot MERGE SQL with the change order inverted
    # (ord = -event_id): the one-shot winner-per-key form is
    # delivery-order independent by construction, which is precisely
    # the property the ordered sink is graded on.
    sql = _st_q9_oracle().replace("event_id AS ord", "-event_id AS ord")
    assert sql != _st_q9_oracle(), "rel_q18 oracle changed shape; fix the rewrite"
    return sql


def _st_q12_oracle() -> str:
    from distributed_mapreduce_spark.queries.simops import _semdedup_sql

    return _semdedup_sql()


def _decontam_dirty_ctes() -> str:
    """The decontamination dirty-set CTE block (ends at `dirty`),
    shared by _st_q14_oracle and _st_q15_oracle — one definition:
    contam_q2's exact dirty set (sizes/hits over UNFILTERED train
    shingles vs the distinct bench set) ∪ the fuzzy cross-corpus
    jaccard dirty set under the STATIC bench-df skew guard
    (contam_q3's probe with df counted over the benchmark — the only
    corpus a streaming ingest knows at index build time)."""
    from distributed_mapreduce_spark.queries.pipeline_queries import (
        BENCH_SOURCE,
        CONTAM_MIN_OVERLAP,
        _shingle_cte,
        _TOKS_SQL,
    )
    from distributed_mapreduce_spark.queries.textops import (
        MAX_SHINGLE_DF,
        NEAR_DUP_JACCARD,
    )

    return f"""train_sh AS ({_shingle_cte(f"source <> '{BENCH_SOURCE}'")}),
        bench AS (
            SELECT DISTINCT shingle FROM ({_shingle_cte(f"source = '{BENCH_SOURCE}'")})
        ),
        sizes AS (SELECT id, count(*) AS n FROM train_sh GROUP BY id),
        hits AS (
            SELECT id, count(*) AS h
            FROM train_sh SEMI JOIN bench USING (shingle)
            GROUP BY id
        ),
        dirty_exact AS (
            SELECT sizes.id FROM sizes LEFT JOIN hits ON sizes.id = hits.id
            WHERE round(coalesce(h, 0) / n, 6) >= {CONTAM_MIN_OVERLAP}
        ),
        sh_all AS (
            SELECT DISTINCT doc_id AS id,
                   source = '{BENCH_SOURCE}' AS is_bench,
                   unnest(list_transform(range(1, greatest(len(ts) - 1, 1)),
                                         i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
            FROM (SELECT doc_id, source, {_TOKS_SQL} AS ts FROM documents)
        ),
        bench_hot AS (
            SELECT shingle FROM sh_all WHERE is_bench
            GROUP BY shingle HAVING count(*) > {MAX_SHINGLE_DF}
        ),
        sh AS (
            SELECT id, is_bench, shingle FROM sh_all
            ANTI JOIN bench_hot USING (shingle)
        ),
        sizes_f AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
        inter AS (
            SELECT b.id AS bench_id, t.id AS train_id, count(*) AS c
            FROM sh b JOIN sh t
              ON b.shingle = t.shingle AND b.is_bench AND NOT t.is_bench
            GROUP BY 1, 2
        ),
        dirty_fuzzy AS (
            SELECT DISTINCT train_id AS id
            FROM inter
            JOIN sizes_f sb ON sb.id = bench_id
            JOIN sizes_f st ON st.id = train_id
            WHERE round(c / (sb.sz + st.sz - c), 6) >= {NEAR_DUP_JACCARD}
        ),
        dirty AS (
            SELECT id FROM dirty_exact UNION SELECT id FROM dirty_fuzzy
        )"""


def _st_q14_oracle() -> str:
    # One-shot scrub the per-doc-pure gate makes batching-invariant:
    # train docs minus the composed dirty set (_decontam_dirty_ctes).
    from distributed_mapreduce_spark.queries.pipeline_queries import BENCH_SOURCE

    return f"""
        WITH {_decontam_dirty_ctes()}
        SELECT doc_id, source, lang, n_chars
        FROM documents ANTI JOIN dirty ON doc_id = dirty.id
        WHERE source <> '{BENCH_SOURCE}'
    """


def _st_q15_oracle() -> str:
    # The composed cleaning pipeline, one-shot: quality filter (the
    # text_q6 CTE shape, _manifest_sql's fragments) → decontamination
    # scrub (_decontam_dirty_ctes, shared with st_q14) → exact dedup
    # keep-min-id per md5-of-normalized-text fingerprint → near-dup
    # GREEDY keep-first. The greedy fold is a recursive CTE over the
    # verified-pair endpoints in ascending id order carrying the kept
    # set as a list (the pack_q1 sequential-fold discipline): id j is
    # kept iff no smaller KEPT neighbor — exactly
    # operators/dedup.greedy_reject_ids. Pairs are exact jaccard ≥
    # threshold over the exact-kept survivors' UNGUARDED shingles
    # (matching _near_dup_gate, whose doc_shingles carries no max_df;
    # feasible here because the fixture's max shingle df is 25 —
    # measured, pair bound ~2.8M rows at sf0.1).
    from distributed_mapreduce_spark.queries.pipeline_queries import (
        BENCH_SOURCE,
        _TOKS_SQL,
    )
    from distributed_mapreduce_spark.queries.textops import (
        _SW_EN,
        NEAR_DUP_JACCARD,
        QF_MAX_TOK_LEN,
        QF_MAX_TOKENS,
        QF_MIN_SW_RATIO,
        QF_MIN_TOK_LEN,
        QF_MIN_TOKENS,
    )

    return f"""
        WITH RECURSIVE {_decontam_dirty_ctes()},
        t AS (
            SELECT doc_id, lang, source, n_chars, text, {_TOKS_SQL} AS ts
            FROM documents WHERE source <> '{BENCH_SOURCE}'
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(len(ts) AS BIGINT) AS n_tok,
                   CASE WHEN len(ts) > 0
                        THEN len(list_filter(ts, x -> list_contains([{_SW_EN}], x))) / len(ts)
                        ELSE 0.0 END AS swr,
                   CASE WHEN len(ts) > 0
                        THEN list_sum(list_transform(ts, x -> length(x))) / len(ts)
                        ELSE 0.0 END AS atl
            FROM t
        ),
        passing AS (
            SELECT doc_id FROM per_doc
            WHERE n_tok BETWEEN {QF_MIN_TOKENS} AND {QF_MAX_TOKENS}
              AND swr >= {QF_MIN_SW_RATIO}
              AND atl BETWEEN {QF_MIN_TOK_LEN} AND {QF_MAX_TOK_LEN}
        ),
        clean AS MATERIALIZED (
            SELECT t.* FROM t
            SEMI JOIN passing USING (doc_id)
            ANTI JOIN dirty ON doc_id = dirty.id
        ),
        fps AS (
            SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS f
            FROM clean
        ),
        exact_kept AS (
            SELECT doc_id FROM (
                SELECT doc_id,
                       row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rk
                FROM fps
            ) WHERE rk = 1
        ),
        ek_sh AS MATERIALIZED (
            SELECT DISTINCT doc_id AS id,
                   unnest(list_transform(range(1, greatest(len(ts) - 1, 1)),
                                         i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
            FROM clean SEMI JOIN exact_kept USING (doc_id)
        ),
        sizes_k AS (SELECT id, count(*) AS sz FROM ek_sh GROUP BY id),
        inter_k AS (
            SELECT a.id AS lo, b.id AS hi, count(*) AS c
            FROM ek_sh a JOIN ek_sh b
              ON a.shingle = b.shingle AND a.id < b.id
            GROUP BY 1, 2
        ),
        edges AS MATERIALIZED (
            SELECT lo, hi FROM inter_k
            JOIN sizes_k sa ON sa.id = lo
            JOIN sizes_k sb ON sb.id = hi
            WHERE round(c / (sa.sz + sb.sz - c), 6) >= {NEAR_DUP_JACCARD}
        ),
        endpoints AS MATERIALIZED (SELECT lo AS id FROM edges UNION SELECT hi FROM edges),
        seq AS MATERIALIZED (SELECT list_sort(list(id)) AS l FROM endpoints),
        fold AS (
            SELECT 0 AS k, CAST([] AS BIGINT[]) AS kept
            UNION ALL
            SELECT k + 1,
                   CASE WHEN EXISTS (
                            SELECT 1 FROM edges e
                            WHERE e.hi = (SELECT l[fold.k + 1] FROM seq)
                              AND list_contains(fold.kept, e.lo))
                        THEN kept
                        ELSE list_append(kept, (SELECT l[fold.k + 1] FROM seq))
                   END
            FROM fold WHERE k < (SELECT coalesce(len(l), 0) FROM seq)
        ),
        kept_final AS (SELECT kept FROM fold ORDER BY k DESC LIMIT 1),
        neardup_rejected AS (
            SELECT id FROM endpoints
            WHERE NOT list_contains((SELECT kept FROM kept_final), id)
        )
        SELECT doc_id, source, lang, n_chars
        FROM clean
        SEMI JOIN exact_kept USING (doc_id)
        ANTI JOIN neardup_rejected ON doc_id = neardup_rejected.id
    """


def _st_q13_oracle() -> str:
    # rel_q18's MERGE SQL with ch widened by the added column: c_note
    # is the derived value exactly on the LATE rank slice (the chunks
    # run 2 merged — the st_q11 integer-rank predicate), NULL on the
    # early slice and on untouched base rows. The winner row carries
    # its note atomically with the rest of the payload (same
    # whole-row-winner discipline).
    base = _st_q9_oracle()
    widened_ch = f"""FROM (
                SELECT e.*,
                       CASE WHEN __rk * {N_CHUNKS} > __n * {EVO_SPLIT}
                            THEN upper(event_type) || '#' || CAST(event_id AS VARCHAR)
                       END AS c_note
                FROM (
                    SELECT e.*,
                           row_number() OVER (ORDER BY event_id) AS __rk,
                           count(*) OVER () AS __n
                    FROM events e
                ) e
            )"""
    sql = base.replace("value AS c_acctbal", "value AS c_acctbal,\n                   c_note", 1)
    sql = sql.replace("FROM events\n", widened_ch + "\n", 1)
    sql = sql.replace(
        "SELECT c_custkey, c_mktsegment, c_acctbal, is_delete",
        "SELECT c_custkey, c_mktsegment, c_acctbal, c_note, is_delete",
        1,
    )
    sql = sql.replace(
        "SELECT b.c_custkey, b.c_mktsegment, b.c_acctbal\n",
        "SELECT b.c_custkey, b.c_mktsegment, b.c_acctbal, "
        "CAST(NULL AS VARCHAR) AS c_note\n",
        1,
    )
    sql = sql.replace(
        "SELECT c_custkey, c_mktsegment, c_acctbal\n        FROM w",
        "SELECT c_custkey, c_mktsegment, c_acctbal, c_note\n        FROM w",
        1,
    )
    assert sql.count("c_note") == 5, "rel_q18 oracle changed shape; fix the rewrite"
    return sql


def _kv_q5_oracle() -> str:
    # head = the one-shot state fold (operators/kv._FOLD_SQL verbatim);
    # asof = the same fold over the exact event-prefix batch AS_OF_BATCH
    # had seen (the st_q11 integer-rank predicate); both left-joined
    # onto the literal probe list with the ""-pad get contract.
    prefix_src = f"""FROM (
                SELECT e.*,
                       row_number() OVER (ORDER BY event_id) AS __rk,
                       count(*) OVER () AS __n
                FROM events e
            ) WHERE __rk * {N_CHUNKS} <= __n * {AS_OF_BATCH + 1}"""
    prefix_fold = _FOLD_SQL.replace("FROM events\n", prefix_src + "\n", 1)
    assert prefix_fold != _FOLD_SQL, "kv fold oracle changed shape; fix the rewrite"
    probe_rows = ",".join(f"('{k}')" for k in KV_SERVE_KEYS)
    return f"""
        WITH probe AS (SELECT * FROM (VALUES {probe_rows}) AS t(key)),
        head_fold AS ({_FOLD_SQL}),
        asof_fold AS ({prefix_fold})
        SELECT 'head' AS snap, p.key, coalesce(f.value, '') AS value
        FROM probe p LEFT JOIN head_fold f ON p.key = f.key
        UNION ALL
        SELECT 'asof' AS snap, p.key, coalesce(f.value, '') AS value
        FROM probe p LEFT JOIN asof_fold f ON p.key = f.key
    """


SHADOW_ORACLES = {
    "st_q9_cdc_upsert": _st_q9_oracle(),
    # served KV store: head + as_of multi-get vs the (prefix-)fold SQL
    # — see kv_q5_served_get's soundness argument.
    "kv_q5_served_get": _kv_q5_oracle(),
    "st_q10_cdc_ordered": _st_q10_oracle(),
    "st_q11_time_travel": _st_q11_oracle(),
    # dedup_q19's full kmeans+CC replay verbatim: the streamed
    # representative set is arrival-order invariant and the frozen
    # kmeans_train centroids are bit-identical to the in-query
    # trainer's — see st_q12_semdedup_ingest's soundness argument.
    "st_q12_semdedup_ingest": _st_q12_oracle(),
    "st_q13_schema_evolution": _st_q13_oracle(),
    # static-index decontamination: per-doc-pure gate ⇒ batching-
    # invariant; see _st_q14_oracle's composition note.
    "st_q14_decontam_ingest": _st_q14_oracle(),
    # composed pipeline: pure gates + ascending keep-first folds — see
    # _st_q15_oracle's greedy recursive fold.
    "st_q15_clean_ingest": _st_q15_oracle(),
    # Matched rows = the batch interval join (same as st_q6); null
    # rows = clicks with no in-window purchase whose window closed
    # before the final global watermark (min over the two sides' max
    # event times, minus the delay — Spark's multi-input watermark
    # policy).
    "st_q8_click_purchase_outer": """
        WITH c AS (
            SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
        ),
        p AS (
            SELECT user_id AS p_user, ts AS purchase_ts, value
            FROM events WHERE event_type = 'purchase'
        ),
        wm AS (
            SELECT least((SELECT max(click_ts) FROM c),
                         (SELECT max(purchase_ts) FROM p))
                   - INTERVAL '1 hour' AS w
        ),
        matched AS (
            SELECT c.user_id, c.click_ts, p.purchase_ts, p.value
            FROM c JOIN p
              ON c.user_id = p.p_user
             AND p.purchase_ts >= c.click_ts
             AND p.purchase_ts <= c.click_ts + INTERVAL '30 minutes'
        ),
        expired_unmatched AS (
            SELECT c.user_id, c.click_ts,
                   CAST(NULL AS TIMESTAMP) AS purchase_ts,
                   CAST(NULL AS DOUBLE) AS value
            FROM c CROSS JOIN wm
            WHERE c.click_ts + INTERVAL '30 minutes' <= wm.w
              AND NOT EXISTS (
                  SELECT 1 FROM p
                  WHERE p.p_user = c.user_id
                    AND p.purchase_ts >= c.click_ts
                    AND p.purchase_ts <= c.click_ts + INTERVAL '30 minutes'
              )
        )
        SELECT * FROM matched
        UNION ALL
        SELECT * FROM expired_unmatched
    """,
    "st_q7_stream_static_enrich": f"""
        SELECT c.c_mktsegment, e.event_type,
               count(*) AS n_events,
               {_MONEY} AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2
    """,
    "st_q2_sliding": """
        WITH b AS (
            SELECT unnest([time_bucket(INTERVAL '1 hour', ts),
                           time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour'])
                   AS window_start
            FROM events
        )
        SELECT window_start,
               window_start + INTERVAL '2 hours' AS window_end,
               count(*) AS n_events
        FROM b
        GROUP BY 1
    """,
}
