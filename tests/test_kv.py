"""KV semantics tests — the Spark-era analog of the reference's
linearizability/no-duplication checks (SURVEY.md §5.2: deterministic
fold-order tests replace porcupine)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_mapreduce_spark.operators.kv import (
    NSHARDS,
    ShardMaster,
    fold_kv_log,
    kv_get,
    rebalance,
)


def python_fold(ops):
    """Sequential oracle: models/kv.go:40-54 applied in seq order."""
    state = {}
    seen = set()
    for key, seq, op, value in sorted(ops, key=lambda o: o[1]):
        if op == "get":
            continue
        if (key, seq) in seen:
            continue  # exactly-once (test_test.go:80-97)
        seen.add((key, seq))
        if op == "put":
            state[key] = value
        else:
            state[key] = state.get(key, "") + value
    return state


OPS_SCHEMA = "key string, seq long, op string, value string"


def run_fold(spark, ops):
    df = spark.createDataFrame(ops, OPS_SCHEMA)
    return {r.key: r.value for r in fold_kv_log(df).collect()}


def test_fold_basic(spark):
    ops = [
        ("a", 1, "append", "x"),
        ("a", 2, "append", "y"),
        ("a", 3, "put", "Z"),
        ("a", 4, "append", "w"),
        ("b", 5, "append", "1"),
        ("c", 6, "get", ""),
        ("c", 7, "put", "only"),
    ]
    assert run_fold(spark, ops) == python_fold(ops) == {"a": "Zw", "b": "1", "c": "only"}


def test_fold_exactly_once_under_duplicates(spark):
    """Retried deliveries (same key+seq) must not double-append."""
    ops = [("k", 1, "append", "A"), ("k", 2, "append", "B")]
    dup = ops + ops + [("k", 2, "append", "B")]
    assert run_fold(spark, dup) == {"k": "AB"}


def test_fold_append_order_preserved(spark):
    """Per-client append order (seq order) must survive the shuffle."""
    ops = [("k", i, "append", f"<{i}>") for i in range(50)]
    shuffled = ops[::-1]
    assert run_fold(spark, shuffled) == {"k": "".join(f"<{i}>" for i in range(50))}


def test_get_absent_key_is_empty_string(spark):
    state = spark.createDataFrame([("a", "v")], "key string, value string")
    assert kv_get(state, spark, "missing").collect()[0].value == ""
    assert kv_get(state, spark, "a").collect()[0].value == "v"


@settings(max_examples=200, deadline=None)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(0, 30),
            st.sampled_from(["put", "append", "get"]),
            st.text(alphabet="xyz", min_size=0, max_size=3),
        ),
        max_size=30,
    )
)
def test_fold_matches_python_oracle_property(ops):
    """Pure-logic property check of the fold *algorithm* (the relational
    decomposition) against the sequential oracle — no Spark needed:
    replicate last-put + later-appends and compare."""
    want = python_fold([(k, s, o, v) for (k, s, o, v) in ops])
    # relational re-derivation (same algebra fold_kv_log runs in Spark)
    dedup = {}
    for k, s, o, v in ops:
        if o != "get":
            dedup.setdefault((k, s), (k, s, o, v))
    muts = list(dedup.values())
    got = {}
    for key in {m[0] for m in muts}:
        kops = sorted((m for m in muts if m[0] == key), key=lambda m: m[1])
        pseqs = [m[1] for m in kops if m[2] == "put"]
        pseq = max(pseqs) if pseqs else None
        live = [m for m in kops if (m[2] == "append" and (pseq is None or m[1] > pseq)) or (m[2] == "put" and m[1] == pseq)]
        got[key] = "".join(m[3] for m in live)
    assert got == want


# --- K5-K8: shard rebalancing properties -----------------------------------


@settings(max_examples=300, deadline=None)
@given(
    shards=st.lists(st.integers(0, 8), min_size=NSHARDS, max_size=NSHARDS),
    gids=st.lists(st.integers(1, 8), min_size=0, max_size=8),
)
def test_rebalance_properties(shards, gids):
    out = rebalance(shards, gids)
    if not gids:
        assert out == [0] * NSHARDS
        return
    live = set(gids)
    assert all(g in live for g in out), "every shard assigned to a live group"
    counts = {g: out.count(g) for g in live}
    assert max(counts.values()) - min(counts.values()) <= 1, "balance invariant"
    # minimal movement: no shard moved off a group that stayed under target
    n, g = NSHARDS, len(live)
    base, rem = divmod(n, g)
    for gid in live:
        kept = sum(1 for a, b in zip(shards, out) if a == gid and b == gid)
        had = shards.count(gid)
        assert kept >= min(had, base), f"group {gid} lost shards it could keep"


def test_shardmaster_join_leave_move_query():
    sm = ShardMaster()
    sm.join({1: ["s1"]})
    assert set(sm.query()["shards"]) == {1}
    sm.join({2: ["s2"], 3: ["s3"]})
    cfg = sm.query()
    counts = [cfg["shards"].count(g) for g in (1, 2, 3)]
    assert max(counts) - min(counts) <= 1 and sum(counts) == NSHARDS
    sm.move(0, 3)
    assert sm.query()["shards"][0] == 3
    sm.leave([1])
    cfg = sm.query()
    assert 1 not in cfg["shards"] and 1 not in cfg["groups"]
    # Query(num) returns historical configs; Query(-1) the latest.
    assert sm.query(0)["shards"] == [0] * NSHARDS
    assert sm.query(-1) == sm.configs[-1]
