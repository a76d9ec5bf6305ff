"""Opt-in multi-process serialization smoke (VERDICT r6 #2).

Everything else in this repo runs `local[N]`, where driver and
executors share one JVM+Python process tree — closure-serialization,
broadcast-transport, and Python-worker-spawn bugs can hide there. This
suite reruns ONE query per operator family under
`local-cluster[2,4,2048]` — Spark's standalone-cluster simulation with
two REAL executor JVMs (separate processes, real RPC, real
closure/broadcast serialization, per-executor Python worker pools) —
and asserts full DuckDB parity at sf0.001. It is the cheapest
available hardening of the 100×-scale claim short of a real cluster.

The smoke set is biased toward the machinery most at risk under real
serialization (the verdict's named suspects):
- closure captures in Arrow-lane folds: kv_q1 (applyInPandas fold),
  pack_q1 (sequential recurrence), st_q4 (applyInPandasWithState),
  ml_q1 (per-step GD closure over driver-held weights)
- driver-side sketch/probe plumbing: dedup_q10 (theta + count-min
  sketches built on executors, merged on the driver)
- broadcast paths: contam_q1 (broadcast semi-join), sim_q3 (collected
  centroids re-broadcast), rel_q1 (plain SQL baseline)
- foreachBatch driver/executor splits: st_q9 (partition-scoped CDC:
  manifests written by the driver, data by executors)
- Python-UDF surfaces: mr_generic_indexer (reference Map/Reduce UDF
  contract), mm_q2 (Pillow decode in executor Python workers),
  text_q5 (pandas-UDF rolling hash)
- iterative lineage: dedup_q7 (connected components, localCheckpoint
  blocks live on executors)
- everything else: mix_q1 (md5 sampling), dedup_q4 (LSH banding),
  ev_q2 (sessionize windows)

Not part of the default suite (a full standalone cluster per run; the
session-scoped `spark` fixture would collide):

    DMR_LOCAL_CLUSTER=1 python -m pytest tests/test_local_cluster.py -v

`DMR_LOCAL_CLUSTER_FULL=1` widens the run to EVERY oracle-backed query
in both tiers (all 105) — the strongest single claim the container can
make about the 100×-scale story: the entire query surface passes
value-exact parity under real multi-process serialization.
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("DMR_LOCAL_CLUSTER") != "1",
    reason="local-cluster smoke is opt-in: set DMR_LOCAL_CLUSTER=1",
)

SF = "/root/testdata/sf0.001"

# one query per family — name: tier (registered/shadow)
SMOKE_SET = {
    "mr_generic_indexer": "registered",
    "kv_q1_state_fold": "registered",
    "pack_q1_greedy": "registered",
    "mix_q1_stratified_sample": "registered",
    "contam_q1_benchmark_overlap": "registered",
    "st_q4_stateful_kv": "registered",
    "text_q5_rolling_fingerprint": "registered",
    "dedup_q4_minhash_lsh": "registered",
    "dedup_q7_clusters": "registered",
    "sim_q3_ivf_topk": "registered",
    "mm_q2_features": "registered",
    "ev_q2_sessionize": "registered",
    "rel_q1_pricing_summary": "registered",
    "st_q9_cdc_upsert": "shadow",
    "st_q10_cdc_ordered": "shadow",  # ordered sink: tombstone snapshot + ord gate
    "ml_q1_scaling_fit": "shadow",
    "dedup_q10_source_overlap": "shadow",
    "dedup_q15_incremental_lsh": "shadow",  # two-sided band probe + carry agg
}


def _param_names() -> list[str]:
    if os.environ.get("DMR_LOCAL_CLUSTER_FULL") != "1":
        return sorted(SMOKE_SET)
    from distributed_mapreduce_spark.registry import all_oracles, shadow_oracles

    return sorted(all_oracles()) + sorted(shadow_oracles())


@pytest.fixture(scope="module")
def cluster_spark():
    from pyspark.sql import SparkSession

    from distributed_mapreduce_spark.session import get_spark

    # A standalone mini-cluster cannot coexist with another session in
    # this process (same reasoning as test_sf1_stress.stress_spark).
    if SparkSession.getActiveSession() is not None:
        pytest.skip(
            "local-cluster smoke needs its own SparkSession — run "
            "tests/test_local_cluster.py standalone, not inside the full suite"
        )
    spark = get_spark(
        app_name="dmr-local-cluster-smoke", master="local-cluster[2,4,2048]"
    )
    yield spark
    spark.stop()


def _lookup(name: str):
    from distributed_mapreduce_spark.registry import (
        all_oracles,
        all_queries,
        shadow_oracles,
        shadow_queries,
    )

    if name in all_queries():
        return all_queries()[name], all_oracles().get(name)
    return shadow_queries()[name], shadow_oracles().get(name)


@pytest.mark.parametrize("name", _param_names())
def test_query_on_local_cluster(cluster_spark, name):
    """Same DuckDB parity gate as test_oracle_parity, but with real
    executor processes: a pass means the query's closures, broadcasts,
    Arrow batches, and driver/executor splits all survive genuine
    serialization boundaries."""
    from distributed_mapreduce_spark.testing import check_query

    fn, sql = _lookup(name)
    assert sql is not None, f"{name} lost its oracle"
    res = check_query(cluster_spark, name, fn, sql, SF)
    assert res.ok, f"{name} under local-cluster: {res.detail}"
