"""Connected components: chains, separate cliques, convergence."""

from __future__ import annotations

from distributed_mapreduce_spark.operators.components import connected_components


def test_components_chain_and_cliques(spark):
    # 1-2-3-4 chain (diameter > 1 forces multiple rounds), {10,11} pair,
    # {20,21,22} triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_i bigint, id_j bigint",
    )
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_components_long_chain_converges(spark):
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_i bigint, id_j bigint"
    )
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert set(got.values()) == {0}
    assert len(got) == n + 1
