"""Central query registry backing __spark_entry__.py.

Each query module exports QUERIES (name → fn(spark, sf_dir) → DataFrame)
and ORACLES (name → DuckDB SQL). Names are unique across modules;
queries without an oracle get a weaker rows-only driver check (SURVEY.md
§5.2) — keep that set to the genuinely non-SQL-expressible ops.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    "distributed_mapreduce_spark.queries.mapreduce_queries",
    "distributed_mapreduce_spark.operators.mapreduce",
    "distributed_mapreduce_spark.operators.kv",
    "distributed_mapreduce_spark.queries.relational",
    "distributed_mapreduce_spark.queries.events_queries",
    "distributed_mapreduce_spark.queries.textops",
    "distributed_mapreduce_spark.queries.simops",
    "distributed_mapreduce_spark.queries.pipeline_queries",
    "distributed_mapreduce_spark.queries.streaming_queries",
)


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {modname}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name not in mod.QUERIES:
                raise ValueError(f"oracle {name!r} in {modname} has no matching query")
            oracles[name] = sql
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
