"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``distributed_mapreduce_spark/``; this module
stays a thin adapter over its registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Word count (reference Q1, /root/reference/src/mrapps/wc.go) over the
    documents corpus — the reference's own flagship workload.
    """
    from distributed_mapreduce_spark.queries.mapreduce_queries import mr_q1_wordcount
    from distributed_mapreduce_spark.session import tune_session

    return mr_q1_wordcount(tune_session(spark), SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from distributed_mapreduce_spark.registry import all_queries
    from distributed_mapreduce_spark.session import tune_session

    def _tuned(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(tune_session(spark), sf_dir)

        run.__name__ = fn.__name__
        return run

    return {name: _tuned(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted ⇒ rows-only check."""
    from distributed_mapreduce_spark.registry import all_oracles

    return all_oracles()
