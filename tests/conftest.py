from __future__ import annotations

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from distributed_mapreduce_spark.session import get_spark

    # local[4, 2]: 4 threads, maxFailures=2 — lets the fault-injection
    # test (test_mapreduce.py::test_crash_retry_matches_golden) kill
    # first task attempts and still converge; no effect on tests that
    # never fail a task.
    spark = get_spark(app_name="dmr-tests", master="local[4, 2]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
