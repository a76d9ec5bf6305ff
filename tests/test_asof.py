"""As-of join semantics: inclusive ties, no-prior nulls, per-key
isolation, payload atomicity."""

from __future__ import annotations

import datetime as dt

from distributed_mapreduce_spark.operators.asof import asof_join


def ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            ("u1", ts(10), "p1"),  # prior right at 5
            ("u1", ts(20), "p2"),  # tie with right at 20 → inclusive
            ("u2", ts(10), "p3"),  # no prior right for u2
            ("u3", ts(10), "p4"),  # u3 has right only AFTER → null
        ],
        "user string, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [
            ("u1", ts(5), 1.0),
            ("u1", ts(20), 2.0),
            ("u1", ts(25), 9.0),  # after p2 — never matched
            ("u3", ts(30), 3.0),
        ],
        "user string, ts timestamp, v double",
    )
    got = {
        r["pid"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(left, right, key="user", right_cols=["v"]).collect()
    }
    assert got["p1"] == (ts(5), 1.0)
    assert got["p2"] == (ts(20), 2.0)  # ties are inclusive
    assert got["p3"] == (None, None)
    assert got["p4"] == (None, None)  # later right rows don't match


def test_asof_join_single_shuffle_no_join(spark):
    """The plan is a window over a union — no join node, no pair blowup."""
    from distributed_mapreduce_spark import plans

    left = spark.createDataFrame([("u1", ts(1), "p")], "user string, ts timestamp, pid string")
    right = spark.createDataFrame([("u1", ts(0), 1.0)], "user string, ts timestamp, v double")
    plan = plans.physical_plan(asof_join(left, right, key="user", right_cols=["v"]))
    assert "Join" not in plan
    assert "Window" in plan
