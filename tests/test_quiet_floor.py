"""Unit tests for scripts/quiet_floor.py — the quiet-floor merge
invariant (floors only absorb runs with in-band quiet-pass evidence)
is what lets a future round separate load inflation from regressions,
so it gets its own fast, Spark-free tests."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "quiet_floor",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "quiet_floor.py"),
)
qf = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(qf)


@pytest.fixture
def floors_path(tmp_path, monkeypatch):
    p = tmp_path / "quiet_floors.json"
    monkeypatch.setattr(qf, "FLOORS_PATH", str(p))
    return p


def _run(tmp_path, name, queries, pass_loads):
    p = tmp_path / name
    p.write_text(json.dumps({"queries": queries, "pass_loads": pass_loads}))
    return str(p)


QUIET = [{"load_1m": 2.0, "ext_busy_cores": 0.1, "waited_s": 0, "loud": False}]
LOUD = [{"load_1m": 20.0, "ext_busy_cores": 12.0, "waited_s": 300, "loud": True}]


def test_update_refuses_loud_run_without_force(tmp_path, floors_path, capsys):
    run = _run(tmp_path, "loud.json", {"q1": 5.0}, LOUD)
    assert qf.cmd_update(run, None, force=False) == 1
    assert not floors_path.exists()
    assert qf.cmd_update(run, None, force=True) == 0
    assert json.loads(floors_path.read_text())["queries"]["q1"]["floor_s"] == 5.0


def test_update_refuses_pre_r5_artifact_without_pass_loads(tmp_path, floors_path):
    p = tmp_path / "old.json"
    p.write_text(json.dumps({"queries": {"q1": 5.0}}))  # no pass_loads at all
    assert qf.cmd_update(str(p), None, force=False) == 1


def test_update_merges_minimum_only(tmp_path, floors_path):
    qf.cmd_update(_run(tmp_path, "a.json", {"q1": 5.0, "q2": 1.0}, QUIET), "a", False)
    qf.cmd_update(_run(tmp_path, "b.json", {"q1": 4.0, "q2": 2.0}, QUIET), "b", False)
    floors = json.loads(floors_path.read_text())["queries"]
    assert floors["q1"] == {"floor_s": 4.0, "run": "b"}
    assert floors["q2"] == {"floor_s": 1.0, "run": "a"}  # 2.0 did not regress it


def test_diff_flags_only_above_ratio_and_exit_depends_on_quietness(
    tmp_path, floors_path, capsys
):
    qf.cmd_update(_run(tmp_path, "a.json", {"q1": 2.0, "q2": 1.0}, QUIET), "a", False)
    # quiet run, q1 at 2x floor -> regression suspect, exit 1
    slow_quiet = _run(tmp_path, "sq.json", {"q1": 4.0, "q2": 1.1}, QUIET)
    assert qf.cmd_diff(slow_quiet, 1.5) == 1
    out = capsys.readouterr().out
    assert "REGRESSION" in out and "q1" in out and "q2" not in out.split("q1")[1]
    # same numbers but loud run -> load-inflated, exit 0
    slow_loud = _run(tmp_path, "sl.json", {"q1": 4.0, "q2": 1.1}, LOUD)
    assert qf.cmd_diff(slow_loud, 1.5) == 0
    assert "load-inflated" in capsys.readouterr().out
    # within ratio -> clean exit
    ok = _run(tmp_path, "ok.json", {"q1": 2.5, "q2": 1.0}, QUIET)
    assert qf.cmd_diff(ok, 1.5) == 0


def test_diff_reports_new_queries_without_failing(tmp_path, floors_path, capsys):
    qf.cmd_update(_run(tmp_path, "a.json", {"q1": 2.0}, QUIET), "a", False)
    run = _run(tmp_path, "n.json", {"q1": 2.0, "q_new": 9.0}, QUIET)
    assert qf.cmd_diff(run, 1.5) == 0
    assert "NEW" in capsys.readouterr().out


def test_update_accepts_driver_wrapper_shape(tmp_path, floors_path):
    """BENCH_r*.json wraps the record under 'parsed'."""
    p = tmp_path / "wrapped.json"
    p.write_text(
        json.dumps({"parsed": {"queries": {"q1": 3.0}, "pass_loads": QUIET}})
    )
    assert qf.cmd_update(str(p), "wrapped", False) == 0
