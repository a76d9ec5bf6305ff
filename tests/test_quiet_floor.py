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


# ── Calibration rule (VERDICT r11 #1) ────────────────────────────────
# bench.py brackets every pass with fixed-work probes; a pass whose
# calibration deviates > CALIB_RATIO above the recorded baseline at
# BOTH ends is loud regardless of its ext_busy evidence — the r11
# failure class (broadband ~1.3x host slowdown reading quiet on every
# visibility probe) becomes detectable from the artifact alone.

BASE = {"calib_1t_s": 0.19, "calib_nt_s": 1.10, "calib_mem_s": 0.086}


def _probe(scale: float) -> dict:
    return {k: round(v * scale, 4) for k, v in BASE.items()}


def _calib_pass(pre_scale, post_scale, loud=False):
    return [
        {
            "load_1m": 2.0,
            "ext_busy_cores": 0.1,
            "waited_s": 0,
            "loud": loud,
            "calib": _probe(pre_scale),
            "calib_after": _probe(post_scale),
        }
    ]


def _seed_baseline(tmp_path, floors_path):
    """Seed floors + calibration baseline from a quiet calibrated run."""
    run = _run(tmp_path, "seed.json", {"q1": 2.0}, _calib_pass(1.0, 1.0))
    assert qf.cmd_update(run, "seed", False) == 0
    cal = json.loads(floors_path.read_text())["_meta"]["calibration"]
    assert {k: v["s"] for k, v in cal.items()} == BASE
    return cal


def test_update_seeds_and_min_merges_calibration_baseline(tmp_path, floors_path):
    _seed_baseline(tmp_path, floors_path)
    # a faster quiet probe lowers the baseline; a slower one (still
    # within ratio) does not raise it
    faster = _run(tmp_path, "f.json", {"q1": 2.1}, _calib_pass(0.9, 1.05))
    assert qf.cmd_update(faster, "f", False) == 0
    cal = json.loads(floors_path.read_text())["_meta"]["calibration"]
    assert cal["calib_1t_s"] == {"s": round(0.19 * 0.9, 4), "run": "f"}


def test_synthetically_loaded_run_is_flagged_loud_from_artifact_alone(
    tmp_path, floors_path, capsys
):
    """The r11 scenario: every visibility probe reads quiet (loud=False,
    ext_busy ~0) but the host ran ~1.3x slow — the calibration probes
    carry the slowdown in-band, so update refuses and diff labels the
    excess load-inflated, with no judge rerun needed."""
    _seed_baseline(tmp_path, floors_path)
    slow = _run(
        tmp_path, "slow.json", {"q1": 2.6}, _calib_pass(1.3, 1.28)
    )  # q1 at 1.3x floor, probes at ~1.3x baseline, loud=False
    assert qf.cmd_update(slow, "slow", False) == 1  # refused: no quiet pass
    floors = json.loads(floors_path.read_text())
    assert floors["queries"]["q1"]["floor_s"] == 2.0  # floor not polluted
    assert qf.cmd_diff(slow, 1.2) == 0  # excess attributed to load, exit 0
    out = capsys.readouterr().out
    assert "CALIBRATION-LOUD" in out and "load-inflated" in out


def test_single_ended_calibration_deviation_stays_quiet(tmp_path, floors_path):
    """A transient settle (own JVM GC right after the pass) inflates
    only ONE end's probe — that must not flag the pass: the rule needs
    both ends deviant (a sustained window)."""
    _seed_baseline(tmp_path, floors_path)
    run = _run(tmp_path, "t.json", {"q1": 1.9}, _calib_pass(1.0, 1.4))
    assert qf.cmd_update(run, "t", False) == 0
    assert json.loads(floors_path.read_text())["queries"]["q1"]["floor_s"] == 1.9


def test_deviant_run_cannot_raise_its_own_bar(tmp_path, floors_path):
    """The quiet judgment uses the PRE-merge baseline: a calibration-
    loud run must contribute neither floors nor baseline entries, even
    under --force floor merging."""
    _seed_baseline(tmp_path, floors_path)
    slow = _run(tmp_path, "s.json", {"q1": 1.0}, _calib_pass(1.3, 1.3))
    assert qf.cmd_update(slow, "s", force=True) == 0  # forced floor merge
    floors = json.loads(floors_path.read_text())
    assert floors["queries"]["q1"]["floor_s"] == 1.0  # forced, recorded
    cal = floors["_meta"]["calibration"]
    assert all(v["run"] == "seed" for v in cal.values())  # baseline untouched


def test_bootstrap_without_baseline_ignores_calibration(tmp_path, floors_path):
    """Until a baseline exists the calibration rule is vacuous — the
    first quiet run both passes the gate and seeds the baseline."""
    run = _run(tmp_path, "b.json", {"q1": 2.0}, _calib_pass(1.0, 1.0))
    assert qf.cmd_update(run, "b", False) == 0


def test_pre_r12_artifacts_without_probes_keep_their_loud_flags(
    tmp_path, floors_path
):
    _seed_baseline(tmp_path, floors_path)
    old_quiet = _run(tmp_path, "oq.json", {"q1": 1.8}, QUIET)  # no calib keys
    assert qf.cmd_update(old_quiet, "oq", False) == 0
    assert json.loads(floors_path.read_text())["queries"]["q1"]["floor_s"] == 1.8


def test_bench_probe_and_rule_agree_with_quiet_floor():
    """bench.py duplicates the deviation rule (it must flag passes at
    run time to trigger extra-pass machinery): the constants and the
    deviant-key logic must stay in lockstep with quiet_floor.py, and a
    real probe on this host returns positive wall times for all three
    metrics."""
    import importlib.util as ilu
    import os as _os

    spec = ilu.spec_from_file_location(
        "bench", _os.path.join(_os.path.dirname(__file__), "..", "bench.py")
    )
    bench = ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert bench._CALIB_RATIO == qf.CALIB_RATIO
    assert bench._CALIB_LOUD_KEYS == qf.CALIB_LOUD_KEYS
    probe = bench._calibration_probe()
    assert set(probe) == set(qf.CALIB_KEYS)
    assert all(v > 0 for v in probe.values())
    base = {k: v / 1.3 for k, v in probe.items()}  # pretend host was 1.3x faster
    assert bench._calib_deviant_keys(probe, base) == set(qf.CALIB_LOUD_KEYS)
    assert qf._calib_deviant_keys(probe, base) == set(qf.CALIB_LOUD_KEYS)
    assert bench._calib_deviant_keys(probe, {k: v for k, v in probe.items()}) == set()


def test_boost_window_cannot_poison_calibration_baseline(tmp_path, floors_path):
    """The r13 failure mode in reverse: a quiet run whose probes land
    in a boost-friendly window (>10% below the sustained baseline)
    must NOT min-merge the calibration baseline — that one outlier
    would make every later healthy window read loud and forfeit all
    floor merges. Query floors from the run still merge (the run IS
    quiet); only the suspected-boost calibration values are held back.
    Gradual improvements (≤10%) keep merging."""
    _seed_baseline(tmp_path, floors_path)
    boost = _run(tmp_path, "b.json", {"q1": 1.8}, _calib_pass(0.75, 0.8))
    assert qf.cmd_update(boost, "b", False) == 0
    floors = json.loads(floors_path.read_text())
    assert floors["queries"]["q1"]["floor_s"] == 1.8  # floors merged
    cal = floors["_meta"]["calibration"]
    for k in qf.CALIB_KEYS:  # baseline unchanged
        assert cal[k] == {"s": BASE[k], "run": "seed"}, k


def test_mem_only_deviation_stays_quiet(tmp_path, floors_path):
    """calib_mem_s drifts with the bench's OWN JVM memory state
    (measured +22%/+48% within the first two real calibrated runs), so
    it is a recorded diagnostic, not a loudness input — a mem-only
    deviation at both ends must not flag the pass or block the merge."""
    _seed_baseline(tmp_path, floors_path)
    p = _calib_pass(1.0, 1.0)
    for probe_key in ("calib", "calib_after"):
        p[0][probe_key] = dict(p[0][probe_key], calib_mem_s=BASE["calib_mem_s"] * 1.5)
    run = _run(tmp_path, "m.json", {"q1": 1.9}, p)
    assert qf.cmd_update(run, "m", False) == 0
    floors = json.loads(floors_path.read_text())
    assert floors["queries"]["q1"]["floor_s"] == 1.9


def test_bound_records_loud_bounds_without_touching_floors(
    tmp_path, floors_path, capsys
):
    """VERDICT r15 #1: `bound` min-merges a loud run's minima into the
    separate loud_bounds section (tagged, nt range attached) for
    queries WITHOUT floors; floors and calibration stay untouched, and
    `update` keeps refusing loud runs exactly as before."""
    # a floor exists for q1; q2 is floor-less
    qf.cmd_update(_run(tmp_path, "a.json", {"q1": 2.0}, QUIET), "a", False)
    loud_pass = [
        {
            "ext_busy_cores": 12.0,
            "loud": True,
            "calib": {"calib_1t_s": 0.30, "calib_nt_s": 1.50},
            "calib_after": {"calib_1t_s": 0.31, "calib_nt_s": 1.80},
        }
    ]
    run = _run(tmp_path, "loud.json", {"q1": 9.0, "q2": 5.0}, loud_pass)
    assert qf.cmd_bound(run, "loudA") == 0
    floors = json.loads(floors_path.read_text())
    # floors untouched (q1 keeps its quiet floor; q2 gained none)
    assert floors["queries"] == {"q1": {"floor_s": 2.0, "run": "a"}}
    b = floors["loud_bounds"]["q2"]
    assert b["bound_s"] == 5.0 and b["loud_bound"] is True and b["run"] == "loudA"
    assert "loud_bounds_definition" in floors["_meta"]
    # min-merge: a worse later bound does not regress it
    qf.cmd_bound(_run(tmp_path, "loud2.json", {"q2": 7.0}, loud_pass), "loudB")
    floors = json.loads(floors_path.read_text())
    assert floors["loud_bounds"]["q2"]["bound_s"] == 5.0
    # update still refuses the loud run outright
    assert qf.cmd_update(run, None, force=False) == 1


def test_bound_attaches_nt_range_and_quiet_merge_supersedes(
    tmp_path, floors_path
):
    """The nt range is the run's calib_nt_s spread over the recorded
    baseline; the first quiet update that floors a bounded query
    REMOVES its bound."""
    # seed a calibration baseline via a quiet calibrated run
    quiet_cal = [
        {
            "ext_busy_cores": 0.1,
            "loud": False,
            "calib": {"calib_1t_s": 0.20, "calib_nt_s": 1.00},
            "calib_after": {"calib_1t_s": 0.20, "calib_nt_s": 1.00},
        }
    ]
    qf.cmd_update(_run(tmp_path, "base.json", {"q1": 2.0}, quiet_cal), "base", False)
    loud_pass = [
        {
            "ext_busy_cores": 0.1,
            "loud": True,
            "calib": {"calib_1t_s": 0.30, "calib_nt_s": 1.30},
            "calib_after": {"calib_1t_s": 0.30, "calib_nt_s": 1.95},
        }
    ]
    qf.cmd_bound(_run(tmp_path, "loud.json", {"q2": 5.0}, loud_pass), "loudA")
    floors = json.loads(floors_path.read_text())
    assert floors["loud_bounds"]["q2"]["nt_x_range"] == [1.3, 1.95]
    # a quiet run flooring q2 supersedes the bound
    qf.cmd_update(
        _run(tmp_path, "q.json", {"q2": 4.2}, quiet_cal), "quietQ", False
    )
    floors = json.loads(floors_path.read_text())
    assert floors["queries"]["q2"]["floor_s"] == 4.2
    assert "loud_bounds" not in floors
