#!/usr/bin/env python3
"""Launch a bench run the moment the host enters a calibration-quiet
window (VERDICT r13 #1 follow-through).

The nt spin oscillates between ~0.95x and ~1.7x of baseline on this
host over minutes-to-hours (time-varying co-tenancy invisible to
ext_busy — the r11 class the calibration probes exist to expose), so
a bench launched blind usually lands loud and forfeits every floor
merge. This watcher samples the probes at a fixed cadence and starts
`bench.py --tier <tier>` only after `consecutive` successive samples
read quiet against the tier's floors-file baseline; afterwards it
attempts the floor merge (which independently re-checks quietness
from the run's own bracketing probes — the watcher only IMPROVES the
odds, the artifact still adjudicates itself).

Usage:
    python scripts/quiet_window_bench.py <tier> [max_wait_h] [consecutive]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

RATIO = 1.15
CADENCE_S = 120


def _baseline(tier: str) -> dict:
    name = "quiet_floors.json" if tier == "registered" else "quiet_floors_shadow.json"
    with open(os.path.join(HERE, name)) as f:
        cal = json.load(f)["_meta"]["calibration"]
    return {k: v["s"] for k, v in cal.items()}


def main() -> int:
    tier = sys.argv[1] if len(sys.argv) > 1 else "shadow"
    max_wait_h = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    need = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import bench

    base = _baseline(tier)
    deadline = time.time() + max_wait_h * 3600
    streak = 0
    while time.time() < deadline:
        probe = bench._calibration_probe()
        quiet = all(
            probe.get(k, 0) <= RATIO * base[k]
            for k in ("calib_1t_s", "calib_nt_s")
            if k in base
        )
        streak = streak + 1 if quiet else 0
        print(
            f"[watch] 1t={probe.get('calib_1t_s')} nt={probe.get('calib_nt_s')} "
            f"quiet={quiet} streak={streak}/{need}",
            flush=True,
        )
        if streak >= need:
            print("[watch] quiet window — launching bench", flush=True)
            rc = subprocess.call(
                [sys.executable, os.path.join(REPO, "bench.py"), "--tier", tier],
                cwd=REPO,
            )
            print(f"[watch] bench rc={rc}", flush=True)
            if rc == 0:
                artifact = os.path.join(
                    REPO,
                    "bench_last.json" if tier == "registered" else "bench_shadow_last.json",
                )
                args = [
                    sys.executable,
                    os.path.join(HERE, "quiet_floor.py"),
                ]
                if tier != "registered":
                    args += ["--floors", os.path.join(HERE, "quiet_floors_shadow.json")]
                args += ["update", artifact, f"r15-{tier}-quietwatch"]
                rc2 = subprocess.call(args, cwd=REPO)
                print(f"[watch] floor update rc={rc2}", flush=True)
                if rc2 == 0:
                    return 0
                # merge refused (window soured mid-run): keep watching
                streak = 0
                continue
            return rc
        time.sleep(CADENCE_S)
    print("[watch] no quiet window within the wait budget", flush=True)
    return 3


if __name__ == "__main__":
    sys.exit(main())
