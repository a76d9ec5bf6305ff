#!/usr/bin/env python3
"""Long-window calibration observation for baseline re-seeding.

SCALE.md (r13) documents that the 1t spin baseline (0.1771/0.1808 s)
was seeded in a boost-friendly window — one hot thread on an otherwise
idle socket — so on healthy sustained windows the 1t ratio reads
~1.2x and every pass flags calibration-loud, forfeiting all floor
merges. The documented fix is to RE-SEED the baseline from a longer
observation window: sample the same fixed-work probes bench.py uses,
spread over hours, and take a robust statistic that represents
sustained (not burst-boost) single-thread speed.

Usage:
    python scripts/calib_observe.py loop [interval_s] [out_path]
        Sample forever at interval_s (default 180), appending one JSON
        line per probe to out_path (default /tmp/calib_obs.jsonl).
        Skips a sample when /tmp/calib_pause exists (touched by the
        operator around bench runs so the fork-per-core nt spin never
        lands inside a timed pass).
    python scripts/calib_observe.py once
        One probe, printed to stdout.
    python scripts/calib_observe.py summarize [out_path]
        Print count / min / p25 / median / p75 / max per metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

PAUSE_FLAG = "/tmp/calib_pause"
DEFAULT_OUT = "/tmp/calib_obs.jsonl"


def _probe() -> dict:
    import bench

    rec = bench._calibration_probe()
    rec["ts"] = round(time.time(), 1)
    try:
        rec["load1"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    return rec


def cmd_loop(interval_s: float, out_path: str) -> int:
    while True:
        if not os.path.exists(PAUSE_FLAG):
            rec = _probe()
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        time.sleep(interval_s)


def cmd_once() -> int:
    print(json.dumps(_probe()))
    return 0


def cmd_summarize(out_path: str) -> int:
    rows = []
    with open(out_path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    if not rows:
        print("no samples")
        return 1
    keys = ("calib_1t_s", "calib_nt_s", "calib_mem_s")
    print(f"samples: {len(rows)} over "
          f"{(rows[-1]['ts'] - rows[0]['ts']) / 3600:.2f} h")
    for k in keys:
        vals = sorted(r[k] for r in rows if k in r)
        if not vals:
            continue
        n = len(vals)

        def q(p: float) -> float:
            return vals[min(n - 1, int(p * n))]

        print(f"{k}: n={n} min={vals[0]:.4f} p25={q(0.25):.4f} "
              f"med={q(0.5):.4f} p75={q(0.75):.4f} max={vals[-1]:.4f}")
    return 0


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    cmd = sys.argv[1]
    if cmd == "loop":
        interval = float(sys.argv[2]) if len(sys.argv) > 2 else 180.0
        out = sys.argv[3] if len(sys.argv) > 3 else DEFAULT_OUT
        return cmd_loop(interval, out)
    if cmd == "once":
        return cmd_once()
    if cmd == "summarize":
        return cmd_summarize(sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT)
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
