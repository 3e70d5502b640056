"""Quiet-host native prepare cells + worker scaling (VERDICT r4 #5).

Runs BENCH_MODE=prepare with the native host-SIMD backend at 1/2/4
workers, each in a fresh process, appending one JSON line per cell to
BENCH_PREPARE_r05.jsonl. Run this ALONE on an idle host (no test suite,
no TPU job with host-side work): the round-4 native cell was
contention-flagged and recorded only as a lower bound.

Usage:  python scripts/bench_prepare_sweep.py [out.jsonl]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "BENCH_PREPARE_r05.jsonl")
    # Host-load honesty check recorded with every cell.
    load1 = os.getloadavg()[0]
    for workers in (1, 2, 4):
        env = dict(os.environ, BENCH_MODE="prepare",
                   BENCH_PREPARE_DEVICE="native",
                   BENCH_PREPARE_WORKERS=str(workers))
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            env=env, capture_output=True, text=True)
        wall = time.time() - t0
        row = {"mode": "prepare", "prepare_workers": workers,
               "wall_sec": round(wall, 1),
               "loadavg_at_start": round(load1, 2)}
        last = (proc.stdout.strip().splitlines() or [""])[-1]
        try:
            row.update(json.loads(last))
        except (json.JSONDecodeError, ValueError):
            tail = (proc.stderr or proc.stdout or "").strip().splitlines()
            row["error"] = " | ".join(tail[-3:])[:400] or \
                f"rc={proc.returncode}"
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
        load1 = os.getloadavg()[0]
    print("prepare sweep done", flush=True)


if __name__ == "__main__":
    main()
