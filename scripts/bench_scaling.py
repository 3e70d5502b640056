"""Batch/dtype scaling frontier driver (VERDICT round-3 item 1a).

Walks bench.py over a (mode, batch, dtype) matrix SEQUENTIALLY (one TPU
job at a time — CLAUDE.md: never two timed TPU jobs concurrently) and
appends each result as one JSON line to the output file. Each cell runs
in a FRESH process so HBM high-water marks are per-config and an OOM in
one cell (itself a frontier datapoint) cannot poison the next.

Usage:
    python scripts/bench_scaling.py out.jsonl inference 4:f32 8:f32 ...
    python scripts/bench_scaling.py out.jsonl train 4:bf16 8:bf16 ...
    python scripts/bench_scaling.py out.jsonl train 8:bf16:hoist ...

An optional third cell field selects the train step structure:
`hoist` sets BENCH_HOIST=1 (three-program hoisted layout, minutes to
compile) — the right structure for FRONTIER cells where the default
embedded-matcher monolith's ~70 min/cell cold remote compile would blow
the budget; the monolith headline cell(s) omit it. `nometric` sets
BENCH_NO_METRIC=1 (the logging=null step: the per-step mAP/mGIoU the
reference computes-and-discards is skipped).

A cell that dies (e.g. RESOURCE_EXHAUSTED at large B) is recorded as
{"mode":..., "batch":..., "dtype":..., "error": "..."} — the HBM wall is
part of the frontier, not a failure of the study.
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cell(out_path, mode, batch, dtype, variant=""):
    env = dict(os.environ)
    env["BENCH_MODE"] = mode
    env["BENCH_BATCH"] = str(batch)
    env["BENCH_DTYPE"] = "" if dtype == "f32" else "bfloat16"
    if variant == "hoist":
        env["BENCH_HOIST"] = "1"
    elif variant == "nometric":
        # logging=None semantics: the reference computes the per-step
        # mAP/mGIoU and discards it when no writer consumes it, so the
        # metric-free step is the honest deployment cell for unlogged
        # training (trainer.from_config auto-selects it for logging=null).
        env["BENCH_NO_METRIC"] = "1"
    elif variant:
        raise SystemExit(f"unknown cell variant {variant!r}")
    # Train compiles are slow on the remote compiler; keep reps modest so
    # a full matrix fits a session. FLOPs probes re-use the same lowered
    # program (cached), cheap enough to keep on.
    env.setdefault("BENCH_REPS", "20" if mode == "train" else "60")
    env["BENCH_FLOPS"] = "1"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True)
    wall = time.time() - t0
    row = {"mode": mode, "batch": batch, "dtype": dtype,
           "wall_sec": round(wall, 1)}
    if variant:
        row["variant"] = variant
    last = (proc.stdout.strip().splitlines() or [""])[-1]
    try:
        row.update(json.loads(last))
    except (json.JSONDecodeError, ValueError):
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()
        row["error"] = " | ".join(tail[-3:])[:400] or f"rc={proc.returncode}"
    with open(out_path, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    out_path, mode = sys.argv[1], sys.argv[2]
    for cell in sys.argv[3:]:
        b, dt, *rest = cell.split(":")
        run_cell(out_path, mode, int(b), dt, *rest)
    print("scaling sweep done", flush=True)


if __name__ == "__main__":
    main()
