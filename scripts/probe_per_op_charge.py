"""Pin the tunneled runtime's per-executed-op charge with long chains.

The round-5 latency budget (LATENCY_BUDGET_r05.json) showed the whole
flagship forward executing 7.6k HLO ops in ~9.6 ms (~1.3 us/op), which
contradicts the recorded ~40-120 us/op folklore (CLAUDE.md) - that
figure evidently applies per PROGRAM DISPATCH (e.g. eager init issuing
one program per op), not per op inside a program. A 220-op chain was
below the measurement noise floor, so this probe uses chains long enough
(200 vs 5200 dots) that a ~1 us/op slope is a ~5 ms signal.

Each chain step is an 8x8 dot (XLA never merges two dots into one
fusion, verified by entry_op_count). Appends a JSON line to stdout and
PER_OP_CHARGE_r05.json.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from probe_latency_budget import entry_op_count  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from dpft_tpu.utils.profiling import (
        benchmark_medians, enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()

    def chain(n):
        def f(x):
            for _ in range(n):
                x = x @ x
            return x
        return jax.jit(f)

    x0 = jax.device_put(jnp.full((8, 8), 0.99, jnp.float32))
    rows = []
    for n in (200, 5200):
        c = chain(n)
        ops = entry_op_count(c.lower(x0).compile())
        ms, err = benchmark_medians(c, x0, repetitions=10, runs=5)
        rows.append({"n": n, "ops": ops, "ms": round(ms, 3),
                     "err_ms": round(err, 3)})
        print(json.dumps(rows[-1]), flush=True)

    slope_us = (rows[1]["ms"] - rows[0]["ms"]) * 1e3 / max(
        rows[1]["ops"] - rows[0]["ops"], 1)
    result = {"probe": "per_op_charge", "chains": rows,
              "us_per_executed_op": round(slope_us, 3)}
    print(json.dumps(result), flush=True)
    with open(os.path.join(ROOT, "PER_OP_CHARGE_r05.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
