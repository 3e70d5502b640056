"""Profiling helpers: XLA cost analysis and device trace capture.

TPU equivalents of the reference's measurement tooling (SURVEY.md section 5:
DeepSpeed flops profiler + CUDA-event latency benchmarks):
 - flops/bytes via compiled-HLO cost analysis;
 - wall-clock latency via blocking timing;
 - full device traces (for Perfetto/TensorBoard) via jax.profiler.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Callable, Dict, Tuple

import jax
import numpy as np


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """FLOPs / bytes-accessed of the compiled function on example args."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    cost = cost or {}
    return {
        "flops": float(cost.get("flops", 0.0)),
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
    }


def memory_analysis(compiled) -> Dict[str, float]:
    """Static HBM accounting of a compiled executable, in GiB.

    The tunneled PJRT runtime exposes no ``memory_stats()`` allocator
    counters, so the runtime high-water mark is unobservable here; the
    compiler's static estimate (argument + output + temp + generated-code
    buffers) is the honest substitute and is what XLA itself allocates
    against. ``total_gb`` is their sum, an upper bound on the program's
    live-at-once footprint (arguments may alias/donate).
    """
    mem = compiled.memory_analysis()
    if mem is None:
        return {}
    gib = 2.0 ** 30

    def _get(*names):
        for n in names:
            v = getattr(mem, n, None)
            if v is not None:
                return float(v)
        return 0.0

    arg = _get("argument_size_in_bytes")
    out = _get("output_size_in_bytes")
    alias = _get("alias_size_in_bytes")
    temp = _get("temp_size_in_bytes")
    code = _get("generated_code_size_in_bytes")
    return {
        "argument_gb": round(arg / gib, 3),
        "output_gb": round(out / gib, 3),
        "alias_gb": round(alias / gib, 3),
        "temp_gb": round(temp / gib, 3),
        "generated_code_gb": round(code / gib, 3),
        # aliased output bytes live in the argument buffers already
        "total_gb": round((arg + out - alias + temp + code) / gib, 3),
    }


def static_memory_of(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """memory_analysis of ``jit(fn)`` lowered on example args."""
    return memory_analysis(jax.jit(fn).lower(*args, **kwargs).compile())


def parameter_count(params: Any) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


def sync(out: Any) -> float:
    """Forces TRUE completion of a computation's result.

    On the tunneled single-chip backend `jax.block_until_ready` can signal
    readiness before the device actually finished (measured 2026-08-19: an
    end-blocked loop reported the flagship forward at 1.2 ms/batch while a
    readback-barrier measured 113-152 ms — physically consistent with the
    program's FLOPs, while 1.2 ms is not). Reading ONE element of a result
    buffer back to the host cannot be signalled early: the bytes exist only
    after the program ran. Costs one D2H round trip (~27 ms through the
    tunnel, ~free locally) plus a trivial slice program.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    import jax.numpy as jnp
    return float(jax.device_get(jnp.ravel(leaf)[:1])[0])


def readback_rtt_ms(reference: Any, reps: int = 5) -> float:
    """Median cost of `sync` on an ALREADY-completed buffer: the pure
    host<->device round-trip component to subtract from per-call timings
    (the reference's CUDA events likewise exclude host sync overhead)."""
    sync(reference)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(reference)
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def benchmark(fn: Callable, *args, repetitions: int = 100,
              warmup: int = 10) -> Tuple[float, float]:
    """(mean_ms, std_ms) of fn(*args), readback-barrier timing.

    Each repetition is fenced by `sync` (see above: block_until_ready is
    not trustworthy on the tunneled backend), and the pure round-trip cost
    of the barrier itself — measured on an already-ready buffer — is
    subtracted, matching the reference's CUDA-event semantics
    (device time, not host sync overhead; reference evaluator.py:96-135).
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    rtt = readback_rtt_ms(out)
    timings = np.zeros(repetitions)
    for i in range(repetitions):
        start = time.perf_counter()
        sync(fn(*args))
        timings[i] = (time.perf_counter() - start) * 1e3
    timings = np.maximum(timings - rtt, 0.0)
    return float(timings.mean()), float(timings.std(ddof=1))


def benchmark_medians(fn: Callable, *args, repetitions: int = 10,
                      warmup: int = 3, runs: int = 5
                      ) -> Tuple[float, float]:
    """(median_of_medians_ms, half_spread_ms) over `runs` independent runs.

    The tunneled backend drifts run-to-run (STATUS.md: identical code
    measured 27.4 vs 45.8 ms in different sessions), so single-run means
    are not defensible as budget-table lines. This protocol repeats the
    readback-fenced per-call measurement `runs` times, takes each run's
    MEDIAN (robust to the occasional seconds-long D2H stall), and reports
    the median of those medians with half the min-max spread as the error
    bar. The rtt subtraction matches `benchmark`.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    medians = []
    for _ in range(runs):
        rtt = readback_rtt_ms(out)
        times = np.zeros(repetitions)
        for i in range(repetitions):
            t0 = time.perf_counter()
            sync(fn(*args))
            times[i] = (time.perf_counter() - t0) * 1e3
        medians.append(max(float(np.median(times)) - rtt, 0.0))
    medians = np.asarray(medians)
    return (float(np.median(medians)),
            float((medians.max() - medians.min()) / 2.0))


def benchmark_pipelined(fn: Callable, argsets, repetitions: int = 60,
                        warmup: int = 6) -> float:
    """Mean ms/call with dispatch overlapping execution: all calls are
    enqueued without intermediate barriers (cycling `argsets` to defeat
    any same-input shortcuts), then ONE readback fences the tail. The
    device executes programs serially, so wall/reps is true steady-state
    device throughput."""
    out = None
    for i in range(max(warmup, len(argsets))):
        out = fn(*argsets[i % len(argsets)])
    sync(out)
    t0 = time.perf_counter()
    for i in range(repetitions):
        out = fn(*argsets[i % len(argsets)])
    sync(out)
    return (time.perf_counter() - t0) / repetitions * 1e3


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    """Enables JAX's on-disk compilation cache (big win for the matcher's
    loop-nest compiles, ~10 min cold on the remote TPU compiler; the
    embedded-matcher monolith step is ~70 min cold).

    Default location is REPO-LOCAL (`<repo>/.jax_cache`, gitignored), not
    /tmp: /tmp is wiped across container restarts, which silently re-costs
    every multi-minute remote compile. Override with $DPFT_JAX_CACHE_DIR.
    """
    if path is None:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        path = os.environ.get("DPFT_JAX_CACHE_DIR",
                              os.path.join(repo_root, ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # older jax or unsupported backend: best-effort


@contextlib.contextmanager
def trace(log_dir: str):
    """Captures a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
