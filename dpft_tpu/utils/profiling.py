"""Profiling helpers: XLA cost analysis and device trace capture.

TPU equivalents of the reference's measurement tooling (SURVEY.md section 5:
DeepSpeed flops profiler + CUDA-event latency benchmarks):
 - flops/bytes via compiled-HLO cost analysis;
 - wall-clock latency via blocking timing;
 - full device traces (for Perfetto/TensorBoard) via jax.profiler.
"""

from __future__ import annotations

import contextlib
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


def parameter_count(params: Any) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


def benchmark(fn: Callable, *args, repetitions: int = 100,
              warmup: int = 10) -> Tuple[float, float]:
    """(mean_ms, std_ms) of fn(*args) with blocking timing."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    timings = np.zeros(repetitions)
    for i in range(repetitions):
        start = time.perf_counter()
        jax.block_until_ready(fn(*args))
        timings[i] = (time.perf_counter() - start) * 1e3
    return float(timings.mean()), float(timings.std(ddof=1))


def enable_persistent_compilation_cache(
        path: str = "/tmp/dpft_tpu_jax_cache") -> None:
    """Enables JAX's on-disk compilation cache (big win for the matcher's
    loop-nest compiles, ~10 min cold on the remote TPU compiler)."""
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
