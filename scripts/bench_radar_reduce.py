"""Readback-fenced head-to-head of the tesseract-reduction kernels.

Re-measures the ETL hot loop (reference processor.py:588-633) under the
honest timing protocol (utils/profiling.sync — block_until_ready is not
trustworthy on the tunneled backend, scripts/probe_timing_integrity.py):
Pallas one-pass kernel vs jitted XLA reduction vs reference-style NumPy,
per frame at the real K-Radar raster (64, 256, 37, 107).

Run on the real TPU: python scripts/bench_radar_reduce.py
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import numpy as np

from dpft_tpu.ops.radar_reduce import reduce_tesseract, reduce_tesseract_np
from dpft_tpu.utils.profiling import (enable_persistent_compilation_cache,
                                      sync)

enable_persistent_compilation_cache()

rng = np.random.default_rng(0)
tess_np = rng.uniform(1e8, 1e12, size=(64, 256, 37, 107)).astype(np.float32)
tess = jax.device_put(tess_np)


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    print(f"{name:36s} {(time.perf_counter() - t0) / reps * 1e3:9.2f} "
          f"ms/frame", flush=True)


timeit("XLA reduction (device)", reduce_tesseract, tess)
try:
    from dpft_tpu.ops.pallas.radar_reduce import reduce_tesseract_pallas
    timeit("Pallas one-pass (device)", reduce_tesseract_pallas, tess)
except Exception as e:
    print(f"pallas: {type(e).__name__}: {e}", flush=True)

# Host XLA (prepare_device='cpu' path) and reference-style NumPy.
cpu = jax.local_devices(backend="cpu")[0]
tess_cpu = jax.device_put(tess_np, cpu)
timeit("XLA reduction (host cpu)", reduce_tesseract, tess_cpu, reps=5)

t0 = time.perf_counter()
reduce_tesseract_np(tess_np)
print(f"{'reference-style NumPy (host)':36s} "
      f"{(time.perf_counter() - t0) * 1e3:9.2f} ms/frame", flush=True)
print("done", flush=True)
