"""Fused Pallas matmul-MSDA vs hybrid XLA core, flagship train shapes.

VERDICT round-3 item 2: the gather-free relu-distance-matmul realization
is Mosaic-lowerable; fuse it per level (Ay/Ax construction + both einsums
+ att multiply in VMEM) and A/B against the production hybrid XLA core —
single-process interleaved, readback-fenced, per-view call at flagship
train shapes (like probe_msda_ab.py).

Cores:
  xla    production hybrid (_MATMUL_MAX_HW=600: gather for the camera's
         512x910 level, matmul below)
  mm600  fused Pallas for the matmul levels, XLA gather for 512x910
  mmall  fused Pallas for EVERY level incl. 512x910 (the kernel has no
         HBM intermediate, so the dense-FLOP crossover moves; re-measure)

Run on the real TPU: python scripts/probe_msda_fused.py
"""
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import dpft_tpu.ops.deform_attn as da
from dpft_tpu.utils.profiling import (enable_persistent_compilation_cache,
                                      sync)

enable_persistent_compilation_cache()

VIEWS = {
    # (h, w) pyramids at flagship input shapes (skiplink level first).
    "camera": ((512, 910), (128, 228), (64, 114), (32, 57), (16, 29)),
    "radar_bev": ((256, 107), (64, 27), (32, 14), (16, 7), (8, 4)),
    "radar_front": ((37, 107), (10, 27), (5, 14), (3, 7), (2, 4)),
}
B, H, D, N, P = 4, 8, 2, 400, 4


def timeit(fn, *args, reps=30):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def core(use_fused, cutoff):
    def fn(value, ss, loc, att):
        prev_cut = da._MATMUL_MAX_HW
        da._MATMUL_MAX_HW = cutoff
        try:
            return da._ms_deform_attn_hybrid(value, ss, loc, att,
                                             use_fused=use_fused)
        finally:
            da._MATMUL_MAX_HW = prev_cut
    return fn


CORES = {
    "xla": core(False, 600),
    "mm600": core(True, 600),
    "mmall": core(True, 10 ** 9),
}

rng = np.random.default_rng(0)
for view, ss in VIEWS.items():
    Len = sum(h * w for h, w in ss)
    for dtype in (np.float32, jnp.bfloat16):
        value = jnp.asarray(rng.normal(size=(B, Len, H, D))
                            .astype(np.float32)).astype(dtype)
        loc = jnp.asarray(rng.uniform(0, 1, size=(B, N, H, len(ss), P, 2))
                          .astype(np.float32)).astype(dtype)
        att = jnp.asarray(rng.uniform(size=(B, N, H, len(ss), P))
                          .astype(np.float32)).astype(dtype)
        for name, c in CORES.items():
            f = jax.jit(lambda v, l, a, c=c: c(v, ss, l, a))

            def loss(v, l, a, c=c):
                return jnp.sum(c(v, ss, l, a).astype(jnp.float32) ** 2)
            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            try:
                row = {
                    "view": view,
                    "dtype": ("f32" if dtype is np.float32 else "bf16"),
                    "core": name,
                    "fwd_ms": round(timeit(f, value, loc, att), 3),
                    "fwdbwd_ms": round(timeit(g, value, loc, att), 3),
                }
            except Exception as e:
                row = {"view": view,
                       "dtype": ("f32" if dtype is np.float32 else "bf16"),
                       "core": name,
                       "error": f"{type(e).__name__}: {str(e)[:160]}"}
            print(json.dumps(row), flush=True)
print("done", flush=True)
