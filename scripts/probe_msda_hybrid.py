"""Per-level hybrid MSDA core: gather for huge levels, matmul for the rest.

probe_msda_ab.py (N=400) showed the matmul core wins everywhere except
the camera view's level 1 (512x910), where the relu-distance matmuls pay
~95 GF + ~1 GB HBM per call at f32 while the gather core's cost is only
the fixed ~2 ms row cost. This times the camera view per-level-choice
hybrid at thresholds T on (h + w): matmul if h + w <= T else gather —
f32 and bf16 — to pick the production cutoff.
"""
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dpft_tpu.utils.profiling import (enable_persistent_compilation_cache,
                                      sync)

enable_persistent_compilation_cache()

src = open(osp.join(osp.dirname(osp.abspath(__file__)),
                    "probe_msda_ab.py")).read()
ns = {"__file__": osp.abspath(__file__)}
exec(src.split("\ndef timeit")[0], ns)  # reuse v1/v4 level math
v1_core, v4_core = ns["v1_core"], ns["v4_core"]


def hybrid(T):
    def core(value, spatial_shapes, loc_all, att_all):
        big = tuple((h, w) for h, w in spatial_shapes if h + w > T)
        small = tuple((h, w) for h, w in spatial_shapes if h + w <= T)
        # Assumes levels sorted big->small (true for FPN pyramids).
        assert spatial_shapes == big + small
        sizes = [h * w for h, w in spatial_shapes]
        cut = sum(sizes[:len(big)])
        out = 0.0
        if big:
            out = v1_core(value[:, :cut], big,
                          loc_all[:, :, :, :len(big)],
                          att_all[:, :, :, :len(big)])
        if small:
            out = out + v4_core(value[:, cut:], small,
                                loc_all[:, :, :, len(big):],
                                att_all[:, :, :, len(big):])
        return out
    return core


def timeit(fn, *args, reps=30):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


ss = ((512, 910), (128, 228), (64, 114), (32, 57), (16, 29))
Len = sum(h * w for h, w in ss)
B, H, D, N, P = 4, 8, 2, 400, 4
rng = np.random.default_rng(0)

for dtype in (np.float32, jnp.bfloat16):
    value = jnp.asarray(rng.normal(size=(B, Len, H, D)).astype(np.float32)
                        ).astype(dtype)
    loc = jnp.asarray(rng.uniform(0, 1, size=(B, N, H, len(ss), P, 2))
                      .astype(np.float32)).astype(dtype)
    att = jnp.asarray(rng.uniform(size=(B, N, H, len(ss), P))
                      .astype(np.float32)).astype(dtype)
    for name, core in [("v1", v1_core), ("v4", v4_core),
                       ("hyb600", hybrid(600)), ("hyb400", hybrid(400))]:
        f = jax.jit(lambda v, l, a, c=core: c(v, ss, l, a))

        def loss(v, l, a, c=core):
            return jnp.sum(c(v, ss, l, a).astype(jnp.float32) ** 2)
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        print(json.dumps({
            "dtype": np.dtype(dtype).name if dtype is np.float32 else "bf16",
            "core": name,
            "fwd_ms": timeit(f, value, loc, att),
            "fwdbwd_ms": timeit(g, value, loc, att),
        }), flush=True)
