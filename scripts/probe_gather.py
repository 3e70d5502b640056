"""Why is the MSDA gather slow on the v5e, and which formulation is fast?

The consolidated XLA core spends ~10-15 ms per call in ONE
take_along_axis of ~563k (1,1,2)-slices out of a (32, Len, 2) operand —
~100x off HBM speed-of-light for the 129 MB it touches. This probe times
isolated gather formulations at the flagship camera-view shape to find
the fast one:

  a) batched take_along_axis: (BH, Len, D) x idx (BH, K)        [current]
  b) flat axis-0 take: (BH*Len, D) rows at global indices
  c) per-level 2x2 patch gather (lax.gather slice_sizes (1,2,2,D))
  d) full-lane dynamic_gather shape: take_along_axis (BH*D, Len) with
     indices padded to (BH*D, Len) — what Mosaic's tpu.dynamic_gather
     needs (pallas kernel candidate)
  e) pallas kernel with (d) inside (one program per (b,h))

Run on the real TPU: python scripts/probe_gather.py
"""
import functools
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

BH = 32          # B=4 x H=8
D = 2
K = 17600        # N*L*P*4 = 220*5*4*4 gathered rows per (b,h)
rng = np.random.default_rng(0)


def timeit(fn, *args, reps=30):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


for Len in (504688, 29712, 4328):
    val = jnp.asarray(rng.normal(size=(BH, Len, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, Len, size=(BH, K)).astype(np.int32))
    res = {"Len": Len}

    # a) batched take_along_axis (the consolidated core's op)
    a = jax.jit(lambda v, i: jnp.take_along_axis(v, i[..., None], axis=1))
    res["a_batched_ms"] = timeit(a, val, idx)

    # b) flat axis-0 row gather
    def flat(v, i):
        g = jnp.take(v.reshape(BH * Len, D),
                     (i + (jnp.arange(BH, dtype=jnp.int32) * Len)[:, None])
                     .reshape(-1), axis=0)
        return g.reshape(BH, K, D)
    res["b_flat_ms"] = timeit(jax.jit(flat), val, idx)

    # d) full-lane-width take_along_axis: (BH*D, Len) idx (BH*D, Len)
    val_t = jnp.asarray(rng.normal(size=(BH * D, Len)).astype(np.float32))
    idx_full = jnp.asarray(
        rng.integers(0, Len, size=(BH * D, Len)).astype(np.int32))
    dfun = jax.jit(lambda v, i: jnp.take_along_axis(v, i, axis=1))
    res["d_fullwidth_ms"] = timeit(dfun, val_t, idx_full)

    # d2) lane-width gather but only K columns of indices (padded shape
    # (BH*D, Kpad)) against Len lanes — NOT mosaic-lowerable, but shows
    # XLA's cost when output is small and indices unbatched per row.
    idx_k = jnp.asarray(
        rng.integers(0, Len, size=(BH * D, K)).astype(np.int32))
    res["d2_rowwise_k_ms"] = timeit(dfun, val_t, idx_k)

    print(json.dumps(res), flush=True)

# e) pallas dynamic_gather kernel at the camera shape
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

for Len in (504688, 29712, 4328):
    val_t = jnp.asarray(rng.normal(size=(BH * D, Len)).astype(np.float32))
    idx_full = jnp.asarray(
        rng.integers(0, Len, size=(BH * D, Len)).astype(np.int32))

    def kern(v_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(v_ref[...], i_ref[...], axis=1)

    rows = 8

    def pall(v, i):
        return pl.pallas_call(
            kern,
            grid=(BH * D // rows,),
            in_specs=[pl.BlockSpec((rows, Len), lambda r: (r, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((rows, Len), lambda r: (r, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, Len), lambda r: (r, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BH * D, Len), v.dtype),
        )(v, i)

    try:
        t = timeit(jax.jit(pall), val_t, idx_full)
        print(json.dumps({"Len": Len, "e_pallas_fullwidth_ms": t}),
              flush=True)
    except Exception as ex:
        print(json.dumps({"Len": Len,
                          "e_pallas_error": f"{type(ex).__name__}: {ex}"
                          [:300]}), flush=True)
