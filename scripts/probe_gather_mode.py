"""Does gather mode / index sortedness change the v5e per-row rate?

take_along_axis defaults to mode=CLIP. The MSDA core's indices are
already clipped in-range, so PROMISE_IN_BOUNDS is semantically identical
— if XLA's TPU gather emits bounds handling per row, skipping it could
raise the ~100M rows/s rate that bounds the whole MSDA stack. Also tries
indices_are_sorted=True on sorted indices to see the ceiling sorting
could unlock (the real indices are unsorted; this is diagnostic only).

Run on the real TPU.
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

BH, D, K = 32, 2, 32000          # flagship per-call rows: N*L*P*4 @ N=400
Len = 504688
rng = np.random.default_rng(0)
val = jnp.asarray(rng.normal(size=(BH, Len, D)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, Len, size=(BH, K)).astype(np.int32))
idx_sorted = jnp.sort(idx, axis=1)


def timeit(fn, *args, reps=30):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def gather(v, i, mode, is_sorted):
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(v, i[..., None], dnums, slice_sizes=(1, 1, D),
                          mode=mode, indices_are_sorted=is_sorted)


res = {}
res["clip_ms"] = timeit(jax.jit(
    lambda v, i: jnp.take_along_axis(v, i[..., None], axis=1)), val, idx)
res["promise_ms"] = timeit(jax.jit(
    lambda v, i: gather(v, i, jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                        False)), val, idx)
res["promise_sorted_ms"] = timeit(jax.jit(
    lambda v, i: gather(v, i, jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                        True)), val, idx_sorted)
res["fill_ms"] = timeit(jax.jit(
    lambda v, i: gather(v, i, jax.lax.GatherScatterMode.FILL_OR_DROP,
                        False)), val, idx)

# Scatter-add (the backward's d_value op), CLIP vs PROMISE.
upd = jnp.asarray(rng.normal(size=(BH, K, D)).astype(np.float32))


def scat(v, i, u, mode):
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(2,), inserted_window_dims=(1,),
        scatter_dims_to_operand_dims=(1,),
        operand_batching_dims=(0,), scatter_indices_batching_dims=(0,))
    return jax.lax.scatter_add(v, i[..., None], u, dnums, mode=mode)


res["scatter_clip_ms"] = timeit(jax.jit(
    lambda v, i, u: scat(v, i, u, jax.lax.GatherScatterMode.CLIP)),
    jnp.zeros_like(val), idx, upd)
res["scatter_promise_ms"] = timeit(jax.jit(
    lambda v, i, u: scat(v, i, u,
                         jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)),
    jnp.zeros_like(val), idx, upd)
print(json.dumps(res), flush=True)
