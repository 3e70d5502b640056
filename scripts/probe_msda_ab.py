"""Single-process A/B of MSDA core formulations at flagship train shapes.

probe_gather.py showed the v5e executes XLA gathers at a ~fixed per-ROW
rate (~5-7 ms for 563k rows regardless of payload), so formulations
differ by how many gather rows they issue per call:

  v1: per-level x per-neighbour gathers (20 ops, 563k rows total)
  v2: one consolidated gather (1 op, 563k rows)   [current core]
  v3: per-level 2x2-PATCH gathers (5 ops, 141k rows: the four bilinear
      neighbours arrive as one (2,2,D) slice; weights computed per patch
      cell as max(0, 1-|x-px|)*max(0, 1-|y-py|), which is zero exactly on
      the cells that are not true neighbours, reproducing the
      zero-padding/clip semantics of the reference kernel)

Times fwd and fwd+bwd per distinct flagship view shape, readback-fenced,
all variants interleaved in ONE process so tunnel drift cannot skew the
comparison. Run on the real TPU.
"""
import functools
import json
import os
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
REPS = 30


def v1_core(value, spatial_shapes, loc_all, att_all):
    """Round-2 core: per-level, per-neighbour gathers."""
    B, Len, H, D = value.shape
    N = loc_all.shape[1]
    P = loc_all.shape[4]
    level_sizes = [h * w for h, w in spatial_shapes]
    splits = list(np.cumsum(level_sizes)[:-1])
    level_values = jnp.split(value, splits, axis=1)
    out = jnp.zeros((B, N, H, D), dtype=value.dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        val = level_values[lvl].transpose(0, 2, 1, 3).reshape(B * H, h * w, D)
        loc = loc_all[:, :, :, lvl]
        att = att_all[:, :, :, lvl]
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        acc = jnp.zeros((B, N, H, P, D), dtype=value.dtype)
        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            xi = x0i + dx
            yi = y0i + dy
            wgt = (lx if dx else (1.0 - lx)) * (ly if dy else (1.0 - ly))
            inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            flat = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            flat = flat.transpose(0, 2, 1, 3).reshape(B * H, N * P)
            g = jnp.take_along_axis(val, flat[..., None], axis=1)
            g = g.reshape(B, H, N, P, D).transpose(0, 2, 1, 3, 4)
            acc = acc + g * (wgt * inside)[..., None]
        out = out + jnp.sum(acc * att[..., None], axis=3)
    return out.reshape(B, N, H * D)


def v3_core(value, spatial_shapes, loc_all, att_all):
    """Patch-gather core: one (2,2,D) slice per sample point."""
    B, Len, H, D = value.shape
    N = loc_all.shape[1]
    P = loc_all.shape[4]
    level_sizes = [h * w for h, w in spatial_shapes]
    splits = list(np.cumsum(level_sizes)[:-1])
    level_values = jnp.split(value, splits, axis=1)
    out = jnp.zeros((B, H, N, D), dtype=value.dtype)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),        # the (2, 2, D) slice dims (unbatched
        collapsed_slice_dims=(),      # view inside the vmap)
        start_index_map=(0, 1),
    )
    for lvl, (h, w) in enumerate(spatial_shapes):
        val = level_values[lvl].transpose(0, 2, 1, 3).reshape(B * H, h, w, D)
        loc = loc_all[:, :, :, lvl]                   # (B, N, H, P, 2)
        att = att_all[:, :, :, lvl]                   # (B, N, H, P)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        # Patch start: clamp so the 2x2 window stays in the map. Both
        # true (in-bounds) bilinear neighbours always land inside the
        # window; window cells at distance >= 1 from (x, y) get weight 0.
        sx = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
        sy = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)
        starts = jnp.stack([sy, sx], axis=-1)         # (B, N, H, P, 2)
        starts = starts.transpose(0, 2, 1, 3, 4).reshape(B * H, N * P, 2)
        patch = jax.vmap(
            lambda v, s: jax.lax.gather(
                v, s, dnums, slice_sizes=(2, 2, D),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        )(val, starts)                                # (BH, NP, 2, 2, D)
        patch = patch.reshape(B, H, N, P, 2, 2, D)
        # Per-cell bilinear weight, zero off the true neighbours and on
        # out-of-map coordinates (matches the reference's zero padding).
        xt = x.transpose(0, 2, 1, 3)                  # (B, H, N, P)
        yt = y.transpose(0, 2, 1, 3)
        sxt = sx.transpose(0, 2, 1, 3).astype(value.dtype)
        syt = sy.transpose(0, 2, 1, 3).astype(value.dtype)
        cell = jnp.arange(2, dtype=value.dtype)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(
            xt[..., None] - (sxt[..., None] + cell)))  # (B,H,N,P,2)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(
            yt[..., None] - (syt[..., None] + cell)))
        wcell = wy[..., :, None] * wx[..., None, :]    # (B,H,N,P,2,2)
        att_t = att.transpose(0, 2, 1, 3)              # (B,H,N,P)
        sampled = jnp.sum(patch * wcell[..., None], axis=(4, 5))
        out = out + jnp.sum(sampled * att_t[..., None], axis=3)
    return out.transpose(0, 2, 1, 3).reshape(B, N, H * D)


def v4_core(value, spatial_shapes, loc_all, att_all):
    """Matmul core: bilinear sampling as separable relu-distance matmuls.

    Ay[s, i] = relu(1 - |y_s - i|) is EXACTLY the zero-padded bilinear
    row weight (out-of-map rows get 0; edge fractions match the
    align_corners=False convention), so per level
        sampled[s] = sum_j Ax[s, j] * (Ay @ V)[s, j, :]
    computes the same result as the gather core with NO gather in the
    forward and NO scatter in the backward (d_V = Ay^T @ ..., d_loc
    through the relu/abs — all MXU/VPU work). FLOP-wasteful but the MXU
    is ~1000x faster per useful element than the ~100M rows/s gather
    rate / ~10M rows/s scatter rate that bound the gather cores.
    """
    B, Len, H, D = value.shape
    N = loc_all.shape[1]
    P = loc_all.shape[4]
    level_sizes = [h * w for h, w in spatial_shapes]
    splits = list(np.cumsum(level_sizes)[:-1])
    level_values = jnp.split(value, splits, axis=1)
    out = jnp.zeros((B * H, N * P, D), dtype=value.dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        val = level_values[lvl].transpose(0, 2, 1, 3)      # (B, H, hw, D)
        val = val.reshape(B * H, h, w * D)
        loc = loc_all[:, :, :, lvl]                        # (B, N, H, P, 2)
        x = (loc[..., 0] * w - 0.5).transpose(0, 2, 1, 3).reshape(
            B * H, N * P)
        y = (loc[..., 1] * h - 0.5).transpose(0, 2, 1, 3).reshape(
            B * H, N * P)
        ay = jax.nn.relu(1.0 - jnp.abs(
            y[..., None] - jnp.arange(h, dtype=y.dtype)))   # (BH, NP, h)
        ax = jax.nn.relu(1.0 - jnp.abs(
            x[..., None] - jnp.arange(w, dtype=x.dtype)))   # (BH, NP, w)
        tmp = jnp.einsum("bsh,bhw->bsw", ay, val,
                         preferred_element_type=value.dtype)
        tmp = tmp.reshape(B * H, N * P, w, D)
        sampled = jnp.einsum("bswd,bsw->bsd", tmp, ax)
        out = out + sampled * att_all[:, :, :, lvl].transpose(
            0, 2, 1, 3).reshape(B * H, N * P, 1)
    out = out.reshape(B, H, N, P, D).sum(axis=3)           # (B, H, N, D)
    return out.transpose(0, 2, 1, 3).reshape(B, N, H * D)


from dpft_tpu.ops.deform_attn import _ms_deform_attn_xla as v2_core


def timeit(fn, *args, reps=REPS):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


SHAPES = [
    ([[512, 910], [128, 228], [64, 114], [32, 57], [16, 29]], 504688),
    ([[256, 107], [64, 27], [32, 14], [16, 7], [8, 4]], 29712),
    ([[37, 107], [10, 27], [5, 14], [3, 7], [2, 4]], 4328),
]
B, H, D, N, P = 4, 8, 2, int(os.environ.get("PROBE_N", "400")), 4
rng = np.random.default_rng(0)
# v2/v3 already measured (2026-08-19, N=220: v2 fwd+bwd 2.5x worse than
# v1, v3 backward catastrophic); PROBE_CORES selects what to time now.
all_cores = {"v1_20gather": v1_core, "v2_1gather": v2_core,
             "v3_patch": v3_core, "v4_matmul": v4_core}
sel = os.environ.get("PROBE_CORES", "v1_20gather,v4_matmul").split(",")
cores = {k: all_cores[k] for k in sel}

for ss_list, Len in SHAPES:
    ss = tuple(tuple(s) for s in ss_list)
    value = jnp.asarray(rng.normal(size=(B, Len, H, D)).astype(np.float32))
    loc = jnp.asarray(
        rng.uniform(0, 1, size=(B, N, H, len(ss), P, 2)).astype(np.float32))
    att = jnp.asarray(
        rng.uniform(size=(B, N, H, len(ss), P)).astype(np.float32))
    att = att / att.sum(axis=(-2, -1), keepdims=True)
    entry = {"Len": Len}

    outs = {}
    for name, core in cores.items():
        f = jax.jit(lambda v, l, a, c=core: c(v, ss, l, a))
        outs[name] = np.asarray(f(value, loc, att))
        entry[f"{name}_fwd_ms"] = timeit(f, value, loc, att)

        def loss(v, l, a, c=core):
            return jnp.sum(c(v, ss, l, a) ** 2)
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        entry[f"{name}_fwdbwd_ms"] = timeit(g, value, loc, att)

    ref = outs[next(iter(outs))]
    for name, o in outs.items():
        entry[f"{name}_maxerr"] = float(np.abs(o - ref).max())
    print(json.dumps(entry), flush=True)
