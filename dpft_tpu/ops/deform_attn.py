"""Multi-scale deformable attention sampling core, TPU-native.

Replaces the reference's external CUDA kernel (MultiScaleDeformableAttention,
built in reference Dockerfile:32-39, used via
src/dprt/models/layers/ms_deform_attn.py:27-68). Semantics follow the
Deformable-DETR im2col kernel: for every (query, head, level, point) the
value map of that level is bilinearly sampled at a normalized location, with
zero padding outside the map, then the samples are combined with softmaxed
attention weights.

Sampling convention (parity with the CUDA kernel): a normalized location
``loc`` in [0, 1] maps to continuous pixel coordinates ``loc * size - 0.5``
(align_corners=False). Neighbours that fall outside the map contribute zero.

The implementation is pure XLA: 4 batched gathers per level with
``take_along_axis`` over the flattened spatial axis. Spatial shapes are
static (Python ints), so the per-level loop unrolls at trace time — there is
no dynamic shape anywhere. XLA autodiff provides the backward pass
(gather -> scatter-add), matching the reference backward semantics
(ms_deform_attn.py:49-68). A fused Pallas kernel can be swapped in behind
the same signature.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# Sampling-core backend: 'xla' (gather core below) or 'pallas' (fused
# kernel, ops/pallas/deform_attn.py). The core is parameter-free, so the
# switch cannot affect checkpoints; it is read at TRACE time, selected by
# the model builder from config `fuser.pallas_msda` (models/fusers/
# mpfusion.py:build_mpfusion) and benchmarked head-to-head by
# scripts/bench_msda.py.
_BACKEND = "xla"


def set_msda_backend(name: str) -> None:
    global _BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"Unknown MSDA backend: {name!r}")
    _BACKEND = name


def get_msda_backend() -> str:
    return _BACKEND


def ms_deform_attn_core(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Deformable attention sampling.

    Arguments:
        value: (B, Len, H, D) flattened multi-level value maps, where
            Len = sum(h * w for h, w in spatial_shapes), heads H, head dim D.
        spatial_shapes: static list of (h, w) per level, ordered as in value.
        sampling_locations: (B, N, H, L, P, 2) normalized (x, y) in [0, 1].
        attention_weights: (B, N, H, L, P), softmaxed over (L, P).

    Returns:
        (B, N, H * D) attended features.
    """
    if _BACKEND == "pallas":
        from dpft_tpu.ops.pallas.deform_attn import ms_deform_attn_pallas
        # Interpreter mode on CPU (tests / virtual meshes); compiled
        # Mosaic kernel on TPU.
        return ms_deform_attn_pallas(value, tuple(spatial_shapes),
                                     sampling_locations, attention_weights,
                                     jax.default_backend() == "cpu")
    return _ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                               attention_weights)


def _ms_deform_attn_xla(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """The pure-XLA gather realization (backend-dispatch-free: the Pallas
    kernel's custom VJP differentiates THIS function for its backward, so
    it must never route back through ms_deform_attn_core)."""
    import numpy as np

    B, Len, H, D = value.shape
    N = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]
    assert sum(h * w for h, w in spatial_shapes) == Len, (spatial_shapes, Len)
    assert sampling_locations.shape[3] == L

    # ONE gather for all levels x bilinear neighbours. The earlier
    # per-level/per-neighbour structure issued 20 take_along_axis ops per
    # call; measured readback-fenced on the v5e (scripts/bench_msda.py,
    # 2026-08-19) their cost was ~independent of the value size
    # (9.3 / 6.4 / 7.7 ms per call for Len 504688 / 29712 / 4328) — i.e.
    # gather-op-count-bound, 12 calls adding up to 93.6 ms of the 113 ms
    # flagship forward and 336 ms of the 637 ms train step. Consolidating
    # into a single gather (and, through autodiff, a single scatter-add in
    # the backward) removes that multiplier. Indices are offset by each
    # level's start into the flattened spatial axis; out-of-map neighbours
    # clip inside their own level and are zero-weighted, exactly as before.
    h_arr = np.array([h for h, _ in spatial_shapes], np.float32)
    w_arr = np.array([w for _, w in spatial_shapes], np.float32)
    starts = np.cumsum([0] + [h * w for h, w in spatial_shapes])[:-1]
    lvl_start = jnp.asarray(starts, jnp.int32)        # (L,)
    wi = jnp.asarray(w_arr.astype(np.int32))
    hi = jnp.asarray(h_arr.astype(np.int32))

    # Continuous pixel coords per level: (B, N, H, L, P).
    x = sampling_locations[..., 0] * w_arr[None, None, None, :, None] - 0.5
    y = sampling_locations[..., 1] * h_arr[None, None, None, :, None] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0                                       # bilinear weights
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    idx_k = []
    wgt_k = []
    shape5 = (1, 1, 1, L, 1)
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        xi = x0i + dx
        yi = y0i + dy
        wgt = (lx if dx else (1.0 - lx)) * (ly if dy else (1.0 - ly))
        inside = ((xi >= 0) & (xi < wi.reshape(shape5))
                  & (yi >= 0) & (yi < hi.reshape(shape5)))
        flat = (lvl_start.reshape(shape5)
                + jnp.clip(yi, 0, hi.reshape(shape5) - 1)
                * wi.reshape(shape5)
                + jnp.clip(xi, 0, wi.reshape(shape5) - 1))
        idx_k.append(flat)
        wgt_k.append(wgt * inside)
    idx = jnp.stack(idx_k, axis=-1)                   # (B, N, H, L, P, 4)
    wgt = jnp.stack(wgt_k, axis=-1)                   # (B, N, H, L, P, 4)

    # Heads to the batch axis, one big gather: (B*H, Len, D).
    val = value.transpose(0, 2, 1, 3).reshape(B * H, Len, D)
    idx_t = idx.transpose(0, 2, 1, 3, 4, 5).reshape(B * H, N * L * P * 4)
    g = jnp.take_along_axis(val, idx_t[..., None], axis=1)
    g = g.reshape(B, H, N, L, P, 4, D)

    wgt_t = wgt.transpose(0, 2, 1, 3, 4, 5)           # (B, H, N, L, P, 4)
    att_t = attention_weights.transpose(0, 2, 1, 3, 4)  # (B, H, N, L, P)
    # Same reduction order as the reference kernel: bilinear-combine the 4
    # neighbours, weight by attention, then reduce points and levels.
    acc = jnp.sum(g * wgt_t[..., None], axis=5)       # (B, H, N, L, P, D)
    out = jnp.sum(acc * att_t[..., None], axis=(3, 4))  # (B, H, N, D)
    return out.transpose(0, 2, 1, 3).reshape(B, N, H * D)


def ms_deform_attn_core_naive(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Slow per-element reference implementation for testing."""
    import numpy as np

    value = np.asarray(value)
    locs = np.asarray(sampling_locations)
    att = np.asarray(attention_weights)
    B, Len, H, D = value.shape
    N = locs.shape[1]
    P = locs.shape[4]

    starts = np.cumsum([0] + [h * w for h, w in spatial_shapes])[:-1]
    out = np.zeros((B, N, H, D), np.float64)
    for b in range(B):
        for n in range(N):
            for hd in range(H):
                for lvl, (h, w) in enumerate(spatial_shapes):
                    vmap = value[b, starts[lvl]:starts[lvl] + h * w, hd]
                    vmap = vmap.reshape(h, w, D)
                    for p in range(P):
                        x = locs[b, n, hd, lvl, p, 0] * w - 0.5
                        y = locs[b, n, hd, lvl, p, 1] * h - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        lx, ly = x - x0, y - y0
                        s = np.zeros(D)
                        for dy, dx, wt in ((0, 0, (1 - lx) * (1 - ly)),
                                           (0, 1, lx * (1 - ly)),
                                           (1, 0, (1 - lx) * ly),
                                           (1, 1, lx * ly)):
                            yy, xx = y0 + dy, x0 + dx
                            if 0 <= yy < h and 0 <= xx < w:
                                s += wt * vmap[yy, xx]
                        out[b, n, hd] += att[b, n, hd, lvl, p] * s
    return jnp.asarray(out.reshape(B, N, H * D), dtype=jnp.float32)
