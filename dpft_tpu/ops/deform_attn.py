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
    B, Len, H, D = value.shape
    N = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]
    assert sum(h * w for h, w in spatial_shapes) == Len, (spatial_shapes, Len)
    assert sampling_locations.shape[3] == L

    # Formulation choice (single-process interleaved A/B on the v5e,
    # readback-fenced, scripts/probe_msda_ab.py, 2026-08-19): XLA executes
    # gathers at a ~fixed per-ROW rate (~100M (1,1,D)-slice rows/s,
    # independent of operand size — scripts/probe_gather.py), so all
    # formulations with the same 563k rows/call tie in the forward
    # (v1 per-level-per-neighbour 6.0/4.2/4.6 ms, v2 one consolidated
    # gather 8.6/6.2/5.6 ms per call at Len 504688/29712/4328). The
    # BACKWARD separates them: autodiff of 20 small gathers emits 20
    # small scatter-adds (fwd+bwd 25.0/12.8/10.8 ms) which XLA lowers
    # 2.5x better than the single big scatter of the consolidated form
    # (62.6/30.1/16.0 ms); a (2,2,D)-patch-slice gather (4x fewer rows)
    # is fastest forward on small maps but its patch-scatter backward is
    # catastrophic (560-700 ms). Mosaic cannot lower any of these
    # (gather support = full-lane-width take_along_axis only; see
    # ops/pallas/deform_attn.py), so this per-level/per-neighbour XLA
    # core is the measured winner for training.

    # Split the flattened value into per-level maps at trace time.
    level_sizes = [h * w for h, w in spatial_shapes]
    splits = []
    acc = 0
    for s in level_sizes[:-1]:
        acc += s
        splits.append(acc)
    level_values = jnp.split(value, splits, axis=1)

    out = jnp.zeros((B, N, H, D), dtype=value.dtype)

    for lvl, (h, w) in enumerate(spatial_shapes):
        val = level_values[lvl]  # (B, h*w, H, D)
        # Heads to the batch axis for a single big gather: (B*H, h*w, D)
        val = val.transpose(0, 2, 1, 3).reshape(B * H, h * w, D)

        loc = sampling_locations[:, :, :, lvl]      # (B, N, H, P, 2)
        att = attention_weights[:, :, :, lvl]       # (B, N, H, P)

        x = loc[..., 0] * w - 0.5                   # (B, N, H, P)
        y = loc[..., 1] * h - 0.5

        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0                                  # bilinear weights
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
            # (B, N, H, P) -> (B*H, N*P)
            flat = flat.transpose(0, 2, 1, 3).reshape(B * H, N * P)
            gathered = jnp.take_along_axis(val, flat[..., None], axis=1)
            gathered = gathered.reshape(B, H, N, P, D).transpose(0, 2, 1, 3, 4)
            acc = acc + gathered * (wgt * inside)[..., None]

        out = out + jnp.sum(acc * att[..., None], axis=3)  # reduce points

    return out.reshape(B, N, H * D)


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
