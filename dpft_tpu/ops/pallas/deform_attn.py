"""Fused Pallas kernel for multi-scale deformable attention sampling.

Drop-in behind the `ms_deform_attn_core` signature (ops/deform_attn.py),
replacing the reference's external CUDA kernel (reference
src/dprt/models/layers/ms_deform_attn.py:27-68, built in Dockerfile:32-39).

STATUS (measured 2026-08-19, jax 0.9.0 Mosaic on the v5e): this kernel
does NOT lower on the real TPU toolchain — Mosaic's `lax.gather` support
is limited to full-lane-width `take_along_axis` (indices shaped like the
input; mosaic/lowering.py:_gather_lowering_rule), which rejects the
kernel's (D, Len) x (N*P) lane gathers ("Shape mismatch in input, indices
and output"), and reformulating to the supported full-width
`tpu.dynamic_gather` both crashes the axon remote compiler (HTTP 500) and
is 480 ms/call when XLA emits it outside Pallas (scripts/probe_gather.py:
d/e variants). The kernel therefore runs only in interpreter mode (CPU
tests pin numerical parity) and `fuser.pallas_msda` must stay off on TPU;
the production core is the pure-XLA per-level/per-neighbour gather form,
chosen by a single-process A/B at train shapes (ops/deform_attn.py,
scripts/probe_msda_ab.py: fwd+bwd 25.0/12.8/10.8 ms per call vs 2.5-60x
worse alternatives).

Design as written (kept as the record of the attempted TPU-first shape):
 - Grid over (batch, head): each program owns one (b, h) slice. The value
   map is staged HBM->VMEM once per program as a (D, Len) block with the
   flattened spatial axis on LANES, so the 2x2-neighbourhood reads become
   four lane-axis gathers (`jnp.take` along axis 1); at flagship shapes
   the largest view's slice is ~4 MB (camera, Len~5e5 x D=2 f32), well
   inside VMEM.
 - Everything downstream of the gathers (bilinear weights, zero padding
   outside the map, the softmaxed attention-weight reduction over points
   and levels) is fused into the same kernel pass, so the sampled
   neighbourhood never round-trips HBM. The pure-XLA core materializes the
   (B, N, H, P, D) gather products per level; here they live in registers.
 - Levels unroll at trace time (static `spatial_shapes`), keeping the
   whole kernel a straight-line vector program.

The backward is a custom VJP that reuses XLA autodiff of the pure-XLA core
(gather -> scatter-add chain, the same math as the reference backward,
ms_deform_attn.py:49-68): sampling is memory-bound, so the backward's cost
is dominated by the d_value scatter-add, which XLA already emits well; the
recompute of the forward gathers inside the VJP is the standard remat
trade. Numerical parity fwd+bwd vs the XLA core is pinned in
tests/test_pallas_deform_attn.py.

scripts/bench_msda.py records the lowering failure per shape when run on
the chip; STATUS.md §2.8 carries the decision.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _msda_kernel(val_ref, loc_ref, att_ref, out_ref, *,
                 spatial_shapes: Tuple[Tuple[int, int], ...]):
    """One (batch, head) slice: out[n, d] = sum_{l,p} a * bilinear(V_l, loc).

    val_ref: (1, 1, D, Len) value slice, spatial axis on lanes.
    loc_ref: (1, 1, N, L, P, 2) normalized sampling locations.
    att_ref: (1, 1, N, L, P) softmaxed attention weights.
    out_ref: (1, 1, N, D).
    """
    val = val_ref[0, 0]                      # (D, Len)
    att = att_ref[0, 0]                      # (N, L, P)
    D = val.shape[0]
    N, L, P = att.shape

    acc = jnp.zeros((D, N), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        x = loc_ref[0, 0, :, lvl, :, 0] * w - 0.5     # (N, P) continuous px
        y = loc_ref[0, 0, :, lvl, :, 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = (x - x0).astype(jnp.float32)
        ly = (y - y0).astype(jnp.float32)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        a = att[:, lvl, :].astype(jnp.float32)        # (N, P)

        sampled = jnp.zeros((D, N * P), jnp.float32)
        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            xi = x0i + dx
            yi = y0i + dy
            wgt = (lx if dx else (1.0 - lx)) * (ly if dy else (1.0 - ly))
            inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            flat = (start + jnp.clip(yi, 0, h - 1) * w
                    + jnp.clip(xi, 0, w - 1)).reshape(N * P)
            # Lane-axis gather: (D, Len) rows indexed at N*P positions.
            g = jnp.take(val, flat, axis=1).astype(jnp.float32)
            sampled = sampled + g * jnp.where(
                inside, wgt, 0.0).reshape(N * P)[None, :]

        # Attention-weighted reduction over the P points of this level.
        acc = acc + jnp.sum(
            sampled.reshape(D, N, P) * a[None, :, :], axis=2)
        start += h * w

    out_ref[0, 0] = acc.T.astype(out_ref.dtype)      # (N, D)


def _msda_pallas_raw(value: jnp.ndarray,
                     spatial_shapes: Tuple[Tuple[int, int], ...],
                     sampling_locations: jnp.ndarray,
                     attention_weights: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Forward-only pallas_call (no custom VJP); see ms_deform_attn_pallas."""
    B, Len, H, D = value.shape
    N = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]
    assert sum(h * w for h, w in spatial_shapes) == Len

    # Head to the grid, spatial axis to lanes. XLA fuses these transposes
    # with the producing matmul / consuming reshape where possible.
    val_t = jnp.transpose(value, (0, 2, 3, 1))                # (B, H, D, Len)
    loc_t = jnp.transpose(sampling_locations, (0, 2, 1, 3, 4, 5))
    att_t = jnp.transpose(attention_weights, (0, 2, 1, 3, 4))  # (B,H,N,L,P)

    out = pl.pallas_call(
        functools.partial(_msda_kernel,
                          spatial_shapes=tuple(spatial_shapes)),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, D, Len), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, L, P, 2),
                         lambda b, h: (b, h, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, L, P), lambda b, h: (b, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), value.dtype),
        interpret=interpret,
    )(val_t, loc_t, att_t)

    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights, interpret=False):
    """Fused-Pallas deformable attention sampling (same contract as
    ops.deform_attn.ms_deform_attn_core).

    Arguments:
        value: (B, Len, H, D) flattened multi-level value maps.
        spatial_shapes: static tuple of (h, w) per level.
        sampling_locations: (B, N, H, L, P, 2) normalized (x, y) in [0, 1].
        attention_weights: (B, N, H, L, P), softmaxed over (L, P).
        interpret: run the kernel in interpreter mode (CPU tests).

    Returns:
        (B, N, H * D) attended features.
    """
    return _msda_pallas_raw(value, tuple(spatial_shapes),
                            sampling_locations, attention_weights,
                            interpret=interpret)


def _msda_fwd(value, spatial_shapes, sampling_locations, attention_weights,
              interpret):
    out = _msda_pallas_raw(value, tuple(spatial_shapes),
                           sampling_locations, attention_weights,
                           interpret=interpret)
    return out, (value, sampling_locations, attention_weights)


def _msda_bwd(spatial_shapes, interpret, residuals, g):
    """Backward via XLA autodiff of the pure-XLA core (identical math:
    same gathers for d_loc/d_att, scatter-add for d_value). Imports the
    dispatch-free body — going through ms_deform_attn_core would re-enter
    this custom VJP when the backend is 'pallas' (infinite recursion)."""
    from dpft_tpu.ops.deform_attn import _ms_deform_attn_xla

    value, loc, att = residuals
    _, vjp = jax.vjp(
        lambda v, l, a: _ms_deform_attn_xla(v, tuple(spatial_shapes), l, a),
        value, loc, att)
    return vjp(g)


ms_deform_attn_pallas.defvjp(_msda_fwd, _msda_bwd)
