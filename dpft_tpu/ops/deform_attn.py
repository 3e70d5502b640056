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

The implementation is pure XLA and per-level HYBRID (measured decision,
see _ms_deform_attn_xla): huge levels sample via 4 neighbour gathers over
the flattened spatial axis, small levels via separable relu-distance
matmuls on the MXU (no gather in the forward, no scatter in the
backward). Spatial shapes are static (Python ints), so the per-level loop
unrolls at trace time — there is no dynamic shape anywhere. XLA autodiff
provides the backward pass, matching the reference backward semantics
(ms_deform_attn.py:49-68).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# Sampling-core backend:
#   'xla'       hybrid gather/matmul core below (production default)
#   'pallas_mm' same hybrid, but the matmul levels run the FUSED Pallas
#               kernel (ops/pallas/deform_attn_mm.py: Ay/Ax construction,
#               both einsums, and the attention multiply in VMEM, custom
#               fused backward) — Mosaic-lowerable because the matmul
#               form has no gathers. MEASURED AND REJECTED on the v5e
#               (scripts/probe_msda_fused.py, 2026-08-20): loses to the
#               XLA hybrid at every flagship view/dtype — fwd ~1.1-1.7x
#               slower, fwd+bwd 2-3x slower (e.g. camera bf16 13.8 vs
#               15.1 ms; radar views ~1.7-2.2 vs ~4-5.5 ms). XLA already
#               fuses the einsum chain well; the Pallas backward's d_val
#               output-revisiting accumulation serializes the S-tile
#               grid axis and recomputes ay/tmp/axk per tile. Forcing
#               the huge camera level through the kernel ('mmall')
#               crashes the remote compiler (tpu_compile_helper exit 1).
#               Kept behind this switch with parity tests; not prod.
#   'pallas'    the round-2 gather-based fused kernel (ops/pallas/
#               deform_attn.py); interpreter-only, rejected on real TPU
#               (Mosaic gather limits), kept for the record.
# The core is parameter-free, so the switch cannot affect checkpoints; it
# is read at TRACE time, selected by the model builder from config
# `fuser.pallas_msda` (models/fusers/mpfusion.py:build_mpfusion).
_BACKEND = "xla"


def set_msda_backend(name: str) -> None:
    global _BACKEND
    if name not in ("xla", "pallas", "pallas_mm"):
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
    return _ms_deform_attn_hybrid(value, spatial_shapes, sampling_locations,
                                  attention_weights,
                                  use_fused=_BACKEND == "pallas_mm")


def _ms_deform_attn_xla(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """The pure-XLA hybrid realization (backend-dispatch-free: the Pallas
    gather kernel's custom VJP differentiates THIS function for its
    backward, so it must never route back through ms_deform_attn_core)."""
    return _ms_deform_attn_hybrid(value, spatial_shapes,
                                  sampling_locations, attention_weights,
                                  use_fused=False)


def _ms_deform_attn_hybrid(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    use_fused: bool = False,
) -> jnp.ndarray:
    """Per-level hybrid core; use_fused routes the matmul levels to the
    fused Pallas kernel (identical math, VMEM-resident intermediates)."""
    B, Len, H, D = value.shape
    N = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]
    assert sum(h * w for h, w in spatial_shapes) == Len, (spatial_shapes, Len)
    assert sampling_locations.shape[3] == L

    # Formulation (single-process interleaved A/Bs on the v5e at flagship
    # N=400 train shapes, readback-fenced — scripts/probe_msda_ab.py,
    # probe_msda_hybrid.py, probe_gather.py, probe_gather_mode.py,
    # 2026-08-19). The hardware facts that drive it:
    #   * XLA TPU gathers run at a fixed per-ROW rate (~100M one-element
    #     rows/s, operand-size independent; mode/sortedness irrelevant),
    #     and the backward's scatter-adds at ~10M rows/s — so a gather
    #     realization costs ~2 ms fwd + ~8 ms bwd PER LEVEL regardless of
    #     the level's size.
    #   * The MXU is effectively free next to those rates: expressing
    #     zero-padded bilinear sampling as separable relu-distance
    #     matmuls, sampled = sum_j Ax[s,j] * (Ay @ V)[s,j,:] with
    #     Ay[s,i] = relu(1 - |y_s - i|), replaces every gather (forward)
    #     and every scatter (backward: d_V = Ay^T-matmul, d_loc through
    #     relu/abs) with dense MXU/VPU work of size NP x (h + w + w*D).
    # The matmul form therefore wins everywhere except levels so large
    # that its dense FLOPs/HBM exceed the fixed gather cost. Measured at
    # the camera view (levels 512x910 ... 16x29): pure-gather fwd+bwd
    # 42.8 ms, pure-matmul 27.0 ms, hybrid (gather for h+w > 600) 25.7 ms
    # f32 and 14.2 ms bf16, with the radar views (all levels small) at
    # 1.9-2.4 ms pure-matmul vs 20-23 ms pure-gather. Full train step:
    # ~342 ms MSDA -> ~120 ms f32. Mosaic cannot lower any fused-kernel
    # variant (gather = full-lane take_along_axis only; see
    # ops/pallas/deform_attn.py), so this hybrid XLA core is production.
    level_sizes = [h * w for h, w in spatial_shapes]
    splits = []
    acc = 0
    for s in level_sizes[:-1]:
        acc += s
        splits.append(acc)
    level_values = jnp.split(value, splits, axis=1)

    out = jnp.zeros((B * H, N * P, D), dtype=value.dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        val = level_values[lvl]                      # (B, h*w, H, D)
        val = val.transpose(0, 2, 1, 3)              # (B, H, h*w, D)
        loc = sampling_locations[:, :, :, lvl]       # (B, N, H, P, 2)
        att = attention_weights[:, :, :, lvl]        # (B, N, H, P)
        x = (loc[..., 0] * w - 0.5).transpose(0, 2, 1, 3).reshape(
            B * H, N * P)
        y = (loc[..., 1] * h - 0.5).transpose(0, 2, 1, 3).reshape(
            B * H, N * P)
        att_flat = att.transpose(0, 2, 1, 3).reshape(B * H, N * P)
        if h + w > _MATMUL_MAX_HW:
            sampled = _sample_level_gather(
                val.reshape(B * H, h * w, D), h, w, x, y)
            out = out + sampled * att_flat[..., None]
        elif use_fused:
            from dpft_tpu.ops.pallas.deform_attn_mm import \
                sample_level_fused
            out = out + sample_level_fused(
                val.reshape(B * H, h, w * D), x, y, att_flat, h, w)
        else:
            sampled = _sample_level_matmul(
                val.reshape(B * H, h, w * D), h, w, x, y)
            out = out + sampled * att_flat[..., None]

    out = out.reshape(B, H, N, P, D).sum(axis=3)     # reduce points
    return out.transpose(0, 2, 1, 3).reshape(B, N, H * D)


# Per-level realization cutoff: levels with h + w <= this use the matmul
# form, larger ones the gather form (measured crossover; see
# _ms_deform_attn_xla's formulation note — at the flagship shapes only
# the camera's 512x910 level exceeds it).
_MATMUL_MAX_HW = 600


def _sample_level_gather(val, h, w, x, y):
    """Zero-padded bilinear sampling via 4 neighbour gathers.

    val: (BH, h*w, D); x, y: (BH, S) continuous pixel coords.
    Returns (BH, S, D).
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    sampled = jnp.zeros(x.shape + (val.shape[-1],), dtype=val.dtype)
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        xi = x0i + dx
        yi = y0i + dy
        wgt = (lx if dx else (1.0 - lx)) * (ly if dy else (1.0 - ly))
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        flat = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        g = jnp.take_along_axis(val, flat[..., None], axis=1)
        # Coordinate math stays float32 (positions up to 910 would lose
        # their fractions in bf16); only the FINAL [0,1] corner weight is
        # cast to the compute dtype, else it silently promotes the whole
        # sample chain to f32 (2x the HBM bytes at the big camera level —
        # HLO census 2026-08-20; mixed-precision policy: matmuls/
        # attention in compute dtype, f32 where precision matters).
        sampled = sampled + g * (wgt * inside)[..., None].astype(val.dtype)
    return sampled


def _sample_level_matmul(val, h, w, x, y):
    """Zero-padded bilinear sampling as separable relu-distance matmuls.

    Ay[s, i] = relu(1 - |y_s - i|) is exactly the zero-padded bilinear
    row weight (out-of-map rows weight 0, align_corners=False edge
    fractions preserved), so no gather appears in the forward and no
    scatter in the backward. val: (BH, h, w*D); returns (BH, S, D).
    """
    D = val.shape[-1] // w
    # |y - i| must be computed in float32 (positions up to ~900 lose
    # their fractional part in bf16), but the resulting [0, 1] weights
    # are cast to the compute dtype: a float32 Ay would promote both
    # einsums to the f32 MXU path and double the (BH, S, w*D) tmp's HBM
    # bytes (23.3 -> 11.7 MB per camera-level call, HLO census
    # 2026-08-20). No-op in full-f32 mode.
    ay = jax.nn.relu(1.0 - jnp.abs(
        y[..., None] - jnp.arange(h, dtype=y.dtype))).astype(val.dtype)
    ax = jax.nn.relu(1.0 - jnp.abs(
        x[..., None] - jnp.arange(w, dtype=x.dtype))).astype(val.dtype)
    tmp = jnp.einsum("bsh,bhw->bsw", ay, val,
                     preferred_element_type=val.dtype)
    tmp = tmp.reshape(tmp.shape[0], tmp.shape[1], w, D)
    return jnp.einsum("bswd,bsw->bsd", tmp, ax)


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
