"""Fused Pallas kernel for the MATMUL realization of MSDA sampling.

Round 3 discovered that zero-padded bilinear sampling factorizes into
separable relu-distance matmuls (ops/deform_attn.py:_sample_level_matmul):

    sampled[s, d] = sum_h Ay[s, h] * (sum_w val[h, w, d] * Ax[s, w])
    Ay[s, i] = relu(1 - |y_s - i|),  Ax[s, j] = relu(1 - |x_s - j|)

with NO gathers in the forward and NO scatters in the backward — i.e. the
round-2 Mosaic blocker (gather support = full-lane take_along_axis only,
tpu.dynamic_gather crashes the axon remote compiler; see
ops/pallas/deform_attn.py) does not apply to this form. What the XLA
realization still pays is HBM: the (BH, S, w*D) `tmp` intermediate of the
first einsum round-trips HBM once per level (e.g. 46.7 MB per (batch*head)
row at the camera's 128x228 level), plus ~10 executed ops per level — which
the tunneled runtime charges 40-120 us apiece (CLAUDE.md).

This kernel fuses, per level, entirely in VMEM:
    Ay/Ax construction -> tmp = Ay @ val (MXU) -> the Ax contraction ->
    the attention-weight multiply,
reading only val/x/y/att from HBM and writing only the (BH, S, D)
att-weighted samples. The w-contraction sum_w prod[s, w*D+d] is expressed
as a second MXU matmul against a static one-hot matrix M[w*D+d, d'] =
1{d == d'} (built from iotas in VMEM) — dense FLOPs instead of a
strided-lane reduction, which would be a Mosaic relayout. A custom VJP
provides a fused backward kernel over the same math: d_val accumulates via
output revisiting across the S-tile grid axis (Ay^T @ d_tmp — a matmul,
not a scatter), and d_x/d_y/d_att are pure VPU reductions.

Parity surface: identical semantics to _sample_level_matmul * att
(reference CUDA kernel semantics, ms_deform_attn.py:24-68), pinned by
tests/test_pallas_deform_attn_mm.py against ms_deform_attn_core_naive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _pick_s_tile(S: int) -> int:
    """Largest tile <= 256 that divides S (no pad ops needed), else 128
    with padding. Sublane counts must be multiples of 8. The flagship
    S = n_queries * n_points = 1600 picks 160."""
    for t in (256, 160, 128, 64, 32, 16, 8):
        if S % t == 0:
            return t
    return 128


def _one_hot_m(wD: int, D: int, dtype) -> jnp.ndarray:
    """M[k, d] = 1{k % D == d}, built from 2D iotas (TPU needs >= 2D)."""
    k = jax.lax.broadcasted_iota(jnp.int32, (wD, D), 0)
    d = jax.lax.broadcasted_iota(jnp.int32, (wD, D), 1)
    return (k % D == d).astype(dtype)


def _one_hot_mt(wD: int, D: int, dtype) -> jnp.ndarray:
    """M^T[d, k] = 1{k % D == d}, built directly (a .T would relayout)."""
    d = jax.lax.broadcasted_iota(jnp.int32, (D, wD), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (D, wD), 1)
    return (k % D == d).astype(dtype)


def _relu_dist(coord: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """relu(1 - |coord - grid|): the zero-padded bilinear weight row."""
    return jnp.maximum(1.0 - jnp.abs(coord - grid), 0.0)


def _fwd_kernel(val_ref, x_ref, y_ref, att_ref, out_ref, *, h, w, D, st):
    val = val_ref[0]                     # (h, w*D)
    x = x_ref[0]                         # (S_TILE, 1)
    y = y_ref[0]
    att = att_ref[0]
    wD = w * D
    f32 = jnp.float32

    # NB: iota must be integer-typed — Mosaic's tpu.iota rejects float
    # results ('result #0 must be vec<int>', measured on the v5e).
    grid_h = jax.lax.broadcasted_iota(jnp.int32, (st, h), 1).astype(f32)
    ay = _relu_dist(y.astype(f32), grid_h)                  # (S, h)
    tmp = jnp.dot(ay.astype(val.dtype), val,
                  preferred_element_type=f32)               # (S, wD)

    # Ax expanded straight to the w*D lane layout: column k of tmp holds
    # (w = k // D, d = k % D), so the matching bilinear weight is
    # relu(1 - |x - k // D|) — no element-repeat relayout needed.
    kdiv = (jax.lax.broadcasted_iota(jnp.int32, (st, wD), 1)
            // D).astype(f32)
    axk = _relu_dist(x.astype(f32), kdiv)                   # (S, wD)

    m = _one_hot_m(wD, D, val.dtype)
    out = jnp.dot((tmp * axk).astype(val.dtype), m,
                  preferred_element_type=f32)               # (S, D)
    out_ref[0] = (out * att.astype(f32)).astype(out_ref.dtype)


def _bwd_kernel(val_ref, x_ref, y_ref, att_ref, g_ref,
                dval_ref, dx_ref, dy_ref, datt_ref, *, h, w, D, st):
    val = val_ref[0]                     # (h, wD)
    x = x_ref[0].astype(jnp.float32)     # (S, 1)
    y = y_ref[0].astype(jnp.float32)
    att = att_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)     # (S, D)
    wD = w * D
    f32 = jnp.float32

    grid_h = jax.lax.broadcasted_iota(jnp.int32, (st, h), 1).astype(f32)
    dist_y = y - grid_h
    ay = jnp.maximum(1.0 - jnp.abs(dist_y), 0.0)            # (S, h)
    tmp = jnp.dot(ay.astype(val.dtype), val,
                  preferred_element_type=f32)               # (S, wD)

    kdiv = (jax.lax.broadcasted_iota(jnp.int32, (st, wD), 1)
            // D).astype(f32)
    dist_x = x - kdiv
    axk = jnp.maximum(1.0 - jnp.abs(dist_x), 0.0)           # (S, wD)

    # ge0[s, k] = g[s, k % D] (gradient expanded over w); one small dot.
    mt = _one_hot_mt(wD, D, f32)                            # (D, wD)
    ge0 = jnp.dot(g, mt, preferred_element_type=f32)        # (S, wD)

    # d_att[s] = sum_d g[s,d] * pre[s,d] = sum_k (tmp*axk)[s,k] * ge0[s,k]
    datt_ref[0] = jnp.sum(tmp * axk * ge0, axis=1,
                          keepdims=True).astype(datt_ref.dtype)

    g_expand = ge0 * att                                    # (S, wD)
    d_tmp = g_expand * axk                                  # (S, wD)

    # d_val = Ay^T @ d_tmp, accumulated across the S-tile grid axis via
    # output revisiting (the (b, 0, 0) block stays in VMEM while s
    # advances for fixed b).
    contrib = jax.lax.dot_general(
        ay.astype(val.dtype), d_tmp.astype(val.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)                         # (h, wD)
    s_idx = pl.program_id(1)

    @pl.when(s_idx == 0)
    def _():
        dval_ref[0] = contrib.astype(dval_ref.dtype)

    @pl.when(s_idx != 0)
    def _():
        dval_ref[0] = (dval_ref[0].astype(f32) + contrib).astype(
            dval_ref.dtype)

    # d_ay = d_tmp @ val^T ; d_y = sum_h d_ay * d(ay)/dy.
    d_ay = jax.lax.dot_general(
        d_tmp.astype(val.dtype), val,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                         # (S, h)
    day_dy = jnp.where(ay > 0.0, -jnp.sign(dist_y), 0.0)
    dy_ref[0] = jnp.sum(d_ay * day_dy, axis=1,
                        keepdims=True).astype(dy_ref.dtype)

    # d_axk = tmp * g_expand ; d_x = sum_k d_axk * d(ax)/dx — pure VPU,
    # no (wD, w) one-hot dot needed.
    dax_dx = jnp.where(axk > 0.0, -jnp.sign(dist_x), 0.0)
    dx_ref[0] = jnp.sum(tmp * g_expand * dax_dx, axis=1,
                        keepdims=True).astype(dx_ref.dtype)


def _pad_s(a, s_pad, fill):
    pad = s_pad - a.shape[1]
    if pad == 0:
        return a
    cfg = [(0, 0), (0, pad)] + [(0, 0)] * (a.ndim - 2)
    return jnp.pad(a, cfg, constant_values=fill)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sample_level_fused(val, x, y, att, h, w):
    """Att-weighted zero-padded bilinear samples of one level, fused.

    val: (BH, h, w*D); x, y: (BH, S) continuous pixel coords; att: (BH, S).
    Returns (BH, S, D) = bilinear_sample(val, x, y) * att[..., None].
    """
    return _forward(val, x, y, att, h, w)


def _forward(val, x, y, att, h, w):
    BH, S = x.shape
    D = val.shape[-1] // w
    st = _pick_s_tile(S)
    s_pad = pl.cdiv(S, st) * st
    # Pad coords OUT OF THE MAP (weights exactly zero) so padded rows
    # contribute nothing and receive nothing.
    xp = _pad_s(x, s_pad, -2.0)[..., None]
    yp = _pad_s(y, s_pad, -2.0)[..., None]
    ap = _pad_s(att, s_pad, 0.0)[..., None]

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, D=D, st=st),
        grid=(BH, s_pad // st),
        in_specs=[
            pl.BlockSpec((1, h, w * D), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, st, 1), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, st, 1), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, st, 1), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, st, D), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, s_pad, D), val.dtype),
        interpret=jax.default_backend() == "cpu",
    )(val, xp, yp, ap)
    return out[:, :S]


def _fwd_rule(val, x, y, att, h, w):
    return _forward(val, x, y, att, h, w), (val, x, y, att)


def _bwd_rule(h, w, res, g):
    val, x, y, att = res
    BH, S = x.shape
    D = val.shape[-1] // w
    st = _pick_s_tile(S)
    s_pad = pl.cdiv(S, st) * st
    xp = _pad_s(x, s_pad, -2.0)[..., None]
    yp = _pad_s(y, s_pad, -2.0)[..., None]
    ap = _pad_s(att, s_pad, 0.0)[..., None]
    gp = _pad_s(g, s_pad, 0.0)

    dval, dx, dy, datt = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w, D=D, st=st),
        grid=(BH, s_pad // st),
        in_specs=[
            pl.BlockSpec((1, h, w * D), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, st, 1), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, st, 1), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, st, 1), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, st, D), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w * D), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, st, 1), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, st, 1), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, st, 1), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(val.shape, val.dtype),
            jax.ShapeDtypeStruct((BH, s_pad, 1), x.dtype),
            jax.ShapeDtypeStruct((BH, s_pad, 1), y.dtype),
            jax.ShapeDtypeStruct((BH, s_pad, 1), att.dtype),
        ],
        interpret=jax.default_backend() == "cpu",
    )(val, xp, yp, ap, gp)
    return (dval, dx[:, :S, 0], dy[:, :S, 0], datt[:, :S, 0])


sample_level_fused.defvjp(_fwd_rule, _bwd_rule)
