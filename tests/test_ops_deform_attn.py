"""Deformable attention core op tests (XLA impl vs naive reference).

The production core is per-level HYBRID (ops/deform_attn.py): levels with
h + w <= _MATMUL_MAX_HW use the relu-distance matmul realization, larger
ones 4-neighbour gathers. The parity tests parametrize the cutoff so the
gather-only, matmul-only, and mixed paths (and their boundary consistency)
are each pinned against the naive reference — the flagship camera level
(512x910) takes the gather branch in production, but no test shape is that
large, so without the parametrization the gather branch would be untested.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

import dpft_tpu.ops.deform_attn as da
from dpft_tpu.ops.deform_attn import (ms_deform_attn_core,
                                      ms_deform_attn_core_naive)

# Cutoffs exercising: gather-only (0), mixed (10: the (8, 6) level gathers,
# the small levels matmul), and matmul-only (inf).
CUTOFFS = (0, 10, 10 ** 9)


@pytest.fixture(params=CUTOFFS, ids=("gather", "hybrid", "matmul"))
def cutoff(request, monkeypatch):
    monkeypatch.setattr(da, "_MATMUL_MAX_HW", request.param)
    return request.param


def _random_inputs(rng, B=2, N=5, H=2, D=3, P=4,
                   shapes=((8, 6), (4, 3), (2, 2))):
    L = len(shapes)
    Len = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, Len, H, D)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, size=(B, N, H, L, P, 2)).astype(np.float32)
    att = rng.uniform(size=(B, N, H, L, P)).astype(np.float32)
    att = att / att.sum(axis=(3, 4), keepdims=True)
    return value, shapes, locs, att


def test_matches_naive(rng, cutoff):
    value, shapes, locs, att = _random_inputs(rng)
    got = ms_deform_attn_core(jnp.array(value), shapes, jnp.array(locs),
                              jnp.array(att))
    want = ms_deform_attn_core_naive(value, shapes, locs, att)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_branches_agree(rng):
    """Gather and matmul realizations agree on identical inputs."""
    value, shapes, locs, att = _random_inputs(rng)
    outs = {}
    for name, cut in (("gather", 0), ("matmul", 10 ** 9)):
        prev = da._MATMUL_MAX_HW
        da._MATMUL_MAX_HW = cut
        try:
            outs[name] = np.asarray(ms_deform_attn_core(
                jnp.array(value), shapes, jnp.array(locs), jnp.array(att)))
        finally:
            da._MATMUL_MAX_HW = prev
    np.testing.assert_allclose(outs["gather"], outs["matmul"], atol=1e-5)


def test_jit_and_single_level(rng, cutoff):
    value, shapes, locs, att = _random_inputs(rng, shapes=((16, 16),))
    fn = jax.jit(lambda v, l, a: ms_deform_attn_core(v, shapes, l, a))
    got = fn(jnp.array(value), jnp.array(locs), jnp.array(att))
    want = ms_deform_attn_core_naive(value, shapes, locs, att)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_out_of_bounds_zero_padding(rng, cutoff):
    # Locations far outside [0, 1] must contribute exactly zero.
    B, N, H, D, P = 1, 1, 1, 2, 1
    shapes = ((4, 4),)
    value = np.ones((B, 16, H, D), np.float32)
    locs = np.full((B, N, H, 1, P, 2), 5.0, np.float32)
    att = np.ones((B, N, H, 1, P), np.float32)
    out = ms_deform_attn_core(jnp.array(value), shapes, jnp.array(locs),
                              jnp.array(att))
    assert float(jnp.abs(out).max()) == 0.0


def test_gradients_flow(rng, cutoff):
    value, shapes, locs, att = _random_inputs(rng, B=1, N=3)

    def loss(v, l, a):
        return jnp.sum(ms_deform_attn_core(v, shapes, l, a) ** 2)

    g_v, g_l, g_a = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.array(value), jnp.array(locs), jnp.array(att))
    assert np.all(np.isfinite(np.asarray(g_v)))
    assert np.all(np.isfinite(np.asarray(g_l)))
    assert np.all(np.isfinite(np.asarray(g_a)))
    assert float(jnp.abs(g_v).sum()) > 0
    assert float(jnp.abs(g_a).sum()) > 0


def test_gradients_agree_across_branches(rng):
    """d_value/d_loc/d_att identical between gather and matmul backward."""
    value, shapes, locs, att = _random_inputs(rng, B=1, N=3)

    def grads(cut):
        prev = da._MATMUL_MAX_HW
        da._MATMUL_MAX_HW = cut
        try:
            def loss(v, l, a):
                return jnp.sum(ms_deform_attn_core(v, shapes, l, a) ** 2)
            return jax.grad(loss, argnums=(0, 1, 2))(
                jnp.array(value), jnp.array(locs), jnp.array(att))
        finally:
            da._MATMUL_MAX_HW = prev

    for a, b in zip(grads(0), grads(10 ** 9)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
