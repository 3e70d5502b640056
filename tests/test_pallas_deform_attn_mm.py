"""Fused Pallas matmul-MSDA kernel parity (interpret mode on CPU).

Pins ops/pallas/deform_attn_mm.py (forward AND the custom fused backward)
against the naive reference and against the XLA matmul realization's
autodiff gradients — same tolerances as the XLA core's own suite.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dpft_tpu.ops.deform_attn as da
from dpft_tpu.ops.deform_attn import (ms_deform_attn_core,
                                      ms_deform_attn_core_naive,
                                      set_msda_backend)
from dpft_tpu.ops.pallas.deform_attn_mm import sample_level_fused


@pytest.fixture
def fused_backend(monkeypatch):
    # Force the matmul branch for every level so the fused kernel runs.
    monkeypatch.setattr(da, "_MATMUL_MAX_HW", 10 ** 9)
    set_msda_backend("pallas_mm")
    yield
    set_msda_backend("xla")


def _random_inputs(rng, B=2, N=5, H=2, D=3, P=4,
                   shapes=((8, 6), (4, 3), (2, 2))):
    L = len(shapes)
    Len = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, Len, H, D)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, size=(B, N, H, L, P, 2)).astype(np.float32)
    att = rng.uniform(size=(B, N, H, L, P)).astype(np.float32)
    att = att / att.sum(axis=(3, 4), keepdims=True)
    return value, shapes, locs, att


def test_fused_core_matches_naive(rng, fused_backend):
    value, shapes, locs, att = _random_inputs(rng)
    got = ms_deform_attn_core(jnp.array(value), shapes, jnp.array(locs),
                              jnp.array(att))
    want = ms_deform_attn_core_naive(value, shapes, locs, att)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_core_jit(rng, fused_backend):
    value, shapes, locs, att = _random_inputs(rng, shapes=((16, 16),))
    fn = jax.jit(lambda v, l, a: ms_deform_attn_core(v, shapes, l, a))
    got = fn(jnp.array(value), jnp.array(locs), jnp.array(att))
    want = ms_deform_attn_core_naive(value, shapes, locs, att)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_gradients_match_xla(rng, fused_backend):
    """The custom fused backward == XLA autodiff of the same math."""
    value, shapes, locs, att = _random_inputs(rng, B=1, N=3)

    def loss(v, l, a):
        return jnp.sum(ms_deform_attn_core(v, shapes, l, a) ** 2)

    g_fused = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.array(value), jnp.array(locs), jnp.array(att))
    set_msda_backend("xla")
    g_xla = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.array(value), jnp.array(locs), jnp.array(att))
    set_msda_backend("pallas_mm")
    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_level_op_padding_and_tiles(rng):
    """Direct op test: S not a multiple of the tile, coords out of map."""
    BH, h, w, D, S = 3, 7, 5, 4, 150  # S pads to 256 = 2 tiles
    val = rng.normal(size=(BH, h, w * D)).astype(np.float32)
    x = rng.uniform(-2, w + 2, size=(BH, S)).astype(np.float32)
    y = rng.uniform(-2, h + 2, size=(BH, S)).astype(np.float32)
    att = rng.uniform(size=(BH, S)).astype(np.float32)

    got = sample_level_fused(jnp.array(val), jnp.array(x), jnp.array(y),
                             jnp.array(att), h, w)
    want = da._sample_level_matmul(jnp.array(val), h, w, jnp.array(x),
                                   jnp.array(y)) * att[..., None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss_fused(v, xx, yy, aa):
        return jnp.sum(sample_level_fused(v, xx, yy, aa, h, w) ** 2)

    def loss_xla(v, xx, yy, aa):
        s = da._sample_level_matmul(v, h, w, xx, yy) * aa[..., None]
        return jnp.sum(s ** 2)

    args = (jnp.array(val), jnp.array(x), jnp.array(y), jnp.array(att))
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_f, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
