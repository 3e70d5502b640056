"""Deformable attention core op tests (XLA impl vs naive reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from dpft_tpu.ops.deform_attn import ms_deform_attn_core, ms_deform_attn_core_naive


def _random_inputs(rng, B=2, N=5, H=2, D=3, P=4,
                   shapes=((8, 6), (4, 3), (2, 2))):
    L = len(shapes)
    Len = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, Len, H, D)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, size=(B, N, H, L, P, 2)).astype(np.float32)
    att = rng.uniform(size=(B, N, H, L, P)).astype(np.float32)
    att = att / att.sum(axis=(3, 4), keepdims=True)
    return value, shapes, locs, att


def test_matches_naive(rng):
    value, shapes, locs, att = _random_inputs(rng)
    got = ms_deform_attn_core(jnp.array(value), shapes, jnp.array(locs),
                              jnp.array(att))
    want = ms_deform_attn_core_naive(value, shapes, locs, att)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_jit_and_single_level(rng):
    value, shapes, locs, att = _random_inputs(rng, shapes=((16, 16),))
    fn = jax.jit(lambda v, l, a: ms_deform_attn_core(v, shapes, l, a))
    got = fn(jnp.array(value), jnp.array(locs), jnp.array(att))
    want = ms_deform_attn_core_naive(value, shapes, locs, att)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_out_of_bounds_zero_padding(rng):
    # Locations far outside [0, 1] must contribute exactly zero.
    B, N, H, D, P = 1, 1, 1, 2, 1
    shapes = ((4, 4),)
    value = np.ones((B, 16, H, D), np.float32)
    locs = np.full((B, N, H, 1, P, 2), 5.0, np.float32)
    att = np.ones((B, N, H, 1, P), np.float32)
    out = ms_deform_attn_core(jnp.array(value), shapes, jnp.array(locs),
                              jnp.array(att))
    assert float(jnp.abs(out).max()) == 0.0


def test_gradients_flow(rng):
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
