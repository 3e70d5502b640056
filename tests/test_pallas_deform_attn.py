"""Parity: fused-Pallas MSDA sampling vs the pure-XLA core (fwd + grads).

The kernel (ops/pallas/deform_attn.py) runs in interpreter mode on the CPU
test platform; on-chip behavior is measured by scripts/bench_msda.py. The
XLA core itself is pinned against a per-element reference and torch
transliterations in test_ops_deform_attn.py / test_torch_parity.py, so
equality here chains the kernel to the reference CUDA semantics
(reference src/dprt/models/layers/ms_deform_attn.py:27-68).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpft_tpu.ops.deform_attn import ms_deform_attn_core
from dpft_tpu.ops.pallas.deform_attn import ms_deform_attn_pallas

pytestmark = pytest.mark.slow

SHAPES = ((6, 9), (3, 5), (2, 3))


def _random_inputs(rng, B=2, N=7, H=4, D=3, P=4, shapes=SHAPES):
    L = len(shapes)
    Len = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, Len, H, D)).astype(np.float32)
    # Locations straddle the border so the zero-padding branch is hit.
    loc = rng.uniform(-0.2, 1.2, size=(B, N, H, L, P, 2)).astype(np.float32)
    att = rng.uniform(size=(B, N, H, L, P)).astype(np.float32)
    att /= att.reshape(B, N, H, -1).sum(-1).reshape(B, N, H, 1, 1)
    return jnp.asarray(value), jnp.asarray(loc), jnp.asarray(att)


def test_pallas_msda_forward_matches_xla_core(rng):
    value, loc, att = _random_inputs(rng)
    want = ms_deform_attn_core(value, SHAPES, loc, att)
    got = ms_deform_attn_pallas(value, SHAPES, loc, att, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_msda_grads_match_xla_core(rng):
    value, loc, att = _random_inputs(rng, B=1, N=5, H=2, D=2,
                                     shapes=((4, 6), (2, 3)))
    shapes = ((4, 6), (2, 3))

    def loss_xla(v, l, a):
        out = ms_deform_attn_core(v, shapes, l, a)
        return jnp.sum(jnp.sin(out) * out)

    def loss_pallas(v, l, a):
        out = ms_deform_attn_pallas(v, shapes, l, a, True)
        return jnp.sum(jnp.sin(out) * out)

    g_want = jax.grad(loss_xla, argnums=(0, 1, 2))(value, loc, att)
    g_got = jax.grad(loss_pallas, argnums=(0, 1, 2))(value, loc, att)
    for got, want, name in zip(g_got, g_want, ("value", "loc", "att")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_backend_switch_routes_core(rng):
    """set_msda_backend('pallas') must route ms_deform_attn_core through
    the fused kernel (interpret mode on CPU) with identical results, and
    the config knob `fuser.pallas_msda` must flip the switch."""
    from dpft_tpu.ops import deform_attn as da

    value, loc, att = _random_inputs(rng, B=1, N=4, H=2, D=2,
                                     shapes=((3, 4), (2, 2)))
    shapes = ((3, 4), (2, 2))
    want = da.ms_deform_attn_core(value, shapes, loc, att)
    assert da.get_msda_backend() == "xla"
    def loss(v, l, a):
        return jnp.sum(da.ms_deform_attn_core(v, shapes, l, a) ** 2)

    g_want = jax.grad(loss, argnums=(0, 1, 2))(value, loc, att)
    try:
        da.set_msda_backend("pallas")
        got = da.ms_deform_attn_core(value, shapes, loc, att)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
        # Grads THROUGH the dispatcher with the pallas backend active:
        # the custom VJP must differentiate the dispatch-free XLA body
        # (routing back through ms_deform_attn_core would recurse).
        g_got = jax.grad(loss, argnums=(0, 1, 2))(value, loc, att)
        for gg, gw in zip(g_got, g_want):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                       rtol=1e-4, atol=1e-5)
    finally:
        da.set_msda_backend("xla")

    from dpft_tpu.models.fusers.mpfusion import build_mpfusion
    try:
        build_mpfusion({"pallas_msda": True, "m_views": 1})
        assert da.get_msda_backend() == "pallas"
    finally:
        da.set_msda_backend("xla")


def test_pallas_msda_jits_under_vmapless_batch(rng):
    """The pallas_call grids over (B, H); a jitted call with B>1 must
    produce per-batch results identical to per-sample calls."""
    value, loc, att = _random_inputs(rng, B=3, N=4, H=2, D=2,
                                     shapes=((3, 4), (2, 2)))
    shapes = ((3, 4), (2, 2))
    full = jax.jit(lambda v, l, a: ms_deform_attn_pallas(
        v, shapes, l, a, True))(value, loc, att)
    for b in range(3):
        single = ms_deform_attn_pallas(value[b:b + 1], shapes,
                                       loc[b:b + 1], att[b:b + 1], True)
        np.testing.assert_allclose(np.asarray(full[b]),
                                   np.asarray(single[0]),
                                   rtol=1e-5, atol=1e-6)
