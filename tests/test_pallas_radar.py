"""Pallas radar-reduction kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dpft_tpu.ops.pallas.radar_reduce import (_bitonic_sort,
                                              reduce_tesseract_pallas)
from dpft_tpu.ops.radar_reduce import reduce_tesseract_np


def test_bitonic_sort_matches_numpy(rng):
    # Interpret-mode check of the roll-based compare-exchange network.
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = rng.normal(size=(16, 8, 128)).astype(np.float32)

    def kernel(x_ref, o_ref):
        o_ref[...] = _bitonic_sort(x_ref[...], axis=0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=True,
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), np.sort(x, axis=0))

    def kernel1(x_ref, o_ref):
        o_ref[...] = _bitonic_sort(x_ref[...], axis=1)

    out = pl.pallas_call(
        kernel1,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=True,
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), np.sort(x, axis=1))


def test_pallas_reduce_matches_numpy(rng):
    # Small K-Radar-shaped cube (D must be a power of two, R % r_tile == 0).
    D, R, E, A = 16, 32, 5, 9
    tess = rng.uniform(1e8, 1e12, size=(D, R, E, A)).astype(np.float32)

    ra_np, ea_np = reduce_tesseract_np(tess)
    ra_p, ea_p = reduce_tesseract_pallas(jnp.asarray(tess), interpret=True,
                                         r_tile=8)

    np.testing.assert_allclose(np.asarray(ra_p), ra_np, rtol=3e-4, atol=3e-2)
    np.testing.assert_allclose(np.asarray(ea_p), ea_np, rtol=3e-4, atol=3e-2)


def test_pallas_reduce_even_elevation(rng):
    """Regression: the RA elevation median must average the two middle
    ranks for EVEN elevation counts (it used to take the lower rank only,
    silently diverging from the XLA/NumPy paths)."""
    D, R, E, A = 16, 32, 6, 9
    tess = rng.uniform(1e8, 1e12, size=(D, R, E, A)).astype(np.float32)
    ra_np, ea_np = reduce_tesseract_np(tess)
    ra_p, ea_p = reduce_tesseract_pallas(jnp.asarray(tess), interpret=True,
                                         r_tile=8)
    np.testing.assert_allclose(np.asarray(ra_p), ra_np, rtol=3e-4, atol=3e-2)
    np.testing.assert_allclose(np.asarray(ea_p), ea_np, rtol=3e-4, atol=3e-2)


def test_pallas_reduce_rejects_non_pow2_range():
    """The EA kernel sorts the range axis bitonically: a non-power-of-two
    R must be rejected loudly at the entry point (the ETL falls back to
    the XLA path for such cubes)."""
    tess = jnp.ones((8, 24, 3, 5), jnp.float32)
    with pytest.raises(AssertionError, match="power of two"):
        reduce_tesseract_pallas(tess, interpret=True, r_tile=8)


def test_pallas_reduce_batched(rng):
    D, R, E, A = 8, 16, 3, 5
    tess = rng.uniform(1e8, 1e10, size=(2, D, R, E, A)).astype(np.float32)
    ra, ea = reduce_tesseract_pallas(jnp.asarray(tess), interpret=True,
                                     r_tile=8)
    assert ra.shape == (2, R, A, 6)
    assert ea.shape == (2, E, A, 6)
