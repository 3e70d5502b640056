"""Parity tests for the native host radar reduction (native/radar_reduce.cc).

The native kernel must match the NumPy transliteration of the reference hot
loop (src/dprt/datasets/kradar/processor.py:588-633) — same tolerances as
the XLA and Pallas paths (tests/test_data.py, tests/test_pallas_radar.py).
"""

import numpy as np
import pytest

from dpft_tpu.ops.radar_reduce import reduce_tesseract_np
from dpft_tpu.ops.radar_reduce_native import reduce_tesseract_native


@pytest.fixture
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("shape", [
    (8, 32, 6, 10),    # fixture raster (even E: exercises mean-of-middles)
    (8, 32, 7, 19),    # odd E
    (6, 16, 5, 11),    # non-power-of-two everywhere (bitonic padding)
])
def test_native_matches_numpy(rng, shape):
    tess = rng.uniform(1e8, 1e12, size=shape).astype(np.float32)
    ra_n, ea_n = reduce_tesseract_native(tess)
    ra_r, ea_r = reduce_tesseract_np(tess)
    np.testing.assert_allclose(ra_n, ra_r, rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(ea_n, ea_r, rtol=2e-4, atol=2e-2)


@pytest.mark.slow
def test_native_matches_numpy_full_size(rng):
    tess = rng.uniform(1e8, 1e12, size=(64, 256, 37, 107)).astype(np.float32)
    ra_n, ea_n = reduce_tesseract_native(tess)
    ra_r, ea_r = reduce_tesseract_np(tess)
    np.testing.assert_allclose(ra_n, ra_r, rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(ea_n, ea_r, rtol=2e-4, atol=2e-2)


def test_native_rejects_nonpositive_powers(rng):
    tess = rng.uniform(1e8, 1e12, size=(4, 8, 3, 5)).astype(np.float32)
    tess[1, 2, 1, 3] = 0.0  # -Ofast finite-math precondition
    with pytest.raises(ValueError, match="strictly positive"):
        reduce_tesseract_native(tess)


def test_processor_prepare_device_native_matches_numpy(rng, tmp_path):
    """prepare_device='native' routes get_radar_data through the host SIMD
    kernel and must produce the same planes as the NumPy reference path."""
    from scipy.io import savemat

    from dpft_tpu.data.kradar.processor import KRadarProcessor

    tess = rng.uniform(1e8, 1e12, size=(8, 32, 6, 10)).astype(np.float32)
    mat = str(tmp_path / "tess.mat")
    savemat(mat, {"arrDREA": tess})

    proc_native = KRadarProcessor(prepare_device="native")
    proc_np = KRadarProcessor(use_device=False)
    ra_c, ea_c = proc_native.get_radar_data(mat)
    ra_n, ea_n = proc_np.get_radar_data(mat)
    assert ra_c.dtype == proc_native.dtype
    np.testing.assert_allclose(ra_c, ra_n, rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(ea_c, ea_n, rtol=2e-4, atol=2e-2)
