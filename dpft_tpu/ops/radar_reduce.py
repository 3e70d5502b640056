"""4D radar tesseract -> dual-plane (RA / EA) feature reduction, on device.

This is the hot loop of dataset preparation (reference
src/dprt/datasets/kradar/processor.py:588-633: per-frame NumPy max / median /
var reductions over a (doppler=64, range=256, elevation=37, azimuth=107)
cube, ~80 MB fp32 per frame). Here the whole reduction is a single jitted
XLA program, batched over frames, so ETL streams cubes through the TPU
instead of crunching them one at a time on host cores.

Bit-parity details reproduced from the reference:
 - dB conversion 10*log10 applied first (processor.py:602);
 - RA (BEV) plane reduces over elevation THEN doppler on the UNCROPPED
   tesseract (processor.py:605-612);
 - range crop [4:252] applied before the EA reduction only (fft artifacts,
   processor.py:615);
 - 'median' statistics are median-of-median / var-of-var compositions, not
   joint reductions (processor.py:605-607);
 - the EA doppler 'median' is actually a MEAN (reference quirk,
   processor.py:624) - reproduced;
 - doppler-of-max is a doppler_raster table lookup at the argmax bin
   (processor.py:609-610,622-623).

Outputs: ra (range=256, azimuth=107, 6), ea (elevation=37, azimuth=107, 6)
with channels (rcs_max, rcs_median, rcs_var, doppler_max, doppler_median,
doppler_var).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpft_tpu.data.kradar import radar_info

_RANGE_CROP = (4, 252)


def _reduce_single(tesseract: jnp.ndarray,
                   doppler_raster: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(D, R, E, A) -> (ra (R, A, 6), ea (E, A, 6))."""
    t = 10.0 * jnp.log10(tesseract)

    # --- RA (BEV) plane: reduce elevation (axis 2) then doppler (axis 0).
    over_e_max = jnp.max(t, axis=2)          # (D, R, A)
    ra_rcs_max = jnp.max(over_e_max, axis=0)
    ra_rcs_median = jnp.median(jnp.median(t, axis=2), axis=0)
    ra_rcs_var = jnp.var(jnp.var(t, axis=2), axis=0)

    ra_doppler_max = doppler_raster[jnp.argmax(over_e_max, axis=0)]
    ra_doppler_median = jnp.median(over_e_max, axis=0)
    ra_doppler_var = jnp.var(over_e_max, axis=0)

    ra = jnp.stack([ra_rcs_max, ra_rcs_median, ra_rcs_var,
                    ra_doppler_max, ra_doppler_median, ra_doppler_var],
                   axis=-1)

    # --- EA (front) plane on the range-cropped cube: reduce range (axis 1)
    # then doppler (axis 0).
    tc = t[:, _RANGE_CROP[0]:_RANGE_CROP[1]]
    over_r_max = jnp.max(tc, axis=1)         # (D, E, A)
    ea_rcs_max = jnp.max(over_r_max, axis=0)
    ea_rcs_median = jnp.median(jnp.median(tc, axis=1), axis=0)
    ea_rcs_var = jnp.var(jnp.var(tc, axis=1), axis=0)

    ea_doppler_max = doppler_raster[jnp.argmax(over_r_max, axis=0)]
    ea_doppler_median = jnp.mean(over_r_max, axis=0)  # reference quirk
    ea_doppler_var = jnp.var(over_r_max, axis=0)

    ea = jnp.stack([ea_rcs_max, ea_rcs_median, ea_rcs_var,
                    ea_doppler_max, ea_doppler_median, ea_doppler_var],
                   axis=-1)
    return ra, ea


@partial(jax.jit, static_argnames=())
def reduce_tesseract(tesseract: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reduces one (D, R, E, A) cube or a batch (F, D, R, E, A) of cubes."""
    raster = jnp.asarray(radar_info.doppler_raster, jnp.float32)
    if tesseract.ndim == 4:
        return _reduce_single(tesseract, raster)
    return jax.vmap(lambda t: _reduce_single(t, raster))(tesseract)


def reduce_tesseract_np(tesseract: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """NumPy transliteration (reference processor.py:598-633), host fallback."""
    t = 10.0 * np.log10(tesseract)

    over_e_max = np.max(t, axis=2)
    ra_rcs_max = np.max(over_e_max, axis=0)
    ra_rcs_median = np.median(np.median(t, axis=2), axis=0)
    ra_rcs_var = np.var(np.var(t, axis=2), axis=0)
    ra_doppler_max = np.asarray(radar_info.doppler_raster)[
        np.argmax(over_e_max, axis=0)]
    ra_doppler_median = np.median(over_e_max, axis=0)
    ra_doppler_var = np.var(over_e_max, axis=0)

    tc = t[:, _RANGE_CROP[0]:_RANGE_CROP[1]]
    over_r_max = np.max(tc, axis=1)
    ea_rcs_max = np.max(over_r_max, axis=0)
    ea_rcs_median = np.median(np.median(tc, axis=1), axis=0)
    ea_rcs_var = np.var(np.var(tc, axis=1), axis=0)
    ea_doppler_max = np.asarray(radar_info.doppler_raster)[
        np.argmax(over_r_max, axis=0)]
    ea_doppler_median = np.mean(over_r_max, axis=0)
    ea_doppler_var = np.var(over_r_max, axis=0)

    ra = np.dstack([ra_rcs_max, ra_rcs_median, ra_rcs_var,
                    ra_doppler_max, ra_doppler_median, ra_doppler_var])
    ea = np.dstack([ea_rcs_max, ea_rcs_median, ea_rcs_var,
                    ea_doppler_max, ea_doppler_median, ea_doppler_var])
    return ra, ea
