"""Pallas TPU kernels: one-pass 4D radar tesseract reduction.

The ETL hot loop (reference processor.py:588-633) computes 12 statistics
over the (doppler=64, range=256, elevation=37, azimuth=107) cube, including
*compositions of medians* (median-over-elevation then median-over-doppler,
etc.). A straight XLA lowering sorts via variadic HLO sort and re-reads the
~260 MB cube several times; these kernels stream each tile through VMEM
once and compute every statistic in-register, with medians via bitonic
sorting networks realized as `pltpu.roll` compare-exchange stages (3 vector
ops + 2 rolls per stage - no gathers, no HLO sort).

Two kernels (each one full pass over the cube):
 - RA kernel: grid over range tiles; elevation-axis sort (pad 37 -> 64) and
   doppler-axis stats -> (range, azimuth, 6) BEV plane.
 - EA kernel: grid over elevation; range-axis sort (crop [4, 252) masked to
   +inf, pad 248 -> 256) and doppler stats -> (elevation, azimuth, 6)
   front plane.

Semantics are bit-compatible with dpft_tpu.ops.radar_reduce (including the
EA doppler-median-is-mean reference quirk); numerical differences are at
f32 reduction-order level. `reduce_tesseract_pallas` matches the public
signature of `reduce_tesseract`.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpft_tpu.data.kradar import radar_info

_RANGE_CROP = (4, 252)
_INF = 3.0e38  # plain float: jnp constants may not be captured by kernels


def _bitonic_stages(n: int):
    """Static (k, j) compare-exchange schedule for a power-of-two n."""
    stages = []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            stages.append((k, j))
            j //= 2
        k *= 2
    return stages


def _bitonic_sort(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Ascending bitonic sort along `axis` (size must be a power of two).

    Compare-exchange pairs (i, i XOR j) are materialized with two cyclic
    rolls and an index-parity select - fully vectorized on the VPU.
    """
    n = x.shape[axis]
    assert (n & (n - 1)) == 0, f"bitonic axis must be a power of two: {n}"
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)

    for k, j in _bitonic_stages(n):
        # pltpu.roll requires non-negative shifts; n - j is the cyclic
        # equivalent of -j.
        fwd = pltpu.roll(x, n - j, axis=axis)  # value at i + j
        bwd = pltpu.roll(x, j, axis=axis)      # value at i - j
        has_bit = (idx & j) != 0
        partner = jnp.where(has_bit, bwd, fwd)
        ascending = (idx & k) == 0
        keep_min = jnp.logical_xor(has_bit, ascending)
        x = jnp.where(keep_min, jnp.minimum(x, partner),
                      jnp.maximum(x, partner))
    return x


def _argmax_lookup(x: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """table[argmax over axis 0 of x] with first-occurrence semantics.

    x: (D, ...) any rank; table: (D, 1). Avoids data reshapes (Mosaic
    restricts vector reshapes): the table is broadcast by repeated
    unit-dim expansion, which lowers to layout-only ops.
    """
    D = x.shape[0]
    maxval = jnp.max(x, axis=0, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    first = jnp.min(jnp.where(x == maxval, iota, D), axis=0, keepdims=True)
    tb = table
    while tb.ndim < x.ndim:
        tb = tb[..., None]
    picked = jnp.where(iota == first, jnp.broadcast_to(tb, x.shape), 0.0)
    return jnp.sum(picked, axis=0)


def _median_sorted(x_sorted: jnp.ndarray, axis: int,
                   n_real: int) -> jnp.ndarray:
    """Median of the first n_real (ascending-sorted) entries along axis."""
    if n_real % 2:
        return jax.lax.index_in_dim(x_sorted, (n_real - 1) // 2, axis,
                                    keepdims=False)
    lo = jax.lax.index_in_dim(x_sorted, n_real // 2 - 1, axis, keepdims=False)
    hi = jax.lax.index_in_dim(x_sorted, n_real // 2, axis, keepdims=False)
    return (lo + hi) * 0.5


# ---------------------------------------------------------------------------
# RA (range-azimuth / BEV) kernel
# ---------------------------------------------------------------------------

def _ra_kernel(tess_ref, raster_ref, out_ref, scratch_e, scratch_d):
    """One range-tile: tess (D, R_t, E, A) -> out (R_t, 6, A)."""
    t = 10.0 * jnp.log10(tess_ref[...])          # (D, R_t, E, A)
    D, R_t, E, A = t.shape

    # Elevation statistics (axis 2). The reduced tensors are round-tripped
    # through VMEM scratch: Mosaic gives axis-2 reduction results an
    # implicit-dim layout that the later axis-0 rolls cannot relayout
    # directly; a store/load canonicalizes it.
    scratch_d[0] = jnp.max(t, axis=2)            # over_e_max (D, R_t, A)
    mean_e = jnp.mean(t, axis=2)
    ce = t - mean_e[:, :, None, :]
    scratch_d[1] = jnp.mean(ce * ce, axis=2)     # var_e (two-pass)

    # Median over elevation: pad E -> power of two with +inf (pads sort to
    # the top), bitonic, then the rank formula for either parity of E.
    scratch_e[...] = jnp.full(scratch_e.shape, _INF, jnp.float32)
    scratch_e[:, :, :E, :] = t
    sorted_e = _bitonic_sort(scratch_e[...], axis=2)
    scratch_d[2] = _median_sorted(sorted_e, 2, E)

    over_e_max = scratch_d[0]                    # (D, R_t, A)
    var_e = scratch_d[1]
    med_e = scratch_d[2]

    # Doppler statistics (axis 0) - argmax before any sorting.
    raster = raster_ref[...]                     # (D, 1)
    dop_max = _argmax_lookup(over_e_max, raster)  # (R_t, A)

    ra_rcs_max = jnp.max(over_e_max, axis=0)
    cd = over_e_max - jnp.mean(over_e_max, axis=0, keepdims=True)
    dop_var = jnp.mean(cd * cd, axis=0)

    cv = var_e - jnp.mean(var_e, axis=0, keepdims=True)
    ra_rcs_var = jnp.mean(cv * cv, axis=0)

    dop_med = _median_sorted(_bitonic_sort(over_e_max, axis=0), 0, D)
    ra_rcs_median = _median_sorted(_bitonic_sort(med_e, axis=0), 0, D)

    out_ref[:, 0] = ra_rcs_max
    out_ref[:, 1] = ra_rcs_median
    out_ref[:, 2] = ra_rcs_var
    out_ref[:, 3] = dop_max
    out_ref[:, 4] = dop_med
    out_ref[:, 5] = dop_var


# ---------------------------------------------------------------------------
# EA (elevation-azimuth / front) kernel
# ---------------------------------------------------------------------------

def _ea_kernel(tess_ref, raster_ref, out_ref, scratch_d):
    """One elevation slice: tess (1, R, D, A) -> out (1, 6, A).

    The cube is pre-transposed to (E, R, D, A) so the 256-long range sort
    runs on the MAJOR axis (Mosaic crashes on >64-sublane roll networks)
    and the doppler stats on sublanes.
    """
    t = 10.0 * jnp.log10(tess_ref[...])[0]            # (R, D, A)
    R, D, A = t.shape
    lo, hi = _RANGE_CROP[0], min(_RANGE_CROP[1], R)
    n_real = hi - lo

    ridx = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    valid = (ridx >= lo) & (ridx < hi)

    # Range statistics (axis 0) over the cropped rows; round-trip the
    # reductions through scratch to canonicalize layouts (cf. _ra_kernel).
    t_neg = jnp.where(valid, t, -_INF)
    scratch_d[0] = jnp.max(t_neg, axis=0)             # over_r_max (D, A)
    t_zero = jnp.where(valid, t, 0.0)
    mean_r = jnp.sum(t_zero, axis=0) / n_real
    cr = jnp.where(valid, t - mean_r[None], 0.0)
    scratch_d[1] = jnp.sum(cr * cr, axis=0) / n_real  # var_r (two-pass)

    t_pos = jnp.where(valid, t, _INF)
    sorted_r = _bitonic_sort(t_pos, axis=0)           # pads sort to the top
    scratch_d[2] = _median_sorted(sorted_r, 0, n_real)

    over_r_max = scratch_d[0]
    var_r = scratch_d[1]
    med_r = scratch_d[2]

    # Doppler statistics (axis 0).
    raster = raster_ref[...]
    dop_max = _argmax_lookup(over_r_max, raster)

    ea_rcs_max = jnp.max(over_r_max, axis=0)
    dop_mean = jnp.mean(over_r_max, axis=0)           # reference quirk
    cd = over_r_max - dop_mean[None]
    dop_var = jnp.mean(cd * cd, axis=0)

    cv = var_r - jnp.mean(var_r, axis=0, keepdims=True)
    ea_rcs_var = jnp.mean(cv * cv, axis=0)
    ea_rcs_median = _median_sorted(_bitonic_sort(med_r, axis=0), 0, D)

    out_ref[0, 0] = ea_rcs_max
    out_ref[0, 1] = ea_rcs_median
    out_ref[0, 2] = ea_rcs_var
    out_ref[0, 3] = dop_max
    out_ref[0, 4] = dop_mean
    out_ref[0, 5] = dop_var


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("interpret", "r_tile"))
def reduce_tesseract_pallas(tesseract: jnp.ndarray,
                            interpret: bool = False,
                            r_tile: int = 2
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(D, R, E, A) or (F, D, R, E, A) -> (ra (.., R, A, 6), ea (.., E, A, 6)).

    Requires D and R powers of two (both carry bitonic sort networks: the
    doppler medians and the EA range median) and R divisible by r_tile;
    the K-Radar cube is (64, 256, 37, 107). Other shapes: use
    ops.radar_reduce.reduce_tesseract (the XLA path).
    """
    if tesseract.ndim == 5:
        fn = lambda t: reduce_tesseract_pallas(t, interpret=interpret,
                                               r_tile=r_tile)
        return jax.vmap(fn)(tesseract)

    D, R, E, A = tesseract.shape
    assert (D & (D - 1)) == 0, \
        f"doppler axis must be a power of two, got {D}"
    assert (R & (R - 1)) == 0, \
        f"range axis must be a power of two (EA range sort), got {R}"
    assert R % r_tile == 0, (R, r_tile)
    e_pad = 1 << (E - 1).bit_length()

    tesseract = tesseract.astype(jnp.float32)
    # Table lookups only ever index bins < D (argmax over the D axis).
    raster = jnp.asarray(radar_info.doppler_raster[:D],
                         jnp.float32).reshape(D, 1)

    ra = pl.pallas_call(
        _ra_kernel,
        grid=(R // r_tile,),
        in_specs=[
            pl.BlockSpec((D, r_tile, E, A), lambda r: (0, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_tile, 6, A), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 6, A), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D, r_tile, e_pad, A), jnp.float32),
                        pltpu.VMEM((3, D, r_tile, A), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tesseract, raster)

    # EA pass: E must lead so TPU block shapes keep the last two dims
    # full, and R precedes D so the long sort is on the major axis; one
    # XLA transpose pass rearranges the cube.
    tess_e = tesseract.transpose(2, 1, 0, 3)  # (E, R, D, A)
    ea = pl.pallas_call(
        _ea_kernel,
        grid=(E,),
        in_specs=[
            pl.BlockSpec((1, R, D, A), lambda e: (e, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), lambda e: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 6, A), lambda e: (e, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, 6, A), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, D, A), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tess_e, raster)

    return ra.transpose(0, 2, 1), ea.transpose(0, 2, 1)
