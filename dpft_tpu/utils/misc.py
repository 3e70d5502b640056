"""Miscellaneous utilities (seeding, list coercion, interpolation).

Parity targets: reference src/dprt/utils/misc.py:10-126. The endpoint-only
``interp`` quirk of the reference (only the first/last sample points define
the interpolant, reference misc.py:43-84) is reproduced bit-for-bit because
the published mAP numbers depend on it; a correct piecewise variant is
provided as :func:`interp_piecewise` for users who want the fixed metric.
"""

from __future__ import annotations

import os
import random
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np


def as_list(item: Any) -> List[Any]:
    """Returns the given item wrapped in (or converted to) a list."""
    if isinstance(item, list):
        return item
    if isinstance(item, (tuple, set)):
        return list(item)
    return [item]


def interp(x: jnp.ndarray, xp: jnp.ndarray, fp: jnp.ndarray,
           left: float | None = None, right: float | None = None) -> jnp.ndarray:
    """Endpoint-linear interpolation (reference-parity, jittable).

    The reference implementation (misc.py:43-84) fits a single straight line
    through the FIRST and LAST points of (xp, fp) — it is *not* piecewise
    interpolation. Values of x outside [xp[0], xp[-1]] are replaced by
    ``left`` / ``right`` (defaulting to fp[0] / fp[-1]). If the x-extent is
    (close to) zero, the interpolant is identically zero.
    """
    x0, x1 = xp[0], xp[-1]
    y0, y1 = fp[0], fp[-1]

    left_v = y0 if left is None else jnp.asarray(left, dtype=fp.dtype)
    right_v = y1 if right is None else jnp.asarray(right, dtype=fp.dtype)

    degenerate = jnp.isclose(x1 - x0, jnp.zeros_like(x0))
    denom = jnp.where(degenerate, jnp.ones_like(x0), x1 - x0)
    y = y0 + (x - x0) * (y1 - y0) / denom
    y = jnp.where(degenerate, jnp.zeros_like(y), y)

    y = jnp.where(x < x0, left_v, y)
    y = jnp.where(x > x1, right_v, y)
    return y


def interp_piecewise(x: jnp.ndarray, xp: jnp.ndarray, fp: jnp.ndarray,
                     left: float | None = None,
                     right: float | None = None) -> jnp.ndarray:
    """True piecewise-linear interpolation (jnp.interp wrapper)."""
    y = jnp.interp(x, xp, fp)
    if left is not None:
        y = jnp.where(x < xp[0], left, y)
    if right is not None:
        y = jnp.where(x > xp[-1], right, y)
    return y


def set_seed(seed: int | None) -> "jax.Array | None":
    """Sets global random seeds and returns a JAX PRNG key.

    Seeds Python and NumPy host RNGs (used by the data pipeline) and derives
    a JAX PRNG key for on-device randomness. Parity: reference
    misc.py:104-126 seeds python/numpy/torch; JAX randomness is explicit so
    the key is returned instead of hidden global state.
    """
    if seed is None:
        return None
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
