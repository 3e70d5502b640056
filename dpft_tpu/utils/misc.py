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
    # Host-resident key: host-side key math (split/fold_in in the epoch
    # loop) must not bounce through the accelerator; see host_prng_key.
    return host_prng_key(seed)


def host_prng_key(seed: int) -> "jax.Array":
    """PRNG key created on the host CPU backend.

    A key created under the default (tunneled TPU) device costs a
    device->host readback to detach — measured 194 s for the 8-byte key
    on 2026-08-19 (the tunnel's D2H path is minutes-slow while dispatch
    and H2D stay fast). Threefry keys are backend-invariant, so a CPU key
    is numerically identical.
    """
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        return jax.random.PRNGKey(seed)
    with jax.default_device(cpu):
        key = jax.random.PRNGKey(seed)
    # COMMIT the key to the CPU device: default_device only places the
    # array, it does not commit it, so downstream fold_in/split made
    # outside this context would dispatch on the current default device
    # (the tunneled TPU) — the opposite of the intent. Committed inputs
    # pin eager ops (and their outputs) to the CPU; values are unchanged.
    return jax.device_put(key, cpu)


def init_on_host(init_fn, *args, **kwargs):
    """Runs a flax ``model.init`` on the host CPU backend.

    Flax initialization executes the forward eagerly, compiling every op
    as its own small program. On the tunneled TPU backend each of those
    compiles costs ~19 s (measured 2026-08-19: a 3-conv toy init took
    18.8 s), so a flagship init that finishes in seconds on the host CPU
    stalls for tens of minutes on device. Running init under the local CPU
    backend keeps those op-compiles local and instant; the resulting
    variables are then transferred to the default device in one
    ``device_put``. Initialization values are unchanged: JAX's threefry
    PRNG is backend-deterministic and initializers are elementwise.

    Falls back to a plain ``init_fn`` call when no distinct CPU backend
    exists (e.g. the tests' forced-CPU platform, where it is a no-op
    wrapper anyway).
    """
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        # Process-LOCAL default device: jax.devices()[0] is the GLOBAL
        # list's head, which in a multi-process run belongs to process 0
        # and is non-addressable elsewhere (device_put would raise
        # INVALID_ARGUMENT on every other process).
        default = jax.local_devices()[0]
    except Exception:
        return init_fn(*args, **kwargs)
    if cpu == default:
        return init_fn(*args, **kwargs)
    # Detach device args to host numpy first: eager ops follow committed
    # inputs onto their device, which would silently run the init on the
    # TPU despite the default_device override. NOTE: detaching a
    # TPU-resident array pays a D2H readback (minutes-slow on the
    # tunneled backend) — prefer passing host numpy / host_prng_key.
    args, kwargs = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
        (args, kwargs))
    with jax.default_device(cpu):
        variables = init_fn(*args, **kwargs)
    # device=None keeps committed arrays where they are; ask for the
    # default device explicitly.
    return jax.device_put(variables, default)
