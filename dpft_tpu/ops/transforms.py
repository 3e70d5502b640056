"""Coordinate transformations (cartesian <-> polar/spherical), jittable.

Parity: reference src/dprt/models/utils/transformations.py:8-294. Angle
convention: azimuth phi measured from the +x axis, mathematically positive;
elevation roh measured from the x-y plane, positive toward +z. ``degrees``
selects degree or radian angular units.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def cart2polar(x: jnp.ndarray, y: jnp.ndarray,
               degrees: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r = jnp.sqrt(x * x + y * y)
    phi = jnp.arctan2(y, x)
    if degrees:
        phi = jnp.rad2deg(phi)
    return r, phi


def polar2cart(r: jnp.ndarray, phi: jnp.ndarray,
               degrees: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if degrees:
        phi = jnp.deg2rad(phi)
    return r * jnp.cos(phi), r * jnp.sin(phi)


def cart2spher(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray,
               degrees: bool = True
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cartesian to spherical (range, azimuth, elevation).

    Division-by-zero safe: points at the origin get elevation 0 (parity with
    the masked division in the reference, transformations.py:109-114).
    """
    r = jnp.sqrt(x * x + y * y + z * z)
    phi = jnp.arctan2(y, x)
    safe_r = jnp.where(r == 0, jnp.ones_like(r), r)
    c = jnp.where(r == 0, jnp.zeros_like(z), z / safe_r)
    roh = jnp.arcsin(jnp.clip(c, -1.0, 1.0))
    if degrees:
        phi = jnp.rad2deg(phi)
        roh = jnp.rad2deg(roh)
    return r, phi, roh


def spher2cart(r: jnp.ndarray, phi: jnp.ndarray, roh: jnp.ndarray,
               degrees: bool = True
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    if degrees:
        phi = jnp.deg2rad(phi)
        roh = jnp.deg2rad(roh)
    x = r * jnp.cos(phi) * jnp.cos(roh)
    y = r * jnp.sin(phi) * jnp.cos(roh)
    z = r * jnp.sin(roh)
    return x, y, z


def _stacked(fn, batch: jnp.ndarray, degrees: bool) -> jnp.ndarray:
    parts = [batch[..., i] for i in range(batch.shape[-1])]
    return jnp.stack(fn(*parts, degrees=degrees), axis=-1)


def transform_points(name: str | None, batch: jnp.ndarray,
                     degrees: bool = True) -> jnp.ndarray:
    """Applies a named coordinate transformation to (..., 2|3) points.

    Accepted names: 'polar2cart', 'spher2cart', 'cart2polar', 'cart2spher'
    (substring match, parity with build_transformation in the reference),
    or None for identity.
    """
    if name is None:
        return batch
    lname = name.lower()
    if "polar2cart" in lname:
        return _stacked(polar2cart, batch, degrees)
    if "spher2cart" in lname:
        return _stacked(spher2cart, batch, degrees)
    if "cart2polar" in lname:
        return _stacked(cart2polar, batch, degrees)
    if "cart2spher" in lname:
        return _stacked(cart2spher, batch, degrees)
    raise ValueError(f"Unknown transformation: {name}")
