"""Reference-point projection parity (fuser get_reference_points)."""

import numpy as np
import jax.numpy as jnp

from dpft_tpu.models.fusers.mpfusion import get_reference_points


def np_reference(query, transformation, projection, shape):
    """Transliteration of reference mpfusion.py:617-696."""
    B, N, _ = query.shape
    out = np.zeros((B, N, 2))
    for b in range(B):
        pts = query[b]
        if transformation[b].any():
            homo = np.column_stack([pts[:, :3], np.ones(N)])
            tq = (transformation[b] @ homo.T).T
            r = np.linalg.norm(tq[:, :3], axis=1)
            phi = np.rad2deg(np.arctan2(tq[:, 1], tq[:, 0]))
            with np.errstate(invalid="ignore"):
                roh = np.rad2deg(np.arcsin(
                    np.where(r != 0, tq[:, 2] / np.where(r != 0, r, 1), 0)))
            pts = np.stack([r, phi, roh], axis=1)
        homo = np.column_stack([pts[:, :3], np.ones(N)])
        proj = (projection[b] @ homo.T).T
        w = proj[:, 2]
        u = np.where(w != 0, proj[:, 0] / np.where(w != 0, w, 1), proj[:, 0])
        v = np.where(w != 0, proj[:, 1] / np.where(w != 0, w, 1), proj[:, 1])
        u = u / shape[b, 1]
        v = v / shape[b, 0]
        out[b] = np.clip(np.stack([u, v], axis=1), 0.0, 1.0)
    return out


def test_camera_projection_parity(rng):
    B, N = 2, 50
    query = rng.uniform(2, 60, size=(B, N, 3)).astype(np.float32)
    transformation = np.zeros((B, 4, 4), np.float32)  # camera: zero matrix
    projection = np.zeros((B, 4, 4), np.float32)
    for b in range(B):
        projection[b, 0] = [300, 0, 640, 0]
        projection[b, 1] = [0, 300, 360, 0]
        projection[b, 2] = [0, 0, 1, 0]
        projection[b, 3] = [0, 0, 0, 1]
    shape = np.array([[720, 1280], [720, 1280]], np.float32)

    got = np.asarray(get_reference_points(
        jnp.asarray(query), jnp.asarray(transformation),
        jnp.asarray(projection), jnp.asarray(shape)))
    want = np_reference(query, transformation, projection, shape)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_radar_projection_parity(rng):
    from dpft_tpu.data.kradar import radar_info

    B, N = 1, 80
    query = rng.uniform(-30, 60, size=(B, N, 3)).astype(np.float32)
    transformation = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    transformation[:, 0, 3] = 2.54  # radar -> lidar translation
    projection = np.zeros((B, 3, 4), np.float32)
    projection[:, 0] = [0, -1, 0, (len(radar_info.azimuth_raster) - 1) / 2]
    projection[:, 1] = [len(radar_info.range_raster)
                        / radar_info.range_raster.max(), 0, 0, 0]
    projection[:, 2] = [0, 0, 0, 1]
    shape = np.array([[256, 107]], np.float32)

    got = np.asarray(get_reference_points(
        jnp.asarray(query), jnp.asarray(transformation),
        jnp.asarray(projection), jnp.asarray(shape)))
    want = np_reference(query, transformation, projection, shape)
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert got.min() >= 0.0 and got.max() <= 1.0
