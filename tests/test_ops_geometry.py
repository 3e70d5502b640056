"""Geometry op tests: transforms, corners, quad clipping, IoU/GIoU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpft_tpu.ops import boxes as bbox
from dpft_tpu.ops import iou as iou_ops
from dpft_tpu.ops import transforms as tf


# --------------------------------------------------------------------------
# Reference helpers (plain numpy, independent implementations)
# --------------------------------------------------------------------------

def np_corners(center, size, angle):
    xs = np.array([-1, 1, 1, -1, -1, 1, 1, -1]) * size[0] / 2
    ys = np.array([-1, -1, 1, 1, -1, -1, 1, 1]) * size[1] / 2
    zs = np.array([-1, -1, -1, -1, 1, 1, 1, 1]) * size[2] / 2
    c, s = np.cos(angle), np.sin(angle)
    x = c * xs - s * ys + center[0]
    y = s * xs + c * ys + center[1]
    z = zs + center[2]
    return np.stack([x, y, z], axis=-1)


def sutherland_hodgman_area(subject, clip):
    """Classic polygon clipping, numpy, for cross-validation."""
    def is_inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= -1e-12

    def seg_intersect(p1, p2, a, b):
        d1 = p2 - p1
        d2 = b - a
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        t = ((a[0] - p1[0]) * d2[1] - (a[1] - p1[1]) * d2[0]) / denom
        return p1 + t * d1

    def orient(poly):
        area = 0.0
        for i in range(len(poly)):
            j = (i + 1) % len(poly)
            area += poly[i][0] * poly[j][1] - poly[j][0] * poly[i][1]
        return poly if area >= 0 else poly[::-1]

    subject = orient([np.asarray(p, float) for p in subject])
    clip = orient([np.asarray(p, float) for p in clip])
    output = subject
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        input_list, output = output, []
        if not input_list:
            return 0.0
        prev = input_list[-1]
        for cur in input_list:
            if is_inside(cur, a, b):
                if not is_inside(prev, a, b):
                    output.append(seg_intersect(prev, cur, a, b))
                output.append(cur)
            elif is_inside(prev, a, b):
                output.append(seg_intersect(prev, cur, a, b))
            prev = cur
    if len(output) < 3:
        return 0.0
    area = 0.0
    for i in range(len(output)):
        j = (i + 1) % len(output)
        area += output[i][0] * output[j][1] - output[j][0] * output[i][1]
    return abs(area) / 2


def np_yaw_box_iou(c1, s1, a1, c2, s2, a2):
    q1 = np_corners(c1, s1, a1)[:4, :2]
    q2 = np_corners(c2, s2, a2)[:4, :2]
    inter_area = sutherland_hodgman_area(list(q1), list(q2))
    z1 = (c1[2] - s1[2] / 2, c1[2] + s1[2] / 2)
    z2 = (c2[2] - s2[2] / 2, c2[2] + s2[2] / 2)
    dz = max(0.0, min(z1[1], z2[1]) - max(z1[0], z2[0]))
    inter = inter_area * dz
    v1 = np.prod(s1)
    v2 = np.prod(s2)
    return inter / (v1 + v2 - inter)


# --------------------------------------------------------------------------
# Transforms
# --------------------------------------------------------------------------

def test_spher_cart_roundtrip(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32) * 10
    r, phi, roh = tf.cart2spher(pts[:, 0], pts[:, 1], pts[:, 2], degrees=True)
    x, y, z = tf.spher2cart(r, phi, roh, degrees=True)
    np.testing.assert_allclose(np.stack([x, y, z], -1), pts, atol=1e-3)


def test_polar_cart_roundtrip(rng):
    pts = rng.normal(size=(50, 2)).astype(np.float32) * 5
    r, phi = tf.cart2polar(pts[:, 0], pts[:, 1], degrees=False)
    x, y = tf.polar2cart(r, phi, degrees=False)
    np.testing.assert_allclose(np.stack([x, y], -1), pts, atol=1e-5)


def test_cart2spher_origin():
    r, phi, roh = tf.cart2spher(jnp.zeros(1), jnp.zeros(1), jnp.zeros(1))
    assert np.all(np.isfinite(np.array([r, phi, roh])))
    assert float(roh[0]) == 0.0


def test_transform_points_named():
    pts = jnp.array([[[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]]])
    out = tf.transform_points("cart2spher", pts)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 1]), [2, 90, 0], atol=1e-5)


# --------------------------------------------------------------------------
# Corners
# --------------------------------------------------------------------------

def test_box_corners_match_reference_formula(rng):
    B, N = 2, 5
    center = rng.normal(size=(B, N, 3)).astype(np.float32) * 10
    size = rng.uniform(0.5, 4.0, size=(B, N, 3)).astype(np.float32)
    angle = rng.uniform(-np.pi, np.pi, size=(B, N)).astype(np.float32)

    got = np.asarray(bbox.get_box_corners(jnp.array(center), jnp.array(size),
                                          jnp.array(angle)))
    for b in range(B):
        for n in range(N):
            want = np_corners(center[b, n], size[b, n], angle[b, n])
            np.testing.assert_allclose(got[b, n], want, atol=1e-4)


def test_enclosing_box(rng):
    c1 = jnp.array(np_corners([0, 0, 0], [2, 2, 2], 0.0))[None]
    c2 = jnp.array(np_corners([3, 0, 0], [2, 2, 2], 0.0))[None]
    enc = bbox.get_minimum_enclosing_box_corners(c1, c2)  # (1, 1, 8, 3)
    vol = bbox.get_box_volume_from_corners(enc)[0, 0]
    # enclosing AABB spans x [-1, 4], y [-1, 1], z [-1, 1] -> 5*2*2
    assert abs(float(vol) - 20.0) < 1e-4


# --------------------------------------------------------------------------
# Quad clipping + IoU
# --------------------------------------------------------------------------

def test_quad_intersection_random(rng):
    fn = jax.jit(iou_ops.quad_intersection_area)
    for _ in range(50):
        c1 = rng.uniform(-2, 2, size=2)
        c2 = rng.uniform(-2, 2, size=2)
        s1 = rng.uniform(0.5, 3.0, size=2)
        s2 = rng.uniform(0.5, 3.0, size=2)
        a1, a2 = rng.uniform(-np.pi, np.pi, size=2)
        q1 = np_corners([*c1, 0], [*s1, 1], a1)[:4, :2]
        q2 = np_corners([*c2, 0], [*s2, 1], a2)[:4, :2]
        want = sutherland_hodgman_area(list(q1), list(q2))
        got = float(fn(jnp.array(q1, jnp.float32), jnp.array(q2, jnp.float32)))
        assert abs(got - want) < 1e-3, (got, want)


def test_iou3d_identity():
    c = bbox.get_box_corners(
        jnp.array([[[1.0, 2.0, 0.5]]]), jnp.array([[[4.0, 2.0, 1.5]]]),
        jnp.array([[0.3]]))
    out = iou_ops.iou3d_batched(c, c)
    assert abs(float(out[0, 0, 0]) - 1.0) < 1e-4


def test_iou3d_random_vs_numpy(rng):
    N, M = 4, 3
    centers1 = rng.uniform(-3, 3, size=(N, 3))
    centers2 = rng.uniform(-3, 3, size=(M, 3))
    sizes1 = rng.uniform(1.0, 4.0, size=(N, 3))
    sizes2 = rng.uniform(1.0, 4.0, size=(M, 3))
    ang1 = rng.uniform(-np.pi, np.pi, size=N)
    ang2 = rng.uniform(-np.pi, np.pi, size=M)

    c1 = bbox.get_box_corners(jnp.array(centers1[None], jnp.float32),
                              jnp.array(sizes1[None], jnp.float32),
                              jnp.array(ang1[None], jnp.float32))[0]
    c2 = bbox.get_box_corners(jnp.array(centers2[None], jnp.float32),
                              jnp.array(sizes2[None], jnp.float32),
                              jnp.array(ang2[None], jnp.float32))[0]
    got = np.asarray(iou_ops.iou3d(c1, c2))
    for i in range(N):
        for j in range(M):
            want = np_yaw_box_iou(centers1[i], sizes1[i], ang1[i],
                                  centers2[j], sizes2[j], ang2[j])
            assert abs(got[i, j] - want) < 2e-3, (i, j, got[i, j], want)


def test_iou3d_flush_contact_far_from_origin():
    """Regression: exact boundary-contact boxes at field-scale coordinates.

    A prediction occupying exactly half a GT box (one face flush) has IoU
    exactly 0.5 at ANY pose. With uncentered f32 clipping predicates the
    measured IoU ranged [0.20, 0.53] for poses ~50 m from the origin
    (catastrophic cancellation in the containment cross products);
    quad_intersection_area now recenters the quads first."""
    rng = np.random.default_rng(3)
    N = 64
    c = rng.uniform(-50, 50, (N, 2))
    y = rng.uniform(-np.pi, np.pi, N)
    gt_center = np.column_stack([c, np.zeros(N)]).astype(np.float32)
    pr_center = np.column_stack([c[:, 0] + 0.5 * np.cos(y),
                                 c[:, 1] + 0.5 * np.sin(y),
                                 np.zeros(N)]).astype(np.float32)
    gt = bbox.get_box_corners(jnp.asarray(gt_center)[:, None],
                              jnp.tile(jnp.asarray([[2., 2., 2.]]),
                                       (N, 1))[:, None],
                              jnp.asarray(y, jnp.float32)[:, None])
    pr = bbox.get_box_corners(jnp.asarray(pr_center)[:, None],
                              jnp.tile(jnp.asarray([[1., 2., 2.]]),
                                       (N, 1))[:, None],
                              jnp.asarray(y, jnp.float32)[:, None])
    v = jax.jit(jax.vmap(lambda a, b: iou_ops.iou3d(a, b)[0, 0]))(gt, pr)
    np.testing.assert_allclose(np.asarray(v), 0.5, atol=1e-4)

    # Identical boxes: IoU 1 at any pose.
    w = jax.jit(jax.vmap(lambda a: iou_ops.iou3d(a, a)[0, 0]))(gt)
    np.testing.assert_allclose(np.asarray(w), 1.0, atol=1e-4)


def test_iou3d_invalid_boxes_masked():
    valid = bbox.get_box_corners(jnp.zeros((1, 1, 3)), jnp.ones((1, 1, 3)),
                                 jnp.zeros((1, 1)))[0]
    invalid = jnp.zeros((1, 8, 3))
    out = iou_ops.iou3d(valid, invalid)
    assert float(out[0, 0]) == 0.0
    g = iou_ops.giou3d(valid, invalid)
    assert float(g[0, 0]) == -1.0


def test_giou_nonoverlapping_is_minus_one():
    # Reference quirk: union is only computed where iou != 0, so any valid
    # non-overlapping pair yields giou == -1 exactly.
    c1 = bbox.get_box_corners(jnp.array([[[0.0, 0.0, 0.0]]]),
                              jnp.ones((1, 1, 3)), jnp.zeros((1, 1)))[0]
    c2 = bbox.get_box_corners(jnp.array([[[10.0, 0.0, 0.0]]]),
                              jnp.ones((1, 1, 3)), jnp.zeros((1, 1)))[0]
    g = iou_ops.giou3d(c1, c2)
    assert abs(float(g[0, 0]) + 1.0) < 1e-6


def test_giou_overlapping_value():
    # Two unit cubes overlapping by half: iou = 0.5/1.5 = 1/3.
    # Enclosing AABB: 1.5 x 1 x 1 = 1.5; union = 1.5 -> giou = iou - 0 = 1/3.
    c1 = bbox.get_box_corners(jnp.array([[[0.0, 0.0, 0.0]]]),
                              jnp.ones((1, 1, 3)), jnp.zeros((1, 1)))[0]
    c2 = bbox.get_box_corners(jnp.array([[[0.5, 0.0, 0.0]]]),
                              jnp.ones((1, 1, 3)), jnp.zeros((1, 1)))[0]
    g = float(iou_ops.giou3d(c1, c2)[0, 0])
    i = float(iou_ops.iou3d(c1, c2)[0, 0])
    assert abs(i - 1 / 3) < 1e-4
    assert abs(g - 1 / 3) < 1e-4


def test_iou_jit_and_grad_safety():
    # giou must be usable inside jit graphs without NaN for typical inputs.
    c1 = bbox.get_box_corners(jnp.zeros((1, 2, 3)),
                              jnp.ones((1, 2, 3)), jnp.zeros((1, 2)))
    out = jax.jit(iou_ops.giou3d_batched)(c1, c1)
    assert np.all(np.isfinite(np.asarray(out)))
