"""mAP3D / mGIoU3D parity against a direct numpy transliteration of the
reference algorithm (metric.py:16-250), using the framework's own (tested)
IoU/GIoU primitives as the geometric oracle."""

import pytest
import numpy as np
import jax.numpy as jnp

from dpft_tpu.evaluation.metric import map3d_sample, mgiou3d_sample
from dpft_tpu.ops.boxes import get_box_corners
from dpft_tpu.ops.iou import giou3d, iou3d

pytestmark = pytest.mark.slow


def _np_corners(center, size, angle_sincos):
    yaw = np.arctan2(angle_sincos[:, 0], angle_sincos[:, 1])
    return np.asarray(get_box_corners(jnp.asarray(center[None]),
                                      jnp.asarray(size[None]),
                                      jnp.asarray(yaw[None]))[0])


def np_reference_interp(x, xp, fp, right):
    x0, x1, y0, y1 = xp[0], xp[-1], fp[0], fp[-1]
    if np.isclose(x1 - x0, 0):
        y = np.zeros_like(x)
    else:
        y = y0 + (x - x0) * (y1 - y0) / (x1 - x0)
    y = np.where(x < x0, y0, y)
    y = np.where(x > x1, right, y)
    return y


def np_map3d(inputs, targets, threshold=0.5, nelem=101):
    """Transliteration of reference mAP3D (metric.py:32-152), unpadded."""
    num_classes = targets["gt_class"].shape[-1]
    label = np.argmax(inputs["class"], -1)
    gt_label = np.argmax(targets["gt_class"], -1)
    N = label.shape[0]

    corners = _np_corners(inputs["center"], inputs["size"], inputs["angle"])
    gt_corners = _np_corners(targets["gt_center"], targets["gt_size"],
                             targets["gt_angle"])

    aps = np.zeros(num_classes)
    for lbl in range(num_classes):
        mask = label == lbl
        gt_mask = gt_label == lbl
        iou = np.asarray(iou3d(
            jnp.asarray(corners * mask[:, None, None]),
            jnp.asarray(gt_corners * gt_mask[:, None, None])))
        npos = gt_mask.sum()

        order = np.argsort(-inputs["class"][:, lbl], kind="stable")
        iou = iou[order]
        mask_s = mask[order]

        thr = iou > threshold
        pair = mask_s[:, None] & gt_mask[None, :]
        tp_c = thr & pair

        tp = np.zeros(N)
        fp = np.ones(N)
        tp_val = tp_c.any(axis=0)
        tp_idx = tp_c.argmax(axis=0)
        tp[tp_idx[tp_val]] = 1
        fp[tp_idx[tp_val]] = 0
        fp[~mask_s] = 0

        tp = np.cumsum(tp)
        fp = np.cumsum(fp)
        prec = np.where(tp + fp != 0, tp / np.maximum(tp + fp, 1e-12), 0)
        rec = np.ones_like(tp) if npos == 0 else tp / npos

        rec_i = np.linspace(0, 1, nelem)
        prec_i = np_reference_interp(rec_i, rec, prec, right=0.0)
        aps[lbl] = prec_i.sum() / (nelem - 1)

    present = sorted(set(label.tolist()) | set(gt_label.tolist()))
    selection = present[1:]
    if not selection or not any(selection):
        return 1.0
    return float(np.mean(aps[selection]))


def np_mgiou3d(inputs, targets):
    """Transliteration of reference mGIoU3D (metric.py:161-250)."""
    num_classes = targets["gt_class"].shape[-1]
    label = np.argmax(inputs["class"], -1)
    gt_label = np.argmax(targets["gt_class"], -1)

    corners = _np_corners(inputs["center"], inputs["size"], inputs["angle"])
    gt_corners = _np_corners(targets["gt_center"], targets["gt_size"],
                             targets["gt_angle"])

    gious = -np.ones(num_classes)
    for lbl in range(num_classes):
        mask = label == lbl
        gt_mask = gt_label == lbl
        giou = np.asarray(giou3d(
            jnp.asarray(corners * mask[:, None, None]),
            jnp.asarray(gt_corners * gt_mask[:, None, None])))
        pair = mask[:, None] & gt_mask[None, :]
        giou = np.where(pair, giou, -1.0)
        match = giou.max(axis=0) if giou.size else np.zeros(0)
        if gt_mask.sum() == 0:
            gious[lbl] = 1.0
        if match.size > 0 and pair.any():
            gious[lbl] = match.mean()

    present = sorted(set(label.tolist()) | set(gt_label.tolist()))
    selection = present[1:]
    if not selection or not any(selection):
        return 1.0
    return float(np.mean(gious[selection]))


def make_problem(rng, N=25, M=5, C=3, M_pad=8):
    inputs = {
        "class": rng.normal(size=(N, C)).astype(np.float32) * 3,
        "center": rng.uniform(0, 40, size=(N, 3)).astype(np.float32),
        "size": rng.uniform(1, 4, size=(N, 3)).astype(np.float32),
    }
    ang = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
    inputs["angle"] = np.stack([np.sin(ang), np.cos(ang)], -1)

    tgt = {
        "gt_center": rng.uniform(0, 40, size=(M, 3)).astype(np.float32),
        "gt_size": rng.uniform(1, 4, size=(M, 3)).astype(np.float32),
    }
    # Force some overlap: copy a few predicted boxes onto gts.
    k = min(2, M, N)
    tgt["gt_center"][:k] = inputs["center"][:k]
    tgt["gt_size"][:k] = inputs["size"][:k]
    gang = rng.uniform(-np.pi, np.pi, M).astype(np.float32)
    gang[:k] = ang[:k]
    tgt["gt_angle"] = np.stack([np.sin(gang), np.cos(gang)], -1)
    cls = np.zeros((M, C), np.float32)
    cls[np.arange(M), rng.integers(1, C, M)] = 1.0
    tgt["gt_class"] = cls

    padded = {
        "gt_class": np.zeros((M_pad, C), np.float32),
        "gt_center": np.zeros((M_pad, 3), np.float32),
        "gt_size": np.zeros((M_pad, 3), np.float32),
        "gt_angle": np.zeros((M_pad, 2), np.float32),
        "gt_mask": np.zeros(M_pad, bool),
    }
    padded["gt_class"][:, 0] = 1.0
    for key in ("gt_class", "gt_center", "gt_size", "gt_angle"):
        padded[key][:M] = tgt[key]
    padded["gt_mask"][:M] = True
    return inputs, tgt, padded


def test_map3d_matches_transliteration():
    for seed in range(4):
        rng = np.random.default_rng(seed)
        inputs, tgt, padded = make_problem(rng)
        got = float(map3d_sample(
            {k: jnp.asarray(v) for k, v in inputs.items()},
            {k: jnp.asarray(v) for k, v in padded.items()}))
        want = np_map3d(inputs, tgt)
        assert abs(got - want) < 5e-3, (seed, got, want)


def test_mgiou3d_matches_transliteration():
    for seed in range(4):
        rng = np.random.default_rng(seed)
        inputs, tgt, padded = make_problem(rng)
        got = float(mgiou3d_sample(
            {k: jnp.asarray(v) for k, v in inputs.items()},
            {k: jnp.asarray(v) for k, v in padded.items()}))
        want = np_mgiou3d(inputs, tgt)
        assert abs(got - want) < 5e-3, (seed, got, want)
