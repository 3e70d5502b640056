"""Metric tests: mAP3D / mGIoU3D behavior on constructed scenarios."""

import numpy as np
import jax.numpy as jnp

from dpft_tpu.evaluation.metric import Metric, map3d_sample, mgiou3d_sample


def make_sample(pred_boxes, pred_cls_logits, gt_boxes, gt_cls, M_pad=8,
                num_classes=2):
    """pred_boxes/gt_boxes: list of (center(3), size(3), yaw)."""
    N = len(pred_boxes)
    inputs = {
        "class": jnp.asarray(pred_cls_logits, jnp.float32),
        "center": jnp.asarray([b[0] for b in pred_boxes], jnp.float32),
        "size": jnp.asarray([b[1] for b in pred_boxes], jnp.float32),
        "angle": jnp.asarray(
            [[np.sin(b[2]), np.cos(b[2])] for b in pred_boxes], jnp.float32),
    }
    m = len(gt_boxes)
    gt_class = np.zeros((M_pad, num_classes), np.float32)
    gt_class[:, 0] = 1.0
    gt_center = np.zeros((M_pad, 3), np.float32)
    gt_size = np.zeros((M_pad, 3), np.float32)
    gt_angle = np.zeros((M_pad, 2), np.float32)
    gt_mask = np.zeros((M_pad,), bool)
    for i, ((c, s, a), cls) in enumerate(zip(gt_boxes, gt_cls)):
        gt_class[i] = 0.0
        gt_class[i, cls] = 1.0
        gt_center[i] = c
        gt_size[i] = s
        gt_angle[i] = [np.sin(a), np.cos(a)]
        gt_mask[i] = True
    targets = {
        "gt_class": jnp.asarray(gt_class), "gt_center": jnp.asarray(gt_center),
        "gt_size": jnp.asarray(gt_size), "gt_angle": jnp.asarray(gt_angle),
        "gt_mask": jnp.asarray(gt_mask),
    }
    return inputs, targets


def _logits(labels, num_classes=2, conf=5.0):
    out = np.full((len(labels), num_classes), -conf, np.float32)
    for i, l in enumerate(labels):
        out[i, l] = conf + np.random.default_rng(i).normal() * 0.1
    return out


def test_perfect_predictions_give_ap_one():
    boxes = [([10.0, 0, 0], [4, 2, 1.5], 0.2), ([20.0, 5, 0], [4, 2, 1.5], -0.3)]
    inputs, targets = make_sample(boxes, _logits([1, 1]), boxes, [1, 1])
    ap = float(map3d_sample(inputs, targets))
    # Endpoint interp of a perfect PR curve: precision 1 everywhere -> 1.0.
    assert abs(ap - 1.0) < 1e-4
    giou = float(mgiou3d_sample(inputs, targets))
    assert abs(giou - 1.0) < 1e-3


def test_no_overlap_gives_ap_zero():
    # Include a background prediction so both classes are "present" (with a
    # single present class the reference selection quirk returns 1.0).
    preds = [([10.0, 0, 0], [4, 2, 1.5], 0.0),
             ([-5.0, 0, 0], [1, 1, 1], 0.0)]
    gts = [([50.0, 0, 0], [4, 2, 1.5], 0.0)]
    inputs, targets = make_sample(preds, _logits([1, 0]), gts, [1])
    ap = float(map3d_sample(inputs, targets))
    assert ap < 0.05
    giou = float(mgiou3d_sample(inputs, targets))
    assert giou <= 0.0  # non-overlapping pairs give giou -1


def test_single_class_returns_one():
    # Only background predicted and no real gt of class 1 -> selection empty.
    preds = [([10.0, 0, 0], [4, 2, 1.5], 0.0)]
    inputs, targets = make_sample(preds, _logits([0]), [], [])
    assert float(map3d_sample(inputs, targets)) == 1.0
    assert float(mgiou3d_sample(inputs, targets)) == 1.0


def test_half_detected():
    gts = [([10.0, 0, 0], [4, 2, 1.5], 0.0), ([30.0, 0, 0], [4, 2, 1.5], 0.0)]
    preds = [gts[0], ([90.0, 0, 0], [4, 2, 1.5], 0.0),
             ([-5.0, 0, 0], [1, 1, 1], 0.0)]
    logits = np.array([[-5, 6.0], [-5, 5.0], [6.0, -5]], np.float32)
    inputs, targets = make_sample(preds, logits, gts, [1, 1])
    ap = float(map3d_sample(inputs, targets))
    # One TP at rank 0, one FP at rank 1; recall tops out at 0.5.
    # Endpoint interp: line through (rec0=0.5, prec0=1) and (rec1=0.5,
    # prec1=0.5) is degenerate span -> interp yields 0 inside, left=1 for
    # x < 0.5, right=0 beyond -> AP = 50/100 * 1.0 = 0.5.
    assert 0.4 <= ap <= 0.6


def test_metric_wrapper_batched():
    boxes = [([10.0, 0, 0], [4, 2, 1.5], 0.2)]
    inputs, targets = make_sample(boxes, _logits([1]), boxes, [1])
    binputs = {k: jnp.stack([v, v]) for k, v in inputs.items()}
    btargets = {k: jnp.stack([v, v]) for k, v in targets.items()}
    metric = Metric({"mAP": "mAP3D", "mGIoU": "mGIoU3D"})
    out = metric(binputs, btargets)
    assert abs(float(out["mAP"]) - 1.0) < 1e-4
    assert abs(float(out["mGIoU"]) - 1.0) < 1e-3
