"""No-assigner (plain) loss mode and GIoULoss tests."""

import numpy as np
import jax.numpy as jnp

from dpft_tpu.training.loss import Loss, giou_loss_boxes


def test_plain_loss_mode(rng):
    B, M, C = 2, 4, 3
    outputs = {
        "center": jnp.asarray(rng.normal(size=(B, M, 3)), jnp.float32),
        "class": jnp.asarray(rng.normal(size=(B, M, C)), jnp.float32),
    }
    targets = {
        "gt_center": jnp.asarray(rng.normal(size=(B, M, 3)), jnp.float32),
        "gt_class": jnp.asarray(
            (rng.uniform(size=(B, M, C)) > 0.5).astype(np.float32)),
        "gt_mask": jnp.ones((B, M), bool),
    }
    loss_fn = Loss(
        loss_weights={"center": 1.0, "class": 0.5},
        use_assigner=False,
        losses={"center": "L1Loss", "class": "FocalLoss"},
        loss_inputs={"center": ["center"], "class": ["class"]},
    )
    total, losses = loss_fn(outputs, targets)
    want_l1 = float(np.abs(np.asarray(outputs["center"])
                           - np.asarray(targets["gt_center"])).sum(axis=(1, 2)).mean())
    assert abs(float(losses["center"]) - want_l1) < 1e-3
    assert np.isfinite(float(total))


def test_plain_loss_respects_mask(rng):
    outputs = {"center": jnp.ones((1, 3, 3))}
    targets = {"gt_center": jnp.zeros((1, 3, 3)),
               "gt_mask": jnp.asarray([[True, False, False]])}
    loss_fn = Loss(loss_weights={"center": 1.0}, use_assigner=False,
                   losses={"center": "L1Loss"},
                   loss_inputs={"center": ["center"]})
    total, _ = loss_fn(outputs, targets)
    assert abs(float(total) - 3.0) < 1e-6  # only the masked row counts


def test_giou_loss_boxes_identity():
    boxes = jnp.asarray([[10.0, 0, 0, 4, 2, 1.5, 0.0, 1.0]])
    mask = jnp.ones((1,))
    loss = float(giou_loss_boxes(boxes, boxes, mask))
    assert abs(loss) < 1e-4  # perfect overlap -> giou 1 -> loss 0


def test_giou_loss_boxes_disjoint():
    a = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0.0, 1.0]])
    b = jnp.asarray([[50.0, 0, 0, 2, 2, 2, 0.0, 1.0]])
    loss = float(giou_loss_boxes(a, b, jnp.ones((1,))))
    assert abs(loss - 1.0) < 1e-4  # giou -1 -> loss (1 - (-1))/2 = 1
