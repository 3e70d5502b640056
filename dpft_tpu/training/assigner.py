"""Hungarian assignment between predictions and padded ground truth.

Parity: reference src/dprt/training/assigner.py:26-148 (HungarianAnassigner)
with two TPU-native changes: the cost matrix is built batched under vmap
instead of per-sample Python loops, and the LAP solve runs on device
(dpft_tpu.ops.hungarian) instead of a .cpu() roundtrip to scipy.

Cost parity (assigner.py:110-132): classification cost uses the raw class
logits (-out_class[:, gt_ids], no softmax - the reference quirk), L1 cdist
for center/size/angle, and -giou3d of the decoded corners. Padded targets
(gt_mask == False) receive a large constant cost, which provably leaves the
real-target assignment optimal (constant-cost columns shift every solution
equally).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from dpft_tpu.ops import hungarian
from dpft_tpu.ops.boxes import get_box_corners
from dpft_tpu.ops.iou import giou3d

_PAD_COST = 1e6


def _cdist_l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, D) x (M, D) -> (N, M) L1 distances."""
    return jnp.sum(jnp.abs(a[:, None, :] - b[None, :, :]), axis=-1)


def cost_matrix(outputs: Dict[str, jnp.ndarray],
                targets: Dict[str, jnp.ndarray],
                loss_weights: Dict[str, float],
                giou_weight: float = 1.0) -> jnp.ndarray:
    """Unbatched matching cost (N, M) for one sample (use under vmap).

    outputs: class (N, C), center (N, 3), size (N, 3), angle (N, 2).
    targets: gt_class (M, C), gt_center, gt_size, gt_angle, gt_mask (M,).
    """
    gt_ids = jnp.argmax(targets["gt_class"], axis=-1)  # (M,)
    cost_class = -outputs["class"][:, gt_ids]          # (N, M), raw logits

    cost_center = _cdist_l1(outputs["center"], targets["gt_center"])
    cost_size = _cdist_l1(outputs["size"], targets["gt_size"])
    cost_angle = _cdist_l1(outputs["angle"], targets["gt_angle"])

    out_yaw = jnp.arctan2(outputs["angle"][..., 0], outputs["angle"][..., 1])
    gt_yaw = jnp.arctan2(targets["gt_angle"][..., 0],
                         targets["gt_angle"][..., 1])
    out_corners = get_box_corners(outputs["center"][None],
                                  outputs["size"][None], out_yaw[None])[0]
    gt_corners = get_box_corners(targets["gt_center"][None],
                                 targets["gt_size"][None], gt_yaw[None])[0]
    cost_giou = -giou3d(out_corners, gt_corners)

    cost = (loss_weights["total_class"] * cost_class
            + loss_weights["center"] * cost_center
            + loss_weights["size"] * cost_size
            + loss_weights["angle"] * cost_angle
            + giou_weight * cost_giou)

    # Padded targets: constant cost so they never perturb real matches.
    return jnp.where(targets["gt_mask"][None, :], cost, _PAD_COST)


def hungarian_assign(cost: jnp.ndarray,
                     row_mask: jnp.ndarray = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, M) cost -> (index_i (M,), index_j (M,)) like the reference.

    row_mask (optional): (M,) bool of real targets; padded targets are
    routed to virtual columns and come back with the sentinel index_i == N
    (see ops/hungarian.assign) -- a large matcher speedup, since padded
    rows no longer sweep the full column set.
    """
    return hungarian.assign(cost, row_mask)


class HungarianAnassigner:
    """Config-built assigner (functional; callable on unbatched samples)."""

    def __init__(self, loss_weights: Dict[str, float],
                 giou_weight: float = 1.0):
        self.loss_weights = loss_weights
        self.giou_weight = giou_weight

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "HungarianAnassigner":
        return cls(loss_weights=config.get("loss_weights"))

    def __call__(self, outputs, targets):
        cost = cost_matrix(outputs, targets, self.loss_weights,
                           self.giou_weight)
        return hungarian_assign(cost)


def build_anassigner(name: str, config: Dict[str, Any]) -> HungarianAnassigner:
    if "hungarian" in name.lower():
        return HungarianAnassigner.from_config(config)
    raise ValueError(f"Unknown anassigner: {name}")
