"""Detection metrics: mAP3D and mGIoU3D, jittable and batched.

Parity: reference src/dprt/evaluation/metric.py:16-361. The reference
evaluates per sample (B == 1) and averages over the batch; here one
per-sample function is vmapped over padded targets.

Reproduced reference behaviors:
 - AP uses the endpoint-only `interp` (utils/misc.py:43-84) over a 101-point
   recall grid with right=0 - NOT true piecewise interpolation. The
   published 56.1 AP3D is defined through this function.
 - predictions are ranked by the raw class logit of the evaluated class
   (metric.py:94; the class head emits logits).
 - per-class corner tensors are multiplied by the class mask in the
   reference, making off-class boxes degenerate so the IoU validity
   masking excludes them (metric.py:79-83). Here the overlap matrix is
   computed ONCE on the unmasked corners and the per-class exclusion is
   applied through the same pair masks the downstream math already uses:
   inside a pair mask the masked and unmasked corners are identical, and
   outside it mAP ands with the pair mask / mGIoU overwrites with -1, so
   the results are equal while the expensive polygon clipping runs once
   per sample instead of once per (class x metric).
 - `selection` keeps the present classes minus the lowest one
   (metric.py:143,241); when fewer than two classes are present the metric
   returns 1.0.
 - mGIoU of a class: 1.0 when it has no ground truth, mean of the
   best-per-target GIoU when any prediction of that class exists, -1
   otherwise (metric.py:228-238).

Padded targets (gt_mask False) are excluded from per-class ground-truth
masks, counts, and the class-presence selection.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from dpft_tpu.ops.boxes import get_box_corners
from dpft_tpu.ops.iou import iou_giou3d
from dpft_tpu.utils.misc import interp


def _decode_corners(center, size, angle_sincos):
    yaw = jnp.arctan2(angle_sincos[..., 0], angle_sincos[..., 1])
    return get_box_corners(center[None], size[None], yaw[None])[0]


def _class_presence(label: jnp.ndarray, gt_label: jnp.ndarray,
                    gt_real: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(num_classes,) bool of present classes (real gt rows only)."""
    present = jnp.zeros((num_classes,), bool)
    present = present.at[label].set(True)
    gt_sel = jnp.where(gt_real, gt_label, num_classes)  # pads out of range
    present = present.at[gt_sel].set(True, mode="drop")
    return present


def _selection_mean(values: jnp.ndarray, present: jnp.ndarray) -> jnp.ndarray:
    """Mean over present classes excluding the lowest present one; 1.0 when
    fewer than two classes are present (reference metric.py:143-151)."""
    num_classes = values.shape[0]
    first = jnp.argmax(present)  # lowest present class
    keep = present & (jnp.arange(num_classes) != first)
    count = jnp.sum(keep)
    mean = jnp.sum(jnp.where(keep, values, 0.0)) / jnp.maximum(count, 1)
    return jnp.where(count == 0, 1.0, mean)


def _class_ap(inputs, iou, mask, gt_mask, lbl, threshold, nelem):
    """AP of one class from the shared (N, M) IoU matrix."""
    N = iou.shape[0]
    npos = jnp.sum(gt_mask).astype(jnp.float32)

    conf = inputs["class"][:, lbl]
    sort_idx = jnp.argsort(-conf)
    iou_s = iou[sort_idx]
    mask_s = mask[sort_idx]

    thr = iou_s > threshold
    pair_mask = mask_s[:, None] & gt_mask[None, :]
    tp_c = thr & pair_mask                            # (N, M)

    tp_val = jnp.any(tp_c, axis=0)                    # (M,)
    tp_idx = jnp.argmax(tp_c, axis=0)                 # first hit row

    tp = jnp.zeros((N,))
    tp = tp.at[jnp.where(tp_val, tp_idx, N)].set(1.0, mode="drop")
    fp = (1.0 - tp) * mask_s.astype(jnp.float32)      # non-preds -> 0

    tp = jnp.cumsum(tp)
    fp = jnp.cumsum(fp)

    denom = tp + fp
    prec = jnp.where(denom != 0, tp / jnp.maximum(denom, 1e-12), 0.0)
    rec = jnp.where(npos == 0, jnp.ones_like(tp),
                    tp / jnp.maximum(npos, 1.0))

    rec_i = jnp.linspace(0.0, 1.0, nelem)
    prec_i = interp(rec_i, rec, prec, right=0.0)
    return jnp.sum(prec_i) / (nelem - 1)


def _class_giou(giou, mask, gt_mask, gt_real):
    """Best-match mean GIoU of one class from the shared (N, M) matrix."""
    pair_mask = mask[:, None] & gt_mask[None, :]
    giou = jnp.where(pair_mask, giou, -1.0)
    match = jnp.max(giou, axis=0)                       # (M,)

    # Mean over the REAL target columns only: the reference's matrix
    # has exactly the real targets as columns (metric.py:231-238);
    # padded columns must not dilute the mean (they would contribute
    # -1 each). Off-class real columns stay included as -1, matching
    # the reference.
    n_real = jnp.maximum(jnp.sum(gt_real), 1)
    mean_match = jnp.sum(jnp.where(gt_real, match, 0.0)) / n_real

    npos = jnp.sum(gt_mask)
    any_pair = jnp.any(pair_mask)
    return jnp.where(any_pair, mean_match,
                     jnp.where(npos == 0, 1.0, -1.0))


def detection_metrics_sample(inputs: Dict[str, jnp.ndarray],
                             targets: Dict[str, jnp.ndarray],
                             want: tuple = ("mAP3D", "mGIoU3D"),
                             threshold: float = 0.5,
                             nelem: int = 101) -> Dict[str, jnp.ndarray]:
    """All requested metrics for one sample, sharing one overlap pass."""
    num_classes = targets["gt_class"].shape[-1]

    label = jnp.argmax(inputs["class"], axis=-1)        # (N,)
    gt_label = jnp.argmax(targets["gt_class"], axis=-1)  # (M,)
    gt_real = targets["gt_mask"]

    corners = _decode_corners(inputs["center"], inputs["size"],
                              inputs["angle"])
    gt_corners = _decode_corners(targets["gt_center"], targets["gt_size"],
                                 targets["gt_angle"])

    # ONE clipping pass feeds every class of both metrics.
    iou, giou = iou_giou3d(corners, gt_corners,
                           with_giou="mGIoU3D" in want)   # (N, M) each

    aps, gious = [], []
    for lbl in range(num_classes):
        mask = label == lbl
        gt_mask = (gt_label == lbl) & gt_real
        if "mAP3D" in want:
            aps.append(_class_ap(inputs, iou, mask, gt_mask, lbl,
                                 threshold, nelem))
        if "mGIoU3D" in want:
            gious.append(_class_giou(giou, mask, gt_mask, gt_real))

    present = _class_presence(label, gt_label, gt_real, num_classes)
    out = {}
    if "mAP3D" in want:
        out["mAP3D"] = _selection_mean(jnp.stack(aps), present)
    if "mGIoU3D" in want:
        out["mGIoU3D"] = _selection_mean(jnp.stack(gious), present)
    return out


def map3d_sample(inputs: Dict[str, jnp.ndarray],
                 targets: Dict[str, jnp.ndarray],
                 threshold: float = 0.5,
                 nelem: int = 101) -> jnp.ndarray:
    """mAP3D for one sample. inputs: (N, *) predictions; targets padded (M, *)."""
    return detection_metrics_sample(inputs, targets, ("mAP3D",),
                                    threshold, nelem)["mAP3D"]


def mgiou3d_sample(inputs: Dict[str, jnp.ndarray],
                   targets: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """mGIoU3D for one sample (reference metric.py:155-250)."""
    return detection_metrics_sample(inputs, targets,
                                    ("mGIoU3D",))["mGIoU3D"]


_METRIC_KINDS = {"mAP3D", "mGIoU3D"}


class Metric:
    """Batched metric evaluation: metrics(outputs, targets) -> dict of scalars."""

    def __init__(self, metrics: Dict[str, str], reduction: str = "mean"):
        if reduction not in {"none", "mean", "sum"}:
            raise ValueError(f"Invalid reduction: {reduction}")
        self.metrics = dict(metrics)
        self.reduction = reduction
        for fn in self.metrics.values():
            if fn not in _METRIC_KINDS:
                raise ValueError(f"Unknown metric: {fn}")

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "Metric":
        return cls(metrics=config.get("metrics", {}),
                   reduction=config.get("reduction", "mean"))

    def __call__(self, outputs: Dict[str, jnp.ndarray],
                 targets: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if not self.metrics:
            return {}
        # Padded tail-batch samples (loader pad_last policy) drop out of
        # the reduction entirely.
        targets = dict(targets)
        sample_mask = targets.pop("sample_mask", None)
        sm = (None if sample_mask is None
              else jnp.asarray(sample_mask, jnp.float32))

        want = tuple(sorted(set(self.metrics.values())))
        per = jax.vmap(
            lambda o, t: detection_metrics_sample(o, t, want)
        )(outputs, targets)  # dict of (B,)

        results = {}
        for name, fn_name in self.metrics.items():
            per_sample = per[fn_name]
            if sm is not None:
                masked = per_sample * sm
                if self.reduction == "mean":
                    results[name] = (jnp.sum(masked)
                                     / jnp.maximum(jnp.sum(sm), 1.0))
                elif self.reduction == "sum":
                    results[name] = jnp.sum(masked)
                else:
                    results[name] = masked
            elif self.reduction == "mean":
                results[name] = jnp.mean(per_sample)
            elif self.reduction == "sum":
                results[name] = jnp.sum(per_sample)
            else:
                results[name] = per_sample
        return results


def build_metric(config: Dict[str, Any]) -> Metric:
    """Builds metrics from a config['evaluate'] section."""
    return Metric.from_config(config)
