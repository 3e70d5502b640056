"""Set-prediction loss (focal + L1 + optional GIoU), jittable and batched.

Parity: reference src/dprt/training/loss.py. Where the reference decollates
the batch and loops per sample (loss.py:509-547), this implementation vmaps
one per-sample loss over padded fixed-size targets - the math is identical,
the shapes are static, and everything stays on device.

Reproduced reference behaviors (deliberate, they shape the published run):
 - focal_loss computes p_t from the RAW LOGITS, not sigmoid probabilities
   (loss.py:44; torchvision's sigmoid_focal_loss applies sigmoid first).
 - total_class focal scatters matched one-hot targets onto a background
   (class 0) canvas over all N queries and normalizes by
   sum/N/M*N = sum/M (loss.py:271-317).
 - object_class focal normalizes by (mean over M).sum()/M*N (loss.py:234-269).
 - samples without any real target contribute exactly zero loss
   (loss.py:514-519).
 - batch reduction 'mean', total = sum of weighted loss terms.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from dpft_tpu.training import assigner as assigner_lib


def _torch_pow(base: jnp.ndarray, exponent: float) -> jnp.ndarray:
    """pow matching torch for negative bases with integral exponents.

    jnp.power(negative, 2.0) is NaN on some backends (exp/log path); torch
    evaluates integral exponents exactly. The focal modulating factor
    (1 - p_t)**gamma hits negative bases because p_t is computed from raw
    logits (reference quirk), so this matters.
    """
    if float(exponent).is_integer():
        sign = jnp.where(
            (base < 0) & (int(exponent) % 2 == 1), -1.0, 1.0)
        return sign * jnp.power(jnp.abs(base), exponent)
    return jnp.power(base, exponent)


def binary_cross_entropy_with_logits(logits: jnp.ndarray,
                                     targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable BCE-with-logits (elementwise)."""
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def focal_loss(inputs: jnp.ndarray, targets: jnp.ndarray,
               alpha: float = 0.75, gamma: float = 2.0) -> jnp.ndarray:
    """Elementwise focal loss, reference parity (loss.py:17-60)."""
    ce = binary_cross_entropy_with_logits(inputs, targets)
    p_t = inputs * targets + (1.0 - inputs) * (1.0 - targets)  # raw logits!
    loss = ce * _torch_pow(1.0 - p_t, gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def _sample_set_criterion(outputs: Dict[str, jnp.ndarray],
                          targets: Dict[str, jnp.ndarray],
                          index_i: jnp.ndarray,
                          index_j: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """SetCriterion losses for ONE sample (unbatched; use under vmap).

    outputs: class (N, C), center (N, 3), size (N, 3), angle (N, 2).
    targets: gt_* padded to M rows, gt_mask (M,) marking real targets.
    index_i/index_j: (M,) matched query / target indices.

    All index consumption goes through one-hot contractions instead of
    gather/scatter: data-dependent gather indices inside a large backward
    program trigger a pathological schedule on the TPU backend (measured
    540 ms of a 575 ms train-step backward at flagship shapes; with the
    same math expressed as one-hot matmuls the backward is 15 ms). The
    matrices are tiny ((M, N) = (32, 400)), dense, MXU-friendly, and their
    backward is again a matmul. The sentinel index N of padded matches
    (ops/hungarian.py) maps to an all-zero one-hot row, reproducing the
    scatter-drop semantics exactly.
    """
    N, C = outputs["class"].shape
    sel_q = jax.nn.one_hot(index_i, N, dtype=jnp.float32)  # (M, N)
    sel_t = jax.nn.one_hot(index_j, index_j.shape[0],
                           dtype=jnp.float32)              # (M, M) perm
    mask_j = sel_t @ targets["gt_mask"].astype(jnp.float32)  # (M,)
    n_real = jnp.maximum(jnp.sum(mask_j), 1.0)

    # --- total_class: background canvas with matched targets patched in.
    base = jnp.zeros((N, C)).at[:, 0].set(1.0)
    gt_sel = sel_t @ targets["gt_class"]          # (M, C)
    covered = jnp.sum(sel_q, axis=0)              # (N,) 0/1, rows distinct
    canvas = base * (1.0 - covered)[:, None] + sel_q.T @ gt_sel
    tot = focal_loss(outputs["class"], canvas)
    total_class = jnp.sum(jnp.mean(tot, axis=0)) / n_real * N

    # --- object_class: focal on matched pairs only.
    pred_sel = sel_q @ outputs["class"]           # (M, C); 0 rows for pads
    obj = focal_loss(pred_sel, gt_sel) * mask_j[:, None]
    object_class = jnp.sum(obj) / n_real / n_real * N

    # --- L1 on matched center / size / angle (mean over real elements).
    def l1(key_out, key_gt, dims):
        diff = jnp.abs(sel_q @ outputs[key_out]
                       - sel_t @ targets[key_gt]) * mask_j[:, None]
        return jnp.sum(diff) / (n_real * dims)

    return {
        "total_class": total_class,
        "object_class": object_class,
        "center": l1("center", "gt_center", 3),
        "size": l1("size", "gt_size", 3),
        "angle": l1("angle", "gt_angle", 2),
    }


def giou_loss_boxes(inputs: jnp.ndarray, targets: jnp.ndarray,
                    mask: jnp.ndarray) -> jnp.ndarray:
    """GIoULoss over (M, 8) boxes [x, y, z, l, w, h, sin a, cos a].

    Parity: reference GIoULoss (loss.py:111-173): 1 - diag(giou3d) scaled
    to [0, 1], summed over the masked rows. Forward-only like the
    reference ("Backward is not supported", reference iou.py:76): the
    clipping geometry contains non-differentiable argsort/selection, so
    wrap in stop_gradient if used inside a trained objective.
    """
    from dpft_tpu.ops.boxes import get_box_corners
    from dpft_tpu.ops.iou import giou3d

    yaw = jnp.arctan2(inputs[..., 6], inputs[..., 7])
    gt_yaw = jnp.arctan2(targets[..., 6], targets[..., 7])
    c = get_box_corners(inputs[None, :, :3], inputs[None, :, 3:6],
                        yaw[None])[0]
    g = get_box_corners(targets[None, :, :3], targets[None, :, 3:6],
                        gt_yaw[None])[0]
    diag = jnp.diagonal(giou3d(c, g))
    loss = (1.0 - diag) / 2.0
    return jnp.sum(loss * mask)


# Plain per-name loss functions for the no-assigner mode (reference
# loss.py:532-540: losses applied directly between stacked tensors; used
# for dense prediction tasks where N == M).
def _plain_l1(inputs, targets, mask):
    return jnp.sum(jnp.abs(inputs - targets) * mask[:, None])


def _plain_mse(inputs, targets, mask):
    return jnp.sum((inputs - targets) ** 2 * mask[:, None])


def _plain_focal(inputs, targets, mask):
    return jnp.sum(focal_loss(inputs, targets) * mask[:, None])


_PLAIN_LOSSES = {
    "L1Loss": _plain_l1,
    "MSELoss": _plain_mse,
    "FocalLoss": _plain_focal,
    "GIoULoss": None,  # handled specially (consumes full box rows)
}


class Loss:
    """Batched set loss. Call as loss_fn(outputs, targets) -> (total, dict).

    outputs: dict of (B, N, *) predictions.
    targets: dict of padded (B, M, *) ground truth + gt_mask (B, M).

    Two modes, mirroring the reference Loss (loss.py:376-564):
     - with an anassigner (default): Hungarian matching + SetCriterion;
     - without: the configured per-name losses are applied directly
       between each prediction tensor and its gt_ counterpart (requires
       N == M, i.e. dense targets).
    """

    def __init__(self,
                 loss_weights: Dict[str, float],
                 giou_weight: float = 1.0,
                 reduction: str = "mean",
                 use_assigner: bool = True,
                 losses: Dict[str, str] = None,
                 loss_inputs: Dict[str, Any] = None,
                 cost_dtype: str = None):
        if reduction not in {"none", "mean", "sum"}:
            raise ValueError(f"Invalid reduction: {reduction}")
        self.loss_weights = dict(loss_weights)
        self.giou_weight = giou_weight
        self.reduction = reduction
        self.use_assigner = use_assigner
        self.losses = dict(losses or {})
        self.loss_inputs = dict(loss_inputs or {})
        # train.cost_dtype (e.g. 'bfloat16'): dtype of the MATCHING cost
        # matrix only. Matching is rank-based — the solve needs cost ORDER,
        # not precision — and the cost build (exact GIoU clipping over
        # 400x64 pairs/sample) dominates the matcher program; the loss
        # terms themselves always stay float32. Assignment-equality
        # evidence: scripts/probe_cost_bf16.py.
        self.cost_dtype = jnp.dtype(cost_dtype) if cost_dtype else None
        for name in self.losses.values():
            if name not in _PLAIN_LOSSES:
                raise ValueError(f"Unknown loss: {name}")

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "Loss":
        return cls(
            loss_weights=config.get("loss_weights", {}),
            reduction=config.get("reduction", "mean"),
            use_assigner="anassigner" in config,
            losses=config.get("losses"),
            loss_inputs=config.get("loss_inputs"),
            cost_dtype=config.get("cost_dtype"),
        )

    def _per_sample_plain(self, out_s, tgt_s):
        mask = tgt_s["gt_mask"].astype(jnp.float32)
        losses = {}
        for name, fn_name in self.losses.items():
            keys = self.loss_inputs.get(name, [name])
            pred = jnp.concatenate([out_s[k] for k in keys], axis=-1)
            gt = jnp.concatenate([tgt_s[f"gt_{k}"] for k in keys], axis=-1)
            if fn_name == "GIoULoss":
                losses[name] = giou_loss_boxes(pred, gt, mask)
            else:
                losses[name] = _PLAIN_LOSSES[fn_name](pred, gt, mask)
        return losses

    def match(self, outputs: Dict[str, jnp.ndarray],
              targets: Dict[str, jnp.ndarray]
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Batched Hungarian matching: (B, M) index_i / index_j.

        Exposed separately for the trainer's OPT-IN hoisted structure
        (train.hoist_matcher) and for evaluation tooling. Historical note:
        hoisting used to be mandatory — pre-warm-start JV while loops ran
        ~1000x slower per iteration inside the large fused step executable
        (550 ms of a 575 ms backward) — but the LAPJV row-reduction warm
        start (ops/hungarian.py) collapsed the loops to ~0 iterations and
        the embedded-matcher monolith now BEATS the hoisted structure
        (292.8 vs 379.9 ms at flagship B=4; probe_step_structures.py), so
        the trainer embeds by default. See CentralizedTrainer._make_steps.
        """
        def per_sample(out_s, tgt_s):
            sg = jax.lax.stop_gradient
            cost = self._build_cost(sg(out_s), sg(tgt_s))
            return assigner_lib.hungarian_assign(cost, tgt_s["gt_mask"])

        targets = {k: v for k, v in targets.items() if k != "sample_mask"}
        return jax.vmap(per_sample)(outputs, targets)

    def _build_cost(self, out_s, tgt_s):
        """Unbatched matching cost, optionally in reduced precision
        (cost_dtype); the solver consumes float32 either way."""
        if self.cost_dtype is not None:
            cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda x: x.astype(self.cost_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
            out_s, tgt_s = cast(out_s), cast(tgt_s)
        cost = assigner_lib.cost_matrix(out_s, tgt_s, self.loss_weights,
                                        self.giou_weight)
        return cost.astype(jnp.float32)

    def __call__(self, outputs: Dict[str, jnp.ndarray],
                 targets: Dict[str, jnp.ndarray],
                 indices: Tuple[jnp.ndarray, jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        weights = self.loss_weights

        # Padded tail-batch samples (loader pad_last policy) are weighted
        # out of every loss term and out of the 'mean' denominator.
        targets = dict(targets)
        sample_mask = targets.pop("sample_mask", None)

        def per_sample(out_s, tgt_s, idx=None):
            nonempty = jnp.any(tgt_s["gt_mask"]).astype(jnp.float32)
            if self.use_assigner:
                if idx is None:
                    # Matching is a no-grad region (reference
                    # assigner.py:89, torch.no_grad). stop_gradient is
                    # also required for numerical safety: the GIoU cost
                    # path contains norms/arctan2 of degenerate (padded)
                    # boxes whose backward is NaN, and NaN * 0-cotangent
                    # would poison the gradients.
                    sg = jax.lax.stop_gradient
                    cost = self._build_cost(sg(out_s), sg(tgt_s))
                    i, j = assigner_lib.hungarian_assign(cost,
                                                         tgt_s["gt_mask"])
                else:
                    i, j = idx
                losses = _sample_set_criterion(out_s, tgt_s, i, j)
            else:
                losses = self._per_sample_plain(out_s, tgt_s)
            # Empty samples contribute exactly zero (reference
            # loss.py:514-519).
            return {
                k: losses.get(k, jnp.float32(0.0)) * w * nonempty
                for k, w in weights.items()
            }

        if indices is not None:
            batch_losses = jax.vmap(
                lambda o, t, i, j: per_sample(o, t, (i, j)))(
                    outputs, targets, indices[0], indices[1])
        else:
            batch_losses = jax.vmap(per_sample)(outputs, targets)

        if sample_mask is not None:
            sm = jnp.asarray(sample_mask, jnp.float32)
            batch_losses = {k: v * sm for k, v in batch_losses.items()}
            denom = jnp.maximum(jnp.sum(sm), 1.0)
            if self.reduction == "mean":
                batch_losses = {k: jnp.sum(v) / denom
                                for k, v in batch_losses.items()}
            elif self.reduction == "sum":
                batch_losses = {k: jnp.sum(v)
                                for k, v in batch_losses.items()}
        elif self.reduction == "mean":
            batch_losses = {k: jnp.mean(v) for k, v in batch_losses.items()}
        elif self.reduction == "sum":
            batch_losses = {k: jnp.sum(v) for k, v in batch_losses.items()}

        total = jnp.sum(jnp.stack(list(batch_losses.values())), axis=0)
        return total, batch_losses


def build_loss(config: Dict[str, Any]) -> Loss:
    """Builds the loss from a config['train'] section (reference loss.py:584)."""
    return Loss.from_config(config)
