"""Loss tests: parity with a direct transliteration of the reference math."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from dpft_tpu.ops.boxes import get_box_corners
from dpft_tpu.ops.iou import giou3d
from dpft_tpu.training.loss import Loss, binary_cross_entropy_with_logits, focal_loss
from dpft_tpu.training.scheduler import build_scheduler
from dpft_tpu.training.optimizer import build_optimizer

pytestmark = pytest.mark.slow

WEIGHTS = {"total_class": 1.0, "object_class": 0.0, "center": 1.0,
           "size": 1.0, "angle": 1.0}


def np_focal(inputs, targets, alpha=0.75, gamma=2.0):
    """Reference focal loss transliterated (loss.py:17-60): p_t from logits."""
    ce = np.maximum(inputs, 0) - inputs * targets + np.log1p(np.exp(-np.abs(inputs)))
    p_t = inputs * targets + (1 - inputs) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return alpha_t * loss


def np_reference_loss(outputs, targets_list, weights):
    """Transliteration of reference Loss.forward (loss.py:486-564):
    per-sample loop, scipy Hungarian, SetCriterion, mean over batch."""
    B = outputs["class"].shape[0]
    batch = []
    for b in range(B):
        out = {k: v[b] for k, v in outputs.items()}
        tgt = targets_list[b]
        M = tgt["gt_class"].shape[0]
        if M == 0:
            batch.append({k: 0.0 for k in weights})
            continue

        # Cost matrix (assigner.py:110-132)
        gt_ids = np.argmax(tgt["gt_class"], -1)
        cost = -out["class"][:, gt_ids]
        for key in ("center", "size", "angle"):
            a, g = out[key], tgt[f"gt_{key}"]
            cost = cost + weights[key if key != "class" else "total_class"] * 0
        cost_center = np.abs(out["center"][:, None] - tgt["gt_center"][None]).sum(-1)
        cost_size = np.abs(out["size"][:, None] - tgt["gt_size"][None]).sum(-1)
        cost_angle = np.abs(out["angle"][:, None] - tgt["gt_angle"][None]).sum(-1)
        oy = np.arctan2(out["angle"][:, 0], out["angle"][:, 1])
        gy = np.arctan2(tgt["gt_angle"][:, 0], tgt["gt_angle"][:, 1])
        oc = np.asarray(get_box_corners(jnp.array(out["center"][None]),
                                        jnp.array(out["size"][None]),
                                        jnp.array(oy[None]))[0])
        gc = np.asarray(get_box_corners(jnp.array(tgt["gt_center"][None]),
                                        jnp.array(tgt["gt_size"][None]),
                                        jnp.array(gy[None]))[0])
        cost_giou = -np.asarray(giou3d(jnp.array(oc), jnp.array(gc)))
        C = (weights["total_class"] * cost + weights["center"] * cost_center
             + weights["size"] * cost_size + weights["angle"] * cost_angle
             + 1.0 * cost_giou)
        i, j = linear_sum_assignment(C)

        N, Cc = out["class"].shape
        losses = {}
        # total_class (loss.py:271-317)
        canvas = np.zeros((N, Cc))
        canvas[:, 0] = 1.0
        canvas[i] = tgt["gt_class"][j]
        tot = np_focal(out["class"], canvas)
        losses["total_class"] = tot.mean(axis=0).sum() / M * N
        # object_class (loss.py:234-269)
        obj = np_focal(out["class"][i], tgt["gt_class"][j])
        losses["object_class"] = obj.mean(axis=0).sum() / M * N
        # l1 (loss.py:319-342)
        for key in ("center", "size", "angle"):
            losses[key] = np.abs(out[key][i] - tgt[f"gt_{key}"][j]).mean()
        batch.append({k: losses[k] * w for k, w in weights.items()})

    reduced = {k: np.mean([s[k] for s in batch]) for k in weights}
    total = sum(reduced.values())
    return total, reduced


def make_random_problem(rng, B=3, N=25, M_max=6, C=3, counts=None):
    outputs = {
        "class": rng.normal(size=(B, N, C)).astype(np.float32),
        "center": rng.uniform(-5, 5, size=(B, N, 3)).astype(np.float32),
        "size": rng.uniform(0.5, 3, size=(B, N, 3)).astype(np.float32),
        "angle": rng.uniform(-1, 1, size=(B, N, 2)).astype(np.float32),
    }
    counts = counts if counts is not None else rng.integers(1, M_max + 1, B)
    targets_list = []
    padded = {
        "gt_class": np.zeros((B, M_max, C), np.float32),
        "gt_center": np.zeros((B, M_max, 3), np.float32),
        "gt_size": np.zeros((B, M_max, 3), np.float32),
        "gt_angle": np.zeros((B, M_max, 2), np.float32),
        "gt_mask": np.zeros((B, M_max), bool),
    }
    padded["gt_class"][:, :, 0] = 1.0  # pads are background one-hot
    for b in range(B):
        m = int(counts[b])
        cls = np.zeros((m, C), np.float32)
        cls[np.arange(m), rng.integers(1, C, m)] = 1.0
        tgt = {
            "gt_class": cls,
            "gt_center": rng.uniform(-5, 5, size=(m, 3)).astype(np.float32),
            "gt_size": rng.uniform(0.5, 3, size=(m, 3)).astype(np.float32),
        }
        ang = rng.uniform(-np.pi, np.pi, m).astype(np.float32)
        tgt["gt_angle"] = np.stack([np.sin(ang), np.cos(ang)], -1)
        targets_list.append(tgt)
        if m:
            padded["gt_class"][b, :m] = cls
            padded["gt_center"][b, :m] = tgt["gt_center"]
            padded["gt_size"][b, :m] = tgt["gt_size"]
            padded["gt_angle"][b, :m] = tgt["gt_angle"]
            padded["gt_mask"][b, :m] = True
    return outputs, targets_list, padded


def test_focal_loss_matches_reference_formula(rng):
    x = rng.normal(size=(4, 5)).astype(np.float32)
    t = (rng.uniform(size=(4, 5)) > 0.5).astype(np.float32)
    got = np.asarray(focal_loss(jnp.array(x), jnp.array(t)))
    want = np_focal(x, t)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bce_with_logits_stable():
    x = jnp.array([100.0, -100.0, 0.0])
    t = jnp.array([1.0, 0.0, 0.5])
    out = np.asarray(binary_cross_entropy_with_logits(x, t))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[:2], [0.0, 0.0], atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_loss_matches_reference_transliteration(seed):
    rng = np.random.default_rng(seed)
    outputs, targets_list, padded = make_random_problem(rng)
    loss_fn = Loss(loss_weights=WEIGHTS)
    total, losses = loss_fn(
        {k: jnp.array(v) for k, v in outputs.items()},
        {k: jnp.array(v) for k, v in padded.items()})
    want_total, want_losses = np_reference_loss(outputs, targets_list, WEIGHTS)
    for k in WEIGHTS:
        assert abs(float(losses[k]) - want_losses[k]) < 2e-3, (
            k, float(losses[k]), want_losses[k])
    assert abs(float(total) - want_total) < 5e-3


def test_loss_empty_sample_is_zero(rng):
    outputs, _, padded = make_random_problem(rng, B=2, counts=[0, 3])
    padded["gt_mask"][0] = False
    loss_fn = Loss(loss_weights=WEIGHTS)
    total, _ = loss_fn(
        {k: jnp.array(v) for k, v in outputs.items()},
        {k: jnp.array(v) for k, v in padded.items()})
    # Sample 0 contributes zero; total is half of the sample-1-only loss sum.
    outputs1 = {k: v[1:] for k, v in outputs.items()}
    padded1 = {k: v[1:] for k, v in padded.items()}
    total1, _ = loss_fn(
        {k: jnp.array(v) for k, v in outputs1.items()},
        {k: jnp.array(v) for k, v in padded1.items()})
    assert abs(float(total) - float(total1) / 2) < 1e-4


def test_scheduler_factors():
    const = build_scheduler("ConstantLR", factor=0.5, total_iters=3)
    assert float(const(0)) == 0.5 and float(const(3)) == 1.0
    step = build_scheduler("StepLR", step_size=2, gamma=0.1)
    assert abs(float(step(4)) - 0.01) < 1e-9
    multi = build_scheduler("MultiStepLR", milestones=[2, 4], gamma=0.5)
    assert float(multi(1)) == 1.0 and float(multi(5)) == 0.25
    seq = build_scheduler("SequentialLR",
                          schedulers=[{"name": "ConstantLR", "factor": 0.1,
                                       "total_iters": 100},
                                      {"name": "ConstantLR", "factor": 0.7,
                                       "total_iters": 100}],
                          milestones=[5])
    assert abs(float(seq(0)) - 0.1) < 1e-6
    assert abs(float(seq(6)) - 0.7) < 1e-6


def test_optimizer_factory():
    fac = build_optimizer("AdamW", lr=1e-4)
    assert fac.base_lr == 1e-4
    tx = fac(1e-4)
    import optax
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones(3)}, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_cost_dtype_bf16_assignment(rng):
    """train.cost_dtype='bfloat16' builds the MATCHING cost in bf16;
    matching is rank-based, so on separated boxes the assignment equals
    the f32 one (the loss terms themselves always stay float32)."""
    B, N, M, C = 2, 12, 4, 2
    out = {
        "class": rng.normal(0, 2, (B, N, C)).astype(np.float32),
        "center": rng.uniform(5, 60, (B, N, 3)).astype(np.float32),
        "size": rng.uniform(0.5, 4, (B, N, 3)).astype(np.float32),
        "angle": rng.normal(0, 1, (B, N, 2)).astype(np.float32),
    }
    # Targets at a few of the predicted centers: unambiguous optimum.
    tgt = {
        "gt_class": np.zeros((B, M, C), np.float32),
        "gt_center": out["center"][:, :M] + 0.1,
        "gt_size": out["size"][:, :M],
        "gt_angle": np.stack([np.zeros((B, M)), np.ones((B, M))],
                             -1).astype(np.float32),
        "gt_mask": np.ones((B, M), bool),
    }
    tgt["gt_class"][..., 1] = 1.0

    def match_with(dtype):
        loss = Loss(loss_weights=WEIGHTS, use_assigner=True,
                    cost_dtype=dtype)
        i, j = loss.match({k: jnp.array(v) for k, v in out.items()},
                          {k: jnp.array(v) for k, v in tgt.items()})
        return np.asarray(i), np.asarray(j)

    (i32, j32), (i16, j16) = match_with(None), match_with("bfloat16")
    np.testing.assert_array_equal(i32, i16)
    np.testing.assert_array_equal(j32, j16)
    # And the config key plumbs through from_config.
    built = Loss.from_config({"loss_weights": WEIGHTS,
                              "anassigner": {"name": "HungarianAnassigner"},
                              "cost_dtype": "bfloat16"})
    assert built.cost_dtype == jnp.bfloat16
