"""End-to-end LEARNING-SIGNAL evidence: overfitting the synthetic fixture
must align the full stack — Hungarian matcher -> set loss -> gradients ->
decoded boxes.

test_e2e pins that the loss decreases; this pins the stronger property
that the matched queries actually CONVERGE to their assigned ground
truth: centers within meters of targets ~20-47 m away (a sign or
indexing error anywhere in matcher/loss/projection would keep them near
the reference points), the foreground class wins on matched queries, the
angle sin/cos converge — and that the resulting boxes have REAL 3D
overlap (mAP3D > 0.5 at IoU 0.5), the strongest offline proxy for the
published 56.1 AP3D target available without the K-Radar dataset.

The 3D-overlap assertion relies on the head's size_bias_prior, the
documented DEFAULT since round 4 (models/heads/detection.py): the
reference head's ReLU size activation lets l/w units die permanently at
tiny-fixture scale. Round-4 sweep evidence (/tmp-reproducible via this
file's helper): WITHOUT the prior, lr 3e-3/80ep, 1e-3/200ep, and
3e-4/400ep all converge centers (<6 m), class, and height, but the l/w
units emit exactly 0 for every query (dead ReLU), flooring mAP3D at 0 —
the schedule cannot rescue them, so the prior is promoted to default
rather than tuned around.

Two variants run: single-class (two Sedans) and TWO-CLASS (Sedan +
"Bus or Truck", num_classes=3), the latter exercising the metric's
per-class selection logic (reference metric.py:143-151) end-to-end under
training — measured two-class overfit reaches mAP 1.0 with on-class
GIoU ~0.77 (reported mGIoU -0.11: the reference's off-class -1 columns
cap two-class mGIoU at <= 0 by construction, see the in-test note).
"""

import glob
import os
import os.path as osp

import numpy as np
import pytest

from kradar_fixture import SEQ, base_config, make_raw_kradar
from test_e2e import small_model_config

pytestmark = pytest.mark.slow

EPOCHS = int(os.environ.get("OVERFIT_EPOCHS", 80))


def _write_boxes(src: str, two_class: bool) -> None:
    """Rewrites every fixture label with two LARGE in-FoV boxes (the
    processor doubles l/w/h, so 3x2x1 here is a 6x4x2 m box)."""
    for path in glob.glob(osp.join(src, SEQ, "info_label_v2", "*.txt")):
        with open(path) as f:
            header = f.readline()
        with open(path, "w") as f:
            f.write(header)
            f.write("*, 0, Sedan, 20.0, 1.0, 0.5, 0.0, 3.0, 2.0, 1.0\n")
            if two_class:
                f.write("*, 1, Bus or Truck, 45.0, -2.0, 0.2, 5.0, "
                        "4.0, 2.5, 1.5\n")
            else:
                f.write("*, 1, Sedan, 45.0, -2.0, 0.2, 5.0, 3.0, 2.0, "
                        "1.0\n")


def _overfit(tmp_path, two_class: bool):
    import jax
    import jax.numpy as jnp

    from dpft_tpu.data import init as init_dataset
    from dpft_tpu.data import load as load_dataset
    from dpft_tpu.data import prepare as prepare_dataset
    from dpft_tpu.evaluation.metric import build_metric
    from dpft_tpu.models import build as build_model
    from dpft_tpu.training.loss import build_loss
    from dpft_tpu.training.trainer import build_trainer
    from dpft_tpu.utils.misc import set_seed

    root = str(tmp_path)
    src = make_raw_kradar(root)
    _write_boxes(src, two_class)
    processed = osp.join(root, "processed")

    config = small_model_config(base_config())
    config["train"]["epochs"] = EPOCHS
    config["train"]["optimizer"]["lr"] = 3e-3
    config["train"]["loss_weights"] = {
        "total_class": 2.0, "object_class": 1.0,
        "center": 1.0, "size": 1.0, "angle": 1.0}
    if two_class:
        config["data"]["num_classes"] = 3
        config["model"]["head"]["num_classes"] = 3
        # The fixture's category map, like the reference single-class
        # config, maps every non-Sedan category to -1 — which the
        # processor DROPS at ETL (reference category -1 quirk). Without
        # this override the Bus boxes never reach training and the
        # class-2 assertions below are unsatisfiable.
        config["data"]["categories"]["Bus or Truck"] = 1
    # Skip the per-step metric (reference `evaluating` knob): metrics are
    # checked once below, and dropping them keeps the overfit affordable.
    config["train"]["evaluating"] = -1

    prepare_dataset("kradar", config).prepare(src, processed)
    rng = set_seed(config["computing"]["seed"])

    train_ds = init_dataset("kradar", src=processed, split="train",
                            config=config)
    train_loader = load_dataset(train_ds, config=config)
    model = build_model("dprt", config)
    trainer = build_trainer(config)
    out = trainer(model, train_loader, timestamp="overfit",
                  dst=osp.join(root, "log"), rng=rng)

    history = out["history"]
    assert all(np.isfinite(history)), history
    assert history[-1] < 0.5 * history[0], (history[0], history[-1])

    state = out["state"]
    batch, targets = next(iter(load_dataset(train_ds, config=config,
                                            shuffle=False)))
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    jt = jax.tree_util.tree_map(jnp.asarray, targets)
    variables = {"params": state["params"]}
    if "batch_stats" in state:
        variables["batch_stats"] = state["batch_stats"]
    pred = model.apply(variables, jb, train=False)

    loss_fn = build_loss(config["train"])
    qi, gj = (np.asarray(a) for a in loss_fn.match(pred, jt))

    # ---- Matched-query convergence on the training batch.
    center = np.asarray(pred["center"])
    angle = np.asarray(pred["angle"])
    size = np.asarray(pred["size"])
    cls = np.asarray(pred["class"])
    seen_classes = set()
    for b in range(center.shape[0]):
        real = np.asarray(targets["gt_mask"][b])
        n_real = int(real.sum())
        gt_c = np.asarray(targets["gt_center"][b])
        gt_a = np.asarray(targets["gt_angle"][b])
        gt_cls = np.asarray(targets["gt_class"][b])
        for k in range(n_real):
            q, g = int(qi[b, k]), int(gj[b, k])
            # Center converged to its assigned GT, 20-47 m from origin.
            err = np.linalg.norm(center[b, q] - gt_c[g])
            assert err < 2.0, (b, k, center[b, q], gt_c[g])
            # The right foreground class wins on the matched query.
            assert cls[b, q].argmax() == gt_cls[g].argmax(), cls[b, q]
            seen_classes.add(int(gt_cls[g].argmax()))
            # sin/cos angle encoding converged.
            assert np.abs(angle[b, q] - gt_a[g]).max() < 0.3
            # Height grew toward its ~2 m target.
            assert size[b, q, 2] > 1.0, size[b, q]
    if two_class:
        assert seen_classes == {1, 2}, seen_classes

    # ---- 3D-overlap evidence under the DEFAULT head config: mAP3D
    # counts a TP only above IoU3D > 0.5 (metric.py), so a nonzero value
    # certifies real center+size+angle box quality, not just
    # per-component convergence.
    metric = build_metric(config.get("evaluate", {}))
    m = {k: float(v) for k, v in metric(pred, jt).items()}
    for k, v in m.items():
        assert np.isfinite(v), (k, v)
    assert m["mAP"] > 0.5, m
    if two_class:
        # Reference quirk (metric.py off-class columns): each class's
        # GIoU mean runs over ALL real target columns with off-class
        # ones pinned to -1, so with one on-class target out of two the
        # per-class ceiling is (g - 1) / 2 <= 0 even at perfect overlap.
        # mGIoU > -0.2 therefore certifies on-class GIoU g > 0.6
        # (measured: -0.114 => g ~ 0.77 alongside mAP 1.0).
        assert m["mGIoU"] > -0.2, m
    else:
        assert m["mGIoU"] > 0.0, m


def test_overfit_matched_queries_converge(tmp_path):
    _overfit(tmp_path, two_class=False)


def test_overfit_two_class_metrics(tmp_path):
    """Class selection in mAP3D (reference metric.py:143-151) exercised
    end-to-end under training: Sedan + Bus-or-Truck, num_classes=3."""
    _overfit(tmp_path, two_class=True)
