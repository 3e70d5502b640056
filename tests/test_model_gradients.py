"""Full-model gradient health (regression for the where-NaN trap in the
camera-view reference-point projection)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from dpft_tpu.models import build
from dpft_tpu.training.loss import build_loss
from dpft_tpu.utils.config import load_config

import sys
import os.path as osp
sys.path.insert(0, osp.dirname(__file__))
sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
from __graft_entry__ import _example_batch, _example_targets  # noqa: E402

pytestmark = pytest.mark.slow


def test_full_model_loss_gradients_finite():
    config = load_config("config/kradar.json")
    for v in config["model"]["backbones"].values():
        v["name"] = "ResNet18"
    for v in config["model"]["necks"].values():
        v["in_channels_list"] = [v["in_channels_list"][0], 64, 128, 256, 512]
    config["model"]["fuser"]["i_iter"] = 2
    config["model"]["fuser"]["n_queries"] = 16
    config["model"]["querent"]["resolution"] = [4, 4, 1]
    config["data"]["max_boxes"] = 8

    model = build("dprt", config)
    batch = _example_batch(config, B=2, cam_hw=(64, 64), bev_hw=(32, 16),
                           front_hw=(16, 16))
    targets = _example_targets(config, B=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    loss_fn = build_loss(config["train"])

    def f(p):
        out = model.apply({**variables, "params": p}, batch, train=False)
        return loss_fn(out, targets)[0]

    value, grads = jax.value_and_grad(f)(variables["params"])
    assert np.isfinite(float(value))
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    bad = [jax.tree_util.keystr(k) for k, x in flat
           if not bool(jnp.all(jnp.isfinite(x)))]
    assert not bad, f"non-finite grads: {bad[:5]}"
    # The camera backbone must receive signal through the fusion decoder.
    cam = grads["backbones_camera_mono"]
    total = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(cam))
    assert total > 0
