"""Model stack tests: submodule shapes, full config build, jitted forward."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpft_tpu.models import build
from dpft_tpu.models.backbones.resnet import ResNetBackbone
from dpft_tpu.models.embeddings.sinusoidal import sinusoidal_embed_2d
from dpft_tpu.models.heads.detection import LinearDetectionHead
from dpft_tpu.models.necks.fpn import FPN, nearest_resize
from dpft_tpu.models.queries.data_agnostic import DataAgnosticStaticQueries
from dpft_tpu.utils.config import load_config

pytestmark = pytest.mark.slow

CONFIG_DIR = "config"


def make_fusion_batch(config, B=1, cam_hw=(64, 64), bev_hw=(32, 16),
                      front_hw=(16, 16)):
    """Synthetic batch respecting the DPFT input contract, small shapes."""
    sizes = {"camera_mono": (*cam_hw, 3), "radar_bev": (*bev_hw, 6),
             "radar_front": (*front_hw, 6)}
    rng = np.random.default_rng(0)
    batch = {}
    for name in config["model"]["inputs"]:
        h, w, c = sizes[name]
        batch[name] = jnp.asarray(rng.normal(size=(B, h, w, c)),
                                  jnp.float32)
        batch[f"{name}_shape"] = jnp.tile(
            jnp.array([[h, w, c]], jnp.int32), (B, 1))
        if name.startswith("camera"):
            batch[f"label_to_{name}_t"] = jnp.zeros((B, 4, 4), jnp.float32)
            proj = np.eye(4, dtype=np.float32)[None].repeat(B, 0)
            proj[:, 0, 0] = 100.0
            proj[:, 1, 1] = 100.0
            batch[f"label_to_{name}_p"] = jnp.asarray(proj)
        else:
            t = np.eye(4, dtype=np.float32)[None].repeat(B, 0)
            batch[f"label_to_{name}_t"] = jnp.asarray(t)
            proj = np.zeros((B, 3, 4), np.float32)
            proj[:, 0, 1] = -1.0
            proj[:, 0, 3] = 53.0
            proj[:, 1, 0] = 2.0
            proj[:, 2, 3] = 1.0
            batch[f"label_to_{name}_p"] = jnp.asarray(proj)
    return batch


def test_resnet_shapes():
    m = ResNetBackbone(name_variant="resnet18", in_channels=6, multi_scale=4)
    x = jnp.zeros((1, 64, 64, 6))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert set(out) == {"1", "2", "3", "4"}
    assert out["1"].shape == (1, 16, 16, 64)
    assert out["4"].shape == (1, 2, 2, 512)


def test_resnet_bottleneck_channels():
    m = ResNetBackbone(name_variant="resnet50", in_channels=3, multi_scale=2)
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert set(out) == {"1", "2"}
    assert out["1"].shape[-1] == 256
    assert out["2"].shape[-1] == 512


def test_fpn_shapes():
    fpn = FPN(in_channels_list=(3, 8, 16), out_channels=4)
    feats = {"0": jnp.zeros((1, 32, 32, 3)), "1": jnp.zeros((1, 16, 16, 8)),
             "2": jnp.zeros((1, 8, 8, 16))}
    vars_ = fpn.init(jax.random.PRNGKey(0), feats)
    out = fpn.apply(vars_, feats)
    assert [v.shape for v in out.values()] == [
        (1, 32, 32, 4), (1, 16, 16, 4), (1, 8, 8, 4)]


def test_nearest_resize_matches_torch_semantics():
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 2, 2, 1)
    out = nearest_resize(x, 4, 4)
    want = np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])
    np.testing.assert_array_equal(np.asarray(out[0, :, :, 0]), want)


def test_sinusoidal_embedding_properties():
    x = jnp.zeros((2, 4, 6, 16))
    out = sinusoidal_embed_2d(x, num_feats=16, normalize=True)
    assert out.shape == x.shape
    # Same column -> same x encoding; embedding varies along rows.
    assert not np.allclose(out[0, 0], out[0, 1])
    assert np.allclose(out[0, :, 0], out[1, :, 0])  # batch-invariant


def test_data_agnostic_queries_kradar_layout():
    q = DataAgnosticStaticQueries(
        resolution=(20, 20, 1), minimum=(4, -50, 0), maximum=(72, 50, 0),
        transformation="spher2cart")
    out = q.apply({}, 2)
    center = out["center"]
    assert center.shape == (2, 400, 3)
    c = np.asarray(center[0])
    assert np.all(c[:, 2] == 0)  # zero elevation -> z = 0
    r = np.linalg.norm(c[:, :2], axis=1)
    assert abs(r.min() - 4) < 1e-4 and abs(r.max() - 72) < 1e-3


def test_detection_head_residual_center():
    head = LinearDetectionHead(in_channels=8, num_classes=2,
                               num_reg_layers=2, num_cls_layers=2)
    x = jnp.zeros((1, 5, 8))
    ref = {"center": jnp.full((1, 5, 3), 7.0)}
    vars_ = head.init(jax.random.PRNGKey(0), x, ref)
    out = head.apply(vars_, x, ref)
    assert out["class"].shape == (1, 5, 2)
    assert out["size"].shape == (1, 5, 3)
    assert out["angle"].shape == (1, 5, 2)
    # zero input + bias-free layers -> center == reference
    np.testing.assert_allclose(np.asarray(out["center"]), 7.0, atol=1e-6)
    assert float(jnp.min(out["size"])) >= 0.0  # ReLU
    assert float(jnp.max(jnp.abs(out["angle"]))) <= 1.0  # Tanh


def test_detection_head_size_bias_prior():
    """Documented default delta (round 4): the size output bias inits to
    a positive prior (1.0) so the ReLU l/w units start alive;
    size_bias_prior=None restores the exact bias-free reference init
    (config `size_bias_prior: null`)."""
    x = jnp.zeros((1, 5, 8))
    ref = {"center": jnp.zeros((1, 5, 3))}

    default = LinearDetectionHead(in_channels=8, num_classes=2,
                                  num_reg_layers=2, num_cls_layers=2)
    vars_default = default.init(jax.random.PRNGKey(0), x, ref)
    np.testing.assert_allclose(
        np.asarray(vars_default["params"]["size_head"]["out"]["bias"]), 1.0)

    parity = LinearDetectionHead(in_channels=8, num_classes=2,
                                 num_reg_layers=2, num_cls_layers=2,
                                 size_bias_prior=None)
    vars_parity = parity.init(jax.random.PRNGKey(0), x, ref)
    assert "bias" not in vars_parity["params"]["size_head"]["out"]

    prior = LinearDetectionHead(in_channels=8, num_classes=2,
                                num_reg_layers=2, num_cls_layers=2,
                                size_bias_prior=1.5)
    vars_prior = prior.init(jax.random.PRNGKey(0), x, ref)
    np.testing.assert_allclose(
        np.asarray(vars_prior["params"]["size_head"]["out"]["bias"]), 1.5)
    # Only the size output layer gains a bias; other branches untouched.
    assert "bias" not in vars_prior["params"]["center_head"]["out"]
    out = prior.apply(vars_prior, x, ref)
    # Zero input -> sizes start at the prior, alive under ReLU.
    np.testing.assert_allclose(np.asarray(out["size"]), 1.5, atol=1e-6)


@pytest.mark.parametrize("cfg_name", ["kradar_camera_mono.json", "kradar.json"])
def test_full_model_forward(cfg_name):
    config = load_config(f"{CONFIG_DIR}/{cfg_name}")
    # Shrink for test speed: resnet18 everywhere, fewer iterations.
    for k, v in config["model"]["backbones"].items():
        v["name"] = "ResNet18"
        v["weights"] = ""
    for k, v in config["model"]["necks"].items():
        v["in_channels_list"] = [v["in_channels_list"][0], 64, 128, 256, 512]
    config["model"]["fuser"]["i_iter"] = 2

    model = build(config["model"]["name"], config)
    batch = make_fusion_batch(config)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)

    n_q = config["model"]["fuser"]["n_queries"]
    assert out["class"].shape == (1, n_q, 2)
    assert out["center"].shape == (1, n_q, 3)
    assert out["size"].shape == (1, n_q, 3)
    assert out["angle"].shape == (1, n_q, 2)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_full_model_jit_and_train_mode():
    config = load_config(f"{CONFIG_DIR}/kradar_camera_mono.json")
    for k, v in config["model"]["backbones"].items():
        v["name"] = "ResNet18"
        v["weights"] = ""
    for k, v in config["model"]["necks"].items():
        v["in_channels_list"] = [v["in_channels_list"][0], 64, 128, 256, 512]
    config["model"]["fuser"]["i_iter"] = 1

    model = build("dprt", config)
    batch = make_fusion_batch(config)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
    out1 = fwd(variables, batch)
    out2 = fwd(variables, batch)
    np.testing.assert_allclose(np.asarray(out1["center"]),
                               np.asarray(out2["center"]))

    # Train mode: batch_stats must be mutable, dropout needs an rng.
    out, updates = model.apply(
        variables, batch, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert "batch_stats" in updates
