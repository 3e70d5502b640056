"""Backbone family tests: ConvNeXt, RegNet, Swin shape contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpft_tpu.models.backbones import build_backbone

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name,dims", [
    ("convnext_tiny", (96, 192, 384, 768)),
])
def test_convnext_shapes(name, dims):
    m = build_backbone(name, {"in_channels": 6, "multi_scale": 4})
    x = jnp.zeros((1, 64, 64, 6))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert set(out) == {"1", "2", "3", "4"}
    # stride 4 stem then /2 per stage
    assert out["1"].shape == (1, 16, 16, dims[0])
    assert out["4"].shape == (1, 2, 2, dims[3])
    assert np.all(np.isfinite(np.asarray(out["4"])))


def test_regnet_shapes():
    m = build_backbone("regnet_y_400mf", {"multi_scale": 4})
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert out["1"].shape == (1, 16, 16, 48)
    assert out["4"].shape == (1, 2, 2, 440)


def test_regnet_train_mode_updates_stats():
    m = build_backbone("regnet_x_400mf", {"multi_scale": 2})
    x = jnp.ones((2, 32, 32, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out, updates = m.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in updates


def test_swin_shapes():
    m = build_backbone("swin_t", {"multi_scale": 4})
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 56, 56, 3)),
                    jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert out["1"].shape == (1, 14, 14, 96)
    assert out["2"].shape == (1, 7, 7, 192)
    assert out["3"].shape == (1, 4, 4, 384)  # ceil(7/2) after pad-merge
    assert out["4"].shape == (1, 2, 2, 768)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_swin_nondivisible_input():
    # 18x10 is not window (7) aligned: padding paths must engage.
    m = build_backbone("swin_t", {"in_channels": 6, "multi_scale": 2})
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 72, 40, 6)),
                    jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert out["1"].shape == (1, 18, 10, 96)
    assert out["2"].shape == (1, 9, 5, 192)
    assert np.all(np.isfinite(np.asarray(out["2"])))
