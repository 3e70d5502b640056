"""Weight converter test: synthetic torchvision-style ResNet18 state_dict
round-trips into the flax backbone and changes its output deterministically."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpft_tpu.models.backbones.resnet import ResNetBackbone
from dpft_tpu.models.backbones.torch_weights import convert_resnet

pytestmark = pytest.mark.slow


def synthetic_resnet18_state(rng):
    """Builds a state_dict with torchvision resnet18 key names/shapes."""
    state = {}

    def conv(name, o, i, k):
        state[f"{name}.weight"] = rng.normal(
            size=(o, i, k, k)).astype(np.float32) * 0.05

    def bn(name, c):
        state[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        state[f"{name}.bias"] = rng.normal(size=c).astype(np.float32) * 0.1
        state[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32)
        state[f"{name}.running_var"] = rng.uniform(0.5, 2, c).astype(np.float32)
        state[f"{name}.num_batches_tracked"] = np.int64(100)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    in_ch = 64
    for layer, w in enumerate(widths, start=1):
        for block in range(2):
            pre = f"layer{layer}.{block}"
            first_in = in_ch if block == 0 else w
            conv(f"{pre}.conv1", w, first_in, 3)
            bn(f"{pre}.bn1", w)
            conv(f"{pre}.conv2", w, w, 3)
            bn(f"{pre}.bn2", w)
            if block == 0 and first_in != w:
                conv(f"{pre}.downsample.0", w, first_in, 1)
                bn(f"{pre}.downsample.1", w)
        in_ch = w
    state["fc.weight"] = rng.normal(size=(1000, 512)).astype(np.float32)
    state["fc.bias"] = rng.normal(size=1000).astype(np.float32)
    return state


def test_convert_resnet18_shapes_and_apply(rng):
    state = synthetic_resnet18_state(rng)
    params, stats = convert_resnet(state)

    model = ResNetBackbone(name_variant="resnet18", in_channels=3,
                           multi_scale=4)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # Converted trees must exactly cover the model's parameter structure.
    ref_p = jax.tree_util.tree_map(np.shape, variables["params"])
    got_p = jax.tree_util.tree_map(np.shape, params)
    assert ref_p == got_p, "params structure mismatch"
    ref_s = jax.tree_util.tree_map(np.shape, variables["batch_stats"])
    got_s = jax.tree_util.tree_map(np.shape, stats)
    assert ref_s == got_s, "batch_stats structure mismatch"

    out_random = model.apply(variables, x, train=False)
    out_loaded = model.apply({"params": params, "batch_stats": stats}, x,
                             train=False)
    # Loaded weights produce different (but finite) activations.
    assert np.all(np.isfinite(np.asarray(out_loaded["4"])))
    assert not np.allclose(np.asarray(out_random["4"]),
                           np.asarray(out_loaded["4"]))


def test_convert_rejects_unknown_keys():
    with pytest.raises(ValueError):
        convert_resnet({"mystery.weight": np.zeros((1, 1, 1, 1))})
