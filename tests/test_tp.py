"""Tensor-parallel ('model' axis) sharding: spec rules + numerical
equivalence of a DP x TP step with the single-device step."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from dpft_tpu.parallel import (create_mesh, place_tensor_parallel,
                               tp_spec_for_shape)

pytestmark = pytest.mark.slow


def test_tp_spec_rules():
    # Largest divisible dim is sharded, later dims win ties.
    assert tp_spec_for_shape((16, 32), 2) == P(None, "model")
    assert tp_spec_for_shape((64, 32), 2) == P("model", None)
    assert tp_spec_for_shape((32, 32), 2) == P(None, "model")
    # Conv kernel (kh, kw, cin, cout): cout wins.
    assert tp_spec_for_shape((3, 3, 64, 128), 2) == P(None, None, None,
                                                      "model")
    # Indivisible / low-rank leaves stay replicated.
    assert tp_spec_for_shape((7, 5), 2) == P()
    assert tp_spec_for_shape((128,), 2) == P()
    assert tp_spec_for_shape((), 2) == P()
    assert tp_spec_for_shape((16, 32), 1) == P()


def test_place_tensor_parallel_shards_kernels():
    mesh = create_mesh(data=2, model=2)
    tree = {
        "kernel": jnp.zeros((8, 128)),
        "bias": jnp.zeros((128,)),
        "step": jnp.zeros((), jnp.int32),
    }
    placed = place_tensor_parallel(tree, mesh)
    assert placed["kernel"].sharding.spec == P(None, "model")
    assert placed["bias"].sharding.spec == P()
    # Per-device shard of the kernel holds half the columns.
    shard = placed["kernel"].addressable_shards[0]
    assert shard.data.shape == (8, 64)
    assert placed["step"].sharding.spec == P()


def test_tp_step_equals_single_device():
    """(data=2, model=2) train step == single-device step numerically."""
    from __graft_entry__ import _example_batch, _example_targets
    from dpft_tpu.models import build
    from dpft_tpu.training.trainer import CentralizedTrainer, _to_jnp
    from dpft_tpu.utils.config import load_config

    config = load_config("config/kradar.json")
    for v in config["model"]["backbones"].values():
        v["name"] = "ResNet18"
        v["weights"] = ""
    for v in config["model"]["necks"].values():
        v["in_channels_list"] = [v["in_channels_list"][0], 64, 128, 256, 512]
    config["model"]["fuser"]["i_iter"] = 1
    config["model"]["fuser"]["n_queries"] = 16
    config["model"]["querent"]["resolution"] = [4, 4, 1]
    config["data"]["max_boxes"] = 8
    config["train"]["evaluating"] = -1  # skip per-step metric (speed)

    model = build(config["model"]["name"], config)
    batch = _example_batch(config, B=2, cam_hw=(64, 64), bev_hw=(32, 16),
                           front_hw=(16, 16))
    targets = _example_targets(config, B=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    trainer = CentralizedTrainer.from_config(config)
    tx = trainer.optimizer_factory(1e-3)

    def make_state():
        fresh = jax.tree_util.tree_map(jnp.copy, variables)
        return {
            "params": fresh["params"],
            "batch_stats": fresh["batch_stats"],
            "opt_state": tx.init(fresh["params"]),
            "step": jnp.zeros((), jnp.int32),
        }

    results = {}
    for name, mesh in [("single", create_mesh(data=1)),
                       ("dp2tp2", create_mesh(data=2, model=2))]:
        train_step, _ = trainer._make_steps(model, tx, mesh)
        state = train_step.place_state(make_state())
        if name == "dp2tp2":
            # The placement actually sharded at least one large kernel.
            leaves = jax.tree_util.tree_leaves(state["params"])
            assert any(
                any(ax == "model" for ax in (x.sharding.spec or ()) if ax)
                for x in leaves if hasattr(x, "sharding")), \
                "no parameter was sharded over the model axis"
        state, total, losses, _ = train_step(
            state, batch, targets, jax.random.PRNGKey(1))
        results[name] = (float(total),
                         jax.tree_util.tree_map(np.asarray, state["params"]))

    assert np.isfinite(results["single"][0])
    assert abs(results["single"][0] - results["dp2tp2"][0]) < 1e-3
    flat_s = jax.tree_util.tree_leaves(results["single"][1])
    flat_t = jax.tree_util.tree_leaves(results["dp2tp2"][1])
    for a, b in zip(flat_s, flat_t):
        np.testing.assert_allclose(a, b, atol=5e-3)
