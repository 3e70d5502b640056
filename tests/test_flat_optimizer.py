"""train.flat_optimizer: ravelled optimizer state, bitwise-equal updates."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from dpft_tpu.parallel import create_mesh
from dpft_tpu.training.loss import Loss
from dpft_tpu.training.optimizer import build_optimizer, wrap_accumulation
from dpft_tpu.training.trainer import CentralizedTrainer


class Toy(nn.Module):
    @nn.compact
    def __call__(self, batch, train=False):
        h = nn.Dense(7)(batch["x"])
        return {"center": nn.Dense(3, use_bias=False)(h)}


def _loss():
    return Loss(loss_weights={"center": 1.0}, use_assigner=False,
                losses={"center": "L1Loss"},
                loss_inputs={"center": ["center"]})


def _run_steps(config, n=3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 5, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(4, 5, 3)), jnp.float32)
    targets = {"gt_center": y, "gt_mask": jnp.ones((4, 5), bool)}

    model = Toy()
    variables = model.init(jax.random.PRNGKey(0), {"x": x})
    tx = wrap_accumulation(build_optimizer("AdamW", lr=1e-2)(1e-2), config)
    trainer = CentralizedTrainer(loss=_loss(), config=config)
    step, _ = trainer._make_steps(model, tx, create_mesh(data=1))

    state = {"params": variables["params"],
             "opt_state": tx.init(variables["params"]),
             "step": jnp.zeros((), jnp.int32)}
    n_buffers = len(jax.tree_util.tree_leaves(state["opt_state"]))
    for _ in range(n):
        state, *_ = step(state, {"x": x}, targets, jax.random.PRNGKey(1))
    return state, n_buffers


def test_flat_equals_tree_bitwise():
    tree_state, n_tree = _run_steps({"train": {}})
    flat_state, n_flat = _run_steps({"train": {"flat_optimizer": True}})

    # AdamW is elementwise, so packing the moments into one ravelled
    # buffer must not change a single bit of the parameters.
    for a, b in zip(jax.tree_util.tree_leaves(tree_state["params"]),
                    jax.tree_util.tree_leaves(flat_state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # The point of the option: far fewer optimizer-state buffers.
    # Toy has 3 param arrays -> tree AdamW keeps 2 moments each (+count);
    # flat keeps 2 ravelled moments (+count).
    assert n_flat < n_tree


def test_flat_rejected_with_tensor_parallel():
    model = Toy()
    loader = _dummy_loader()
    variables = model.init(jax.random.PRNGKey(0),
                           jax.tree_util.tree_map(jnp.asarray, loader[0][0]))
    trainer = CentralizedTrainer(
        loss=_loss(), optimizer=build_optimizer("AdamW", lr=1e-2),
        config={"train": {"flat_optimizer": True},
                "computing": {"model_parallel": 2}})
    with pytest.raises(ValueError, match="flat_optimizer"):
        trainer(model, loader, variables=variables)


def _dummy_loader():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 3)).astype(np.float32)
    y = rng.normal(size=(2, 5, 3)).astype(np.float32)
    return [({"x": x}, {"gt_center": y, "gt_mask": np.ones((2, 5), bool)})]
