"""Exact resume: train.save_optimizer checkpoints optimizer state + step.

The reference never checkpoints optimizer state (torch.save of the bare
module, reference trainer.py:256-258; resume restarts the optimizer,
SURVEY.md section 5). `train.save_optimizer: true` is the opt-in extension:
a resumed run continues with the exact AdamW moments / step count, so
split training runs produce the same parameters as one uninterrupted run.
"""

import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from dpft_tpu.training.loss import Loss
from dpft_tpu.training.trainer import CentralizedTrainer
from dpft_tpu.training.optimizer import build_optimizer
from dpft_tpu.training.scheduler import build_scheduler


class Toy(nn.Module):
    @nn.compact
    def __call__(self, batch, train=False):
        return {"center": nn.Dense(3, use_bias=False)(batch["x"])}


def _make_trainer(epochs, save_optimizer):
    loss = Loss(loss_weights={"center": 1.0}, use_assigner=False,
                losses={"center": "L1Loss"},
                loss_inputs={"center": ["center"]})
    config = {"train": {"save_optimizer": save_optimizer},
              "computing": {"seed": 0}}
    return CentralizedTrainer(
        epochs=epochs,
        optimizer=build_optimizer("AdamW", lr=1e-2),
        loss=loss,
        scheduler=build_scheduler("ConstantLR", factor=1.0),
        config=config,
    )


def _loader(n_batches=3, B=2, N=5, seed=0):
    rng = np.random.default_rng(seed)
    loader = []
    for _ in range(n_batches):
        x = rng.normal(size=(B, N, 3)).astype(np.float32)
        y = rng.normal(size=(B, N, 3)).astype(np.float32)
        loader.append(({"x": x},
                       {"gt_center": y, "gt_mask": np.ones((B, N), bool)}))
    return loader


def _params(result):
    return [np.asarray(v) for v in
            jax.tree_util.tree_leaves(result["variables"]["params"])]


@pytest.mark.parametrize("exact", [True, False])
def test_resume_matches_uninterrupted_run(tmp_path, exact):
    model = Toy()
    loader = _loader()
    rng = jax.random.PRNGKey(7)
    variables = model.init(jax.random.PRNGKey(0),
                           jax.tree_util.tree_map(jnp.asarray, loader[0][0]))

    # --- One uninterrupted 4-epoch run.
    full = _make_trainer(4, exact)(model, loader, variables=jax.tree_util
                                   .tree_map(jnp.copy, variables), rng=rng)

    # --- 2 epochs, checkpoint, resume for 2 more.
    first = _make_trainer(2, exact)(
        model, loader, dst=str(tmp_path),
        variables=jax.tree_util.tree_map(jnp.copy, variables), rng=rng)
    ckpt = osp.join(str(tmp_path), first["timestamp"], "checkpoints",
                    f"{first['timestamp']}_checkpoint_0001")
    import orbax.checkpoint as ocp
    restored = ocp.StandardCheckpointer().restore(ckpt)
    if exact:
        assert "opt_state_leaves" in restored and "step" in restored
    else:
        assert "opt_state_leaves" not in restored

    resumed = _make_trainer(4, exact)(model, loader, start_epoch=2,
                                      variables=restored, rng=rng)

    for a, b in zip(_params(full), _params(resumed)):
        if exact:
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
        else:
            # Restarted optimizer (reference parity): must still train,
            # but the moments reset so the trajectories diverge.
            assert not np.allclose(a, b)


def test_resume_rejects_optimizer_mismatch(tmp_path):
    model = Toy()
    loader = _loader()
    variables = model.init(jax.random.PRNGKey(0),
                           jax.tree_util.tree_map(jnp.asarray, loader[0][0]))
    first = _make_trainer(1, True)(model, loader, dst=str(tmp_path),
                                   variables=variables,
                                   rng=jax.random.PRNGKey(7))
    ckpt = osp.join(str(tmp_path), first["timestamp"], "checkpoints",
                    f"{first['timestamp']}_checkpoint_0000")
    import orbax.checkpoint as ocp
    restored = ocp.StandardCheckpointer().restore(ckpt)

    # SGD has a different (smaller) optimizer-state tree than AdamW.
    loss = Loss(loss_weights={"center": 1.0}, use_assigner=False,
                losses={"center": "L1Loss"},
                loss_inputs={"center": ["center"]})
    sgd_trainer = CentralizedTrainer(
        epochs=2, optimizer=build_optimizer("SGD", lr=1e-2), loss=loss,
        scheduler=build_scheduler("ConstantLR", factor=1.0),
        config={"train": {"save_optimizer": True}})
    with pytest.raises(ValueError, match="leaves"):
        sgd_trainer(model, loader, start_epoch=1, variables=restored,
                    rng=jax.random.PRNGKey(7))
