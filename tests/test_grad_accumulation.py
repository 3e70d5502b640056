"""Gradient accumulation (train.accumulate_steps via optax.MultiSteps)."""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from dpft_tpu.parallel import create_mesh
from dpft_tpu.training.loss import Loss
from dpft_tpu.training.optimizer import build_optimizer, wrap_accumulation
from dpft_tpu.training.trainer import CentralizedTrainer


class Toy(nn.Module):
    @nn.compact
    def __call__(self, batch, train=False):
        return {"center": nn.Dense(3, use_bias=False)(batch["x"])}


def _loss():
    return Loss(loss_weights={"center": 1.0}, use_assigner=False,
                losses={"center": "L1Loss"},
                loss_inputs={"center": ["center"]})


def _step_fn(trainer, tx):
    model = Toy()
    step, _ = trainer._make_steps(model, tx, create_mesh(data=1))
    return model, step


def _targets(center):
    return {"gt_center": center,
            "gt_mask": jnp.ones(center.shape[:2], bool)}


def test_accumulate_steps_equals_full_batch():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 5, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(4, 5, 3)), jnp.float32)

    factory = build_optimizer("SGD", lr=0.1)
    model = Toy()
    variables = model.init(jax.random.PRNGKey(0), {"x": x})

    def make_state(tx):
        return {"params": jax.tree_util.tree_map(jnp.copy,
                                                 variables["params"]),
                "opt_state": tx.init(variables["params"]),
                "step": jnp.zeros((), jnp.int32)}

    # One full-batch step.
    trainer = CentralizedTrainer(loss=_loss(), config={})
    tx_full = factory(0.1)
    _, step_full = _step_fn(trainer, tx_full)
    state_full, *_ = step_full(make_state(tx_full), {"x": x}, _targets(y),
                               jax.random.PRNGKey(1))

    # Two accumulated half-batch micro-steps.
    config = {"train": {"accumulate_steps": 2}}
    tx_acc = wrap_accumulation(factory(0.1), config)
    trainer_acc = CentralizedTrainer(loss=_loss(), config=config)
    _, step_acc = _step_fn(trainer_acc, tx_acc)
    state = make_state(tx_acc)
    p0 = jax.tree_util.tree_map(np.asarray, state["params"])

    state, *_ = step_acc(state, {"x": x[:2]}, _targets(y[:2]),
                         jax.random.PRNGKey(1))
    # Params unchanged after the first micro-step (accumulating).
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(state["params"])):
        np.testing.assert_array_equal(a, np.asarray(b))

    state, *_ = step_acc(state, {"x": x[2:]}, _targets(y[2:]),
                         jax.random.PRNGKey(1))

    # After k micro-steps, the applied update equals the full-batch step:
    # the L1 set loss is a mean over the batch, so averaging two equal
    # halves' gradients reproduces the full-batch gradient.
    for a, b in zip(jax.tree_util.tree_leaves(state_full["params"]),
                    jax.tree_util.tree_leaves(state["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_schedule_epoch_alignment_under_accumulation():
    """Regression: with accumulate_steps=k the optimizer update counter
    advances once per k micro-batches, so the epoch schedule must map
    update count c to epoch (c*k)//steps_per_epoch — not c//steps_per_epoch
    (which ran every epoch-based scheduler k times too slowly)."""
    import optax

    from dpft_tpu.training.scheduler import as_step_schedule, build_scheduler

    steps_per_epoch, k = 4, 2
    factor = build_scheduler("StepLR", step_size=1, gamma=0.1)
    schedule = as_step_schedule(factor, 1.0, steps_per_epoch, every_k=k)

    # Drive a real MultiSteps(SGD(schedule)) for one epoch of micro-batches
    # and check the LR applied at the start of epoch 2 is decayed.
    tx = optax.MultiSteps(optax.sgd(schedule), every_k_schedule=k)
    params = {"w": jnp.ones((2,))}
    opt_state = tx.init(params)
    g = {"w": jnp.ones((2,))}
    for _ in range(steps_per_epoch):  # epoch 1: applied LR must be 1.0
        updates, opt_state = tx.update(g, opt_state, params)
    # 4 micro-batches -> 2 applied updates, both at factor(0)=1.0.
    np.testing.assert_allclose(np.asarray(params["w"])
                               + np.asarray(optax.apply_updates(
                                   params, updates)["w"]) * 0,
                               np.asarray(params["w"]))
    # First update of epoch 2 (update count 2 -> epoch (2*2)//4 = 1).
    for _ in range(k):
        updates, opt_state = tx.update(g, opt_state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1,
                               rtol=1e-6)

    # And the raw schedule agrees at epoch boundaries.
    assert float(schedule(0)) == 1.0
    assert float(schedule(1)) == 1.0
    np.testing.assert_allclose(float(schedule(2)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(schedule(4)), 0.01, rtol=1e-6)


def test_wrap_accumulation_noop_by_default():
    factory = build_optimizer("AdamW", lr=1e-3)
    tx = factory(1e-3)
    assert wrap_accumulation(tx, {}) is tx
    assert wrap_accumulation(tx, {"train": {"accumulate_steps": 1}}) is tx
