"""Gradient health of the set loss (padded targets must not poison grads)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from dpft_tpu.training.loss import Loss
from test_training_loss import WEIGHTS, make_random_problem

pytestmark = pytest.mark.slow


def test_loss_gradients_finite_with_padding():
    rng = np.random.default_rng(3)
    outputs, _, padded = make_random_problem(rng, B=2, N=30, M_max=8)
    loss_fn = Loss(loss_weights=WEIGHTS)

    jt = {k: jnp.array(v) for k, v in padded.items()}

    def f(out):
        total, _ = loss_fn(out, jt)
        return total

    grads = jax.grad(f)({k: jnp.array(v) for k, v in outputs.items()})
    for k, g in grads.items():
        arr = np.asarray(g)
        assert np.all(np.isfinite(arr)), f"non-finite grad in {k}"
    # Matched queries must receive signal.
    assert float(np.abs(np.asarray(grads["center"])).sum()) > 0


def test_loss_gradients_finite_with_empty_sample():
    rng = np.random.default_rng(4)
    outputs, _, padded = make_random_problem(rng, B=2, counts=[0, 3])
    padded["gt_mask"][0] = False
    loss_fn = Loss(loss_weights=WEIGHTS)
    jt = {k: jnp.array(v) for k, v in padded.items()}

    def f(out):
        return loss_fn(out, jt)[0]

    grads = jax.grad(f)({k: jnp.array(v) for k, v in outputs.items()})
    for k, g in grads.items():
        assert np.all(np.isfinite(np.asarray(g))), k


def test_loss_gradients_finite_degenerate_predictions():
    # All-zero predictions (degenerate boxes) exercise the NaN-prone
    # giou/norm backward paths; stop_gradient on the matcher must shield
    # them (reference matches under torch.no_grad, assigner.py:89).
    rng = np.random.default_rng(5)
    _, _, padded = make_random_problem(rng, B=1, N=10, M_max=4)
    outputs = {
        "class": jnp.zeros((1, 10, 3)),
        "center": jnp.zeros((1, 10, 3)),
        "size": jnp.zeros((1, 10, 3)),
        "angle": jnp.zeros((1, 10, 2)),
    }
    loss_fn = Loss(loss_weights=WEIGHTS)
    jt = {k: jnp.array(v) for k, v in padded.items()}

    grads = jax.grad(lambda o: loss_fn(o, jt)[0])(outputs)
    for k, g in grads.items():
        assert np.all(np.isfinite(np.asarray(g))), k
