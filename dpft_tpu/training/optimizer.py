"""Optimizer factory mapping torch.optim names to optax transforms.

Parity: reference src/dprt/training/optimizer.py:6-7 dispatches by name and
splats the config into the torch constructor; this maps the same names and
hyperparameters (with torch default values) onto optax.

The learning rate is injected as a schedule callable so epoch-based
schedulers (dpft_tpu.training.scheduler) compose exactly like torch's
optimizer + scheduler pairing.
"""

from __future__ import annotations

from typing import Any, Callable, Union

import optax

ScalarOrSchedule = Union[float, Callable[[int], float]]


def build_optimizer(name: str, **config: Any) -> Callable[[ScalarOrSchedule], optax.GradientTransformation]:
    """Returns a factory: learning_rate (float or schedule) -> optax tx."""
    lname = name.lower()

    def factory(learning_rate: ScalarOrSchedule) -> optax.GradientTransformation:
        if lname == "adamw":
            betas = config.get("betas", (0.9, 0.999))
            return optax.adamw(
                learning_rate,
                b1=betas[0], b2=betas[1],
                eps=config.get("eps", 1e-8),
                weight_decay=config.get("weight_decay", 1e-2),  # torch default
            )
        if lname == "adam":
            betas = config.get("betas", (0.9, 0.999))
            return optax.adam(
                learning_rate, b1=betas[0], b2=betas[1],
                eps=config.get("eps", 1e-8),
            )
        if lname == "sgd":
            return optax.sgd(
                learning_rate,
                momentum=config.get("momentum", 0.0) or None,
                nesterov=config.get("nesterov", False),
            )
        if lname == "rmsprop":
            return optax.rmsprop(
                learning_rate,
                decay=config.get("alpha", 0.99),
                eps=config.get("eps", 1e-8),
                momentum=config.get("momentum", 0.0),
            )
        if lname == "adagrad":
            return optax.adagrad(learning_rate,
                                 eps=config.get("eps", 1e-10))
        raise ValueError(f"Unknown optimizer: {name}")

    factory.base_lr = float(config.get("lr", 1e-3))
    factory.name = name
    return factory


def wrap_accumulation(tx: optax.GradientTransformation,
                      config: Any) -> optax.GradientTransformation:
    """Gradient accumulation (`train.accumulate_steps`, default 1).

    Wraps the transformation in optax.MultiSteps: gradients of k
    consecutive micro-batches are averaged and applied as ONE optimizer
    update, so a memory-bound chip trains at k-fold effective batch size
    (combine with `computing.remat` for maximum headroom). With the
    per-batch loss being a batch mean, k accumulated micro-batches equal
    one step on the concatenated batch exactly (up to f32 reduction
    order). The LR schedule advances once per effective update. No
    reference counterpart (torch reference updates every batch).
    """
    k = int(config.get("train", {}).get("accumulate_steps", 1))
    if k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=k)
    if config.get("train", {}).get("flat_optimizer"):
        # optax.flatten: moments (and any accumulator) live in ONE ravelled
        # buffer per state leaf kind instead of one per parameter array
        # (~340 buffers -> ~4 at flagship scale). AdamW/SGD/... updates are
        # elementwise, so the step is bitwise identical; fewer, larger
        # buffers mean fewer kernels in the update and far fewer outputs
        # crossing the jitted-step boundary every step. Incompatible with
        # computing.model_parallel (TP shards optimizer moments by the
        # parameter shape rules, parallel/tp.py) - the trainer rejects
        # that combination.
        tx = optax.flatten(tx)
    return tx
