"""Epoch-based learning-rate schedulers mapping torch.optim.lr_scheduler names.

Parity: reference src/dprt/training/scheduler.py:7-33 builds torch
schedulers by name, stepped once per epoch (trainer.py:250). Here a
scheduler is a pure traceable function ``factor(epoch) -> float`` multiplied
onto the base learning rate; the trainer turns it into a per-update optax
schedule via the known steps-per-epoch, so the whole schedule lives inside
the jitted update (no host-side hyperparameter mutation).

Composition parity:
 - SequentialLR: piecewise schedule switching at milestones (each child is
   evaluated with its local epoch count).
 - ChainedScheduler: product of the chained factors (torch chains
   multiplicative updates; for the factor-style schedulers used here the
   product is the closed form).
"""

from __future__ import annotations

import math
from typing import Any, Callable, List

import jax.numpy as jnp


def _constant_lr(factor: float = 1.0 / 3.0, total_iters: int = 5, **_):
    def fn(epoch):
        return jnp.where(epoch < total_iters, factor, 1.0)
    return fn


def _linear_lr(start_factor: float = 1.0 / 3.0, end_factor: float = 1.0,
               total_iters: int = 5, **_):
    def fn(epoch):
        ramp = start_factor + (end_factor - start_factor) * epoch / total_iters
        return jnp.where(epoch >= total_iters, end_factor, ramp)
    return fn


def _step_lr(step_size: int, gamma: float = 0.1, **_):
    def fn(epoch):
        return gamma ** (epoch // step_size)
    return fn


def _multi_step_lr(milestones: List[int], gamma: float = 0.1, **_):
    ms = jnp.asarray(sorted(milestones))

    def fn(epoch):
        return gamma ** jnp.sum(epoch >= ms)
    return fn


def _exponential_lr(gamma: float, **_):
    def fn(epoch):
        return gamma ** epoch
    return fn


def _cosine_annealing_lr(T_max: int, eta_min: float = 0.0,
                         base_lr: float = 1.0, **_):
    def fn(epoch):
        cos = (1 + jnp.cos(math.pi * epoch / T_max)) / 2
        return (eta_min + (base_lr - eta_min) * cos) / base_lr
    return fn


_REGISTRY = {
    "constantlr": _constant_lr,
    "linearlr": _linear_lr,
    "steplr": _step_lr,
    "multisteplr": _multi_step_lr,
    "exponentiallr": _exponential_lr,
    "cosineannealinglr": _cosine_annealing_lr,
}


def build_scheduler(name: str, **config: Any) -> Callable:
    """Returns a traceable factor(epoch) for a torch scheduler name."""
    lname = name.lower()

    if lname == "chainedscheduler":
        children = [
            build_scheduler(sub["name"],
                            **{k: v for k, v in sub.items() if k != "name"})
            for sub in config["schedulers"]
        ]

        def chained(epoch):
            out = 1.0
            for child in children:
                out = out * child(epoch)
            return out
        return chained

    if lname == "sequentiallr":
        children = [
            build_scheduler(sub["name"],
                            **{k: v for k, v in sub.items() if k != "name"})
            for sub in config["schedulers"]
        ]
        milestones = sorted(config["milestones"])

        def sequential(epoch):
            starts = [0] + milestones
            values = jnp.stack([
                jnp.asarray(child(epoch - start), jnp.float32)
                for child, start in zip(children, starts)
            ])
            idx = jnp.sum(epoch >= jnp.asarray(milestones))
            return values[idx]
        return sequential

    if lname not in _REGISTRY:
        raise ValueError(f"Unknown scheduler: {name}")
    return _REGISTRY[lname](**config)


def as_step_schedule(factor_fn: Callable, base_lr: float,
                     steps_per_epoch: int, every_k: int = 1) -> Callable:
    """Turns an epoch-factor function into an optax per-update schedule.

    `steps_per_epoch` counts loader micro-batches. With gradient
    accumulation (optax.MultiSteps, `every_k` > 1) the optimizer's update
    counter only advances once per `every_k` micro-batches, so update
    `count` corresponds to micro-batch `count * every_k`; without the
    multiplier an epoch-based schedule would run `every_k` times too
    slowly (e.g. a MultiStepLR milestone at epoch 10 firing at epoch 40).
    """
    def schedule(count):
        epoch = (count * every_k) // max(steps_per_epoch, 1)
        return base_lr * factor_fn(epoch)
    return schedule
