"""Shared layer utilities: torch-compatible initializers, activations.

Weight-init parity matters for reproducing the reference training run:
torch Linear/Conv default init is kaiming_uniform(a=sqrt(5)), which is
U(-1/sqrt(fan_in), 1/sqrt(fan_in)); flax defaults differ (lecun_normal), so
every module here passes explicit initializers.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Linear / nn.Conv default kernel init: U(+-1/sqrt(fan_in)).
# variance_scaling(1/3, fan_in, uniform) gives bound sqrt(3*(1/3)/fan_in).
torch_linear_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)

xavier_uniform = nn.initializers.xavier_uniform()
zeros_init = nn.initializers.zeros_init()


def torch_linear_bias_init(fan_in: int) -> Callable:
    """torch Linear/Conv default bias init: U(+-1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    # torch nn.GELU default is the exact erf form, not the tanh approx.
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "elu": jax.nn.elu,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "softplus": jax.nn.softplus,
    "identity": lambda x: x,
    "hardswish": jax.nn.hard_swish,
}


def get_compute_dtype(config) -> jnp.dtype:
    """Resolves the compute dtype from a merged module config.

    ``computing.compute_dtype`` (e.g. 'bfloat16') selects the activation /
    matmul precision; parameters stay float32. Defaults to float32 for
    bit-parity with the reference; bfloat16 is the TPU fast path (MXU
    native) and is what benchmarks use.
    """
    name = config.get("compute_dtype") or "float32"
    return jnp.dtype(name)


def get_activation(name: str) -> Callable:
    """Maps a torch-style activation class name ('Mish', 'ReLU', ...) to a fn."""
    key = name.lower().replace("_", "")
    if key not in _ACTIVATIONS:
        raise ValueError(f"Unknown activation: {name}")
    return _ACTIVATIONS[key]
