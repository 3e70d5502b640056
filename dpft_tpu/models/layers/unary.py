"""Unary (1x1 convolution) layers.

Parity: reference src/dprt/models/layers/unary.py:8-111. A 1x1 convolution
over channel-last data is exactly a Dense layer on the trailing axis, which
is the TPU-friendly formulation (a single MXU matmul, no layout shuffling).
"""

from __future__ import annotations

from flax import linen as nn
import jax.numpy as jnp

from dpft_tpu.models.layers.common import (
    torch_linear_kernel_init, torch_linear_bias_init,
)


class Unary1d(nn.Module):
    """Pointwise layer over (B, N, C) data (reference Unary1d)."""

    in_channels: int
    out_channels: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.out_channels,
            use_bias=self.use_bias,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(self.in_channels),
            dtype=self.dtype,
            name="conv1d",
        )(batch)


class Unary2d(nn.Module):
    """Pointwise layer over (B, H, W, C) data (reference Unary2d)."""

    in_channels: int
    out_channels: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.out_channels,
            use_bias=self.use_bias,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(self.in_channels),
            dtype=self.dtype,
            name="conv2d",
        )(batch)
