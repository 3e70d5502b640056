"""Multi-scale deformable attention module (flax).

TPU-native equivalent of the reference's CUDA-backed MSDeformAttn
(reference src/dprt/models/layers/ms_deform_attn.py:77-217): linear layers
predict per-query sampling offsets and softmaxed attention weights; the
sampling itself runs through dpft_tpu.ops.deform_attn (pure-XLA gather +
bilinear, Pallas kernel pluggable behind the same signature).

Initialization parity (reference _reset_parameters, ms_deform_attn.py:117-136):
 - sampling_offsets: zero kernel, bias arranged on a ring grid scaled by
   point index;
 - attention_weights: zero kernel and bias (uniform attention at init);
 - value/output projections: xavier_uniform kernel, zero bias.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dpft_tpu.models.layers.common import xavier_uniform, zeros_init
from dpft_tpu.ops.deform_attn import ms_deform_attn_core


def _grid_offset_bias(n_heads: int, n_levels: int, n_points: int):
    """Ring-grid initial sampling offsets (reference ms_deform_attn.py:118-129)."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # (H, 2)
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    flat = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        assert shape == flat.shape, (shape, flat.shape)
        return jnp.asarray(flat, dtype)

    return init


class MSDeformAttn(nn.Module):
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self,
                 query: jnp.ndarray,
                 reference_points: jnp.ndarray,
                 input_flatten: jnp.ndarray,
                 spatial_shapes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
        """
        Arguments:
            query: (B, N, d_model) queries (already pos-embedded).
            reference_points: (B, N, n_levels, 2) normalized (x, y) in [0, 1].
            input_flatten: (B, Len, d_model) flattened multi-level features.
            spatial_shapes: static list of (h, w) per level.

        Returns:
            (B, N, d_model) attended features.
        """
        E, H, L, P = self.d_model, self.n_heads, self.n_levels, self.n_points
        assert E % H == 0
        D = E // H
        B, N, _ = query.shape
        Len = input_flatten.shape[1]
        assert len(spatial_shapes) == L
        assert reference_points.shape[2] == L

        value = nn.Dense(E, kernel_init=xavier_uniform, bias_init=zeros_init,
                         dtype=self.dtype, name="value_proj")(input_flatten)
        value = value.reshape(B, Len, H, D)

        offsets = nn.Dense(
            H * L * P * 2, kernel_init=zeros_init,
            bias_init=_grid_offset_bias(H, L, P),
            dtype=self.dtype, name="sampling_offsets",
        )(query).reshape(B, N, H, L, P, 2)

        att = nn.Dense(
            H * L * P, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="attention_weights",
        )(query).reshape(B, N, H, L * P)
        # Softmax in float32 for numerical stability under bfloat16.
        att = nn.softmax(att.astype(jnp.float32), axis=-1).astype(
            self.dtype).reshape(B, N, H, L, P)

        # Normalize offsets by each level's (w, h) (reference :185-191).
        normalizer = jnp.asarray(
            [(w, h) for h, w in spatial_shapes], dtype=query.dtype
        )  # (L, 2) ordered (w, h)
        locations = (
            reference_points[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )

        out = ms_deform_attn_core(value, tuple(spatial_shapes), locations, att)

        return nn.Dense(E, kernel_init=xavier_uniform, bias_init=zeros_init,
                        dtype=self.dtype, name="output_proj")(out)
