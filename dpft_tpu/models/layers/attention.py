"""Multi-head attention with torch-compatible parameterization.

Equivalent to torch nn.MultiheadAttention(batch_first=True) as used for the
query self-attention in the fusion decoder (reference mpfusion.py:56-57) and
the 'cross-attn' view reduction (mpfusion.py:397-400): packed qkv in-proj
(xavier_uniform over the packed (3E, E) matrix, zero bias), separate kdim /
vdim support, dropout on the attention probabilities, out-proj with torch
Linear default init and zero bias.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dpft_tpu.models.layers.common import (
    torch_linear_kernel_init, zeros_init,
)


def _packed_xavier(key, shape, dtype=jnp.float32):
    """xavier_uniform computed over the torch packed (3E, E) matrix.

    Our parameter is stored as (E_in, 3E_out); torch packs (3E, E). Both
    have fan_in + fan_out = E + 3E, so the xavier bound is identical and a
    plain xavier over the full shape matches.
    """
    fan_in, fan_out = shape[0], shape[1]
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MultiheadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    kdim: Optional[int] = None
    vdim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray, key: jnp.ndarray,
                 value: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        E = self.embed_dim
        H = self.num_heads
        D = E // H
        assert E % H == 0, (E, H)
        kdim = self.kdim if self.kdim is not None else E
        vdim = self.vdim if self.vdim is not None else E

        if kdim == E and vdim == E:
            # Packed qkv projection (torch same-dim fast path). Params are
            # float32; matmuls run in self.dtype (mixed precision).
            w = self.param("in_proj_kernel", _packed_xavier, (E, 3 * E))
            b = self.param("in_proj_bias", zeros_init, (3 * E,))
            w = w.astype(self.dtype)
            b = b.astype(self.dtype)
            query = query.astype(self.dtype)
            key = key.astype(self.dtype)
            value = value.astype(self.dtype)
            q = query @ w[:, :E] + b[:E]
            k = key @ w[:, E:2 * E] + b[E:2 * E]
            v = value @ w[:, 2 * E:] + b[2 * E:]
        else:
            q = nn.Dense(E, kernel_init=_packed_xavier, bias_init=zeros_init,
                         dtype=self.dtype, name="q_proj")(query)
            k = nn.Dense(E, kernel_init=_packed_xavier, bias_init=zeros_init,
                         dtype=self.dtype, name="k_proj")(key)
            v = nn.Dense(E, kernel_init=_packed_xavier, bias_init=zeros_init,
                         dtype=self.dtype, name="v_proj")(value)

        B, N, _ = q.shape
        M = k.shape[1]
        q = q.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, M, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, M, H, D).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(D).astype(q.dtype)
        # Softmax in float32 for numerical stability under bfloat16.
        probs = jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        if self.dropout > 0.0 and not deterministic:
            probs = nn.Dropout(self.dropout)(probs, deterministic=False)

        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, E)

        return nn.Dense(
            E, kernel_init=torch_linear_kernel_init, bias_init=zeros_init,
            dtype=self.dtype, name="out_proj",
        )(out)
