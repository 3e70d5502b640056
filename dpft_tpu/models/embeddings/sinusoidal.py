"""DETR-style 2D sine/cosine positional embedding.

Parity: reference src/dprt/models/embeddings/sinusoidal.py:12-157. The
embedding is parameter-free and added onto each feature map. The reference
instantiates one embedding module per level; they hold no state, so here a
single module embeds every level (identical math, fewer module hops).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_embed_2d(batch: jnp.ndarray,
                        num_feats: int,
                        temperature: float = 10000.0,
                        normalize: bool = False,
                        scale: float = 2 * math.pi,
                        eps: float = 1e-6,
                        offset: float = 0.0) -> jnp.ndarray:
    """Adds sine/cosine positional encodings to a (B, H, W, C) feature map.

    C must equal num_feats: both the x and y encodings (num_feats channels
    each) are added onto the features, matching the reference in-place adds
    (sinusoidal.py:107-108).
    """
    B, H, W, C = batch.shape
    assert C == num_feats, (C, num_feats)
    # The encodings are computed in float32 regardless of the compute dtype:
    # the 10000^(2i/C) frequency table and the cumulative positions lose
    # precision in bfloat16, and the table is tiny (computed once per jit).
    dtype = jnp.float32

    y_embed = jnp.broadcast_to(
        jnp.arange(1, H + 1, dtype=dtype)[None, :, None], (B, H, W))
    x_embed = jnp.broadcast_to(
        jnp.arange(1, W + 1, dtype=dtype)[None, None, :], (B, H, W))

    if normalize:
        y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_feats, dtype=dtype)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)

    pos_x = x_embed[..., None] / dim_t  # (B, H, W, num_feats)
    pos_y = y_embed[..., None] / dim_t

    # Interleave sin(even indices) / cos(odd indices), reference :99-104.
    pos_x = jnp.stack(
        (jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])), axis=4
    ).reshape(B, H, W, -1)
    pos_y = jnp.stack(
        (jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])), axis=4
    ).reshape(B, H, W, -1)

    return (batch.astype(jnp.float32) + pos_x + pos_y).astype(batch.dtype)


class MultiLevelSinusoidalEmbedding(nn.Module):
    """Applies the sinusoidal embedding to every level of a feature dict."""

    num_feats: int
    n_levels: int = 1
    temperature: float = 10000.0
    normalize: bool = False
    scale: float = 2 * math.pi
    eps: float = 1e-6
    offset: float = 0.0

    @nn.compact
    def __call__(self, batches: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        return {
            k: sinusoidal_embed_2d(
                v, self.num_feats, self.temperature, self.normalize,
                self.scale, self.eps, self.offset)
            for k, v in batches.items()
        }


def build_sinusoidal_embedding(config: Dict[str, Any]) -> MultiLevelSinusoidalEmbedding:
    return MultiLevelSinusoidalEmbedding(
        num_feats=config["num_feats"],
        n_levels=config.get("n_levels", 1),
        temperature=config.get("temperature", 10000.0),
        normalize=config.get("normalize", False),
        scale=config.get("scale", 2 * math.pi),
        eps=config.get("eps", 1e-6),
        offset=config.get("offset", 0.0),
    )
