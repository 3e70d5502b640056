"""DETR-style 2D sine/cosine positional embedding.

Parity: reference src/dprt/models/embeddings/sinusoidal.py:12-157. The
embedding is parameter-free and added onto each feature map. The reference
instantiates one embedding module per level; they hold no state, so here a
single module embeds every level (identical math, fewer module hops).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict

import numpy as np
import jax.numpy as jnp
from flax import linen as nn


@functools.lru_cache(maxsize=64)
def _pos_table(H: int, W: int, num_feats: int, temperature: float,
               normalize: bool, scale: float, eps: float,
               offset: float) -> np.ndarray:
    """(H, W, num_feats) combined x+y encoding table, float32 numpy.

    The table depends only on STATIC quantities (the feature-map shape and
    the embedding hyperparameters), so it is computed on the host at trace
    time and embedded as an XLA constant. Computing it in-graph instead
    (the round-1..4 realization) cost real device time every call: the
    iota/divide/sin/cos/stack chains materialized several full-resolution
    float32 buffers per level (~30 MB each at the camera's 512x910 raw
    level, HLO census 2026-08-20) that HBM bandwidth, not the VPU, paid
    for. Math is identical to the reference per-call computation
    (reference sinusoidal.py:63-110) with positions 1..H / 1..W
    (cumsum-of-ones); x and y encodings are summed here once instead of
    added onto the features separately (float32 rounding differs by ulps).
    """
    dtype = np.float32
    y_embed = np.broadcast_to(
        np.arange(1, H + 1, dtype=dtype)[:, None], (H, W)).copy()
    x_embed = np.broadcast_to(
        np.arange(1, W + 1, dtype=dtype)[None, :], (H, W)).copy()

    if normalize:
        y_embed = (y_embed + offset) / (y_embed[-1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, -1:] + eps) * scale

    dim_t = np.arange(num_feats, dtype=dtype)
    dim_t = (temperature ** (2 * (dim_t // 2) / num_feats)).astype(dtype)

    pos_x = (x_embed[..., None] / dim_t).astype(dtype)  # (H, W, num_feats)
    pos_y = (y_embed[..., None] / dim_t).astype(dtype)

    # Interleave sin(even indices) / cos(odd indices), reference :99-104.
    pos_x = np.stack(
        (np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])), axis=3
    ).reshape(H, W, -1)
    pos_y = np.stack(
        (np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])), axis=3
    ).reshape(H, W, -1)

    return (pos_x + pos_y).astype(dtype)


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
    (sinusoidal.py:107-108). The add runs in float32 (mixed-precision pin:
    sinusoidal tables stay float32); the table itself is a trace-time host
    constant, see _pos_table.
    """
    B, H, W, C = batch.shape
    assert C == num_feats, (C, num_feats)
    pos = _pos_table(H, W, num_feats, float(temperature), bool(normalize),
                     float(scale), float(eps), float(offset))
    return (batch.astype(jnp.float32) + pos[None]).astype(batch.dtype)


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
