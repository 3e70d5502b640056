"""Learnable query reference points.

Parity: reference src/dprt/models/queries/learnable.py:13-132 - a trainable
(N, dim) parameter of reference points, initialized uniformly per dimension
within [minimum, maximum], broadcast to the batch at call time.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class LearnableQueries(nn.Module):
    n_queries: int
    minimum: Sequence[float]
    maximum: Sequence[float]

    @nn.compact
    def __call__(self, batch_size: int) -> Dict[str, jnp.ndarray]:
        dim = len(self.minimum)
        mins = jnp.asarray(self.minimum)
        maxs = jnp.asarray(self.maximum)

        def init(key, shape, dtype=jnp.float32):
            u = jax.random.uniform(key, shape, dtype)
            return u * (maxs - mins) + mins

        queries = self.param("query", init, (self.n_queries, dim))
        queries = jnp.broadcast_to(queries[None],
                                   (batch_size, self.n_queries, dim))
        return {"center": queries}


def build_learnable_query(name: str, config: Dict[str, Any]):
    return LearnableQueries(
        n_queries=config["n_queries"],
        minimum=tuple(config["minimum"]),
        maximum=tuple(config["maximum"]),
    )
