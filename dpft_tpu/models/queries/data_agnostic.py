"""Data-agnostic static query reference points.

Parity: reference src/dprt/models/queries/data_agnostic.py:14-207. Builds a
meshgrid of reference points: per-dimension unit linspace -> distribution
function -> min-max scaling -> meshgrid -> optional coordinate
transformation (e.g. spher2cart for the polar query layout of the kradar
configs: resolution [20, 20, 1] over range [4, 72] x azimuth [-50, 50]).

The grid is static; it is computed at trace time and broadcast to the batch.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from dpft_tpu.ops.transforms import transform_points


def _dist_fn(name: str):
    if name == "linear":
        return lambda x: x
    return getattr(jnp, name)


def _min_max_scale(x: jnp.ndarray, mi: float, ma: float) -> jnp.ndarray:
    denom = jnp.max(x) - jnp.min(x)
    denom = jnp.where(jnp.isclose(denom, 0.0), 1.0, denom)
    return (x - jnp.min(x)) / denom * (ma - mi) + mi


class DataAgnosticStaticQueries(nn.Module):
    resolution: Sequence[int]
    minimum: Sequence[float]
    maximum: Sequence[float]
    transformation: Optional[str] = None
    distribution: Optional[Union[str, Sequence[str]]] = None

    def _distributions(self) -> List[str]:
        if self.distribution is None:
            return ["linear"] * len(self.resolution)
        if isinstance(self.distribution, (list, tuple)):
            return list(self.distribution)
        return [self.distribution] * len(self.resolution)

    @nn.compact
    def __call__(self, batch_size: int) -> Dict[str, jnp.ndarray]:
        dists = self._distributions()
        assert len(self.resolution) == len(self.minimum) \
            == len(self.maximum) == len(dists)

        axes = [jnp.linspace(0.0, 1.0, res) for res in self.resolution]
        axes = [_dist_fn(d)(q) for q, d in zip(axes, dists)]
        axes = [
            _min_max_scale(q, mi, ma)
            for q, mi, ma in zip(axes, self.minimum, self.maximum)
        ]

        grid = jnp.meshgrid(*axes, indexing="ij")
        queries = jnp.stack([g.reshape(-1) for g in grid], axis=-1)  # (N, dim)
        queries = transform_points(self.transformation, queries)
        queries = jnp.broadcast_to(
            queries[None], (batch_size,) + queries.shape)
        return {"center": queries}

    @property
    def n_queries(self) -> int:
        n = 1
        for r in self.resolution:
            n *= r
        return n


def build_data_agnostic_query(name: str, config: Dict[str, Any]):
    return DataAgnosticStaticQueries(
        resolution=tuple(config["resolution"]),
        minimum=tuple(config["minimum"]),
        maximum=tuple(config["maximum"]),
        transformation=config.get("transformation"),
        distribution=(
            tuple(config["distribution"])
            if isinstance(config.get("distribution"), (list, tuple))
            else config.get("distribution")
        ),
    )
