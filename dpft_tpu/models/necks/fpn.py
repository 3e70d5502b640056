"""Feature Pyramid Network neck (flax, channel-last).

TPU-native reimplementation of the torchvision FeaturePyramidNetwork used by
the reference (src/dprt/models/necks/fpn.py:11-88): per-level 1x1 lateral
convs, top-down pathway with nearest-neighbor upsampling, 3x3 output convs.
Channel-last throughout - no NCHW<->NHWC shuffling like the reference
adapter needs (fpn.py:62-82).

Init parity: torchvision FPN initializes convs with kaiming_uniform(a=1)
(bound sqrt(3/fan_in)) and zero bias.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dpft_tpu.models.layers.common import zeros_init

_fpn_kernel_init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


def nearest_resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest-neighbor resize of (B, H, W, C) with torch index semantics.

    torch F.interpolate(mode='nearest') picks source index floor(i * in/out),
    which differs from center-aligned nearest for non-integer ratios.
    """
    in_h, in_w = x.shape[1], x.shape[2]
    rows = (jnp.arange(h) * in_h) // h
    cols = (jnp.arange(w) * in_w) // w
    return x[:, rows][:, :, cols]


class FPN(nn.Module):
    in_channels_list: Sequence[int]
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        keys = list(batch.keys())
        feats = list(batch.values())
        assert len(feats) == len(self.in_channels_list), (
            len(feats), self.in_channels_list)

        laterals = [
            nn.Conv(self.out_channels, (1, 1),
                    kernel_init=_fpn_kernel_init, bias_init=zeros_init,
                    dtype=self.dtype, name=f"inner_{i}")(f)
            for i, f in enumerate(feats)
        ]

        # Top-down pathway (highest level first).
        results = [None] * len(laterals)
        last = laterals[-1]
        results[-1] = nn.Conv(self.out_channels, (3, 3), padding=1,
                              kernel_init=_fpn_kernel_init,
                              bias_init=zeros_init, dtype=self.dtype,
                              name=f"layer_{len(laterals) - 1}")(last)
        for i in range(len(laterals) - 2, -1, -1):
            h, w = laterals[i].shape[1], laterals[i].shape[2]
            last = laterals[i] + nearest_resize(last, h, w)
            results[i] = nn.Conv(self.out_channels, (3, 3), padding=1,
                                 kernel_init=_fpn_kernel_init,
                                 bias_init=zeros_init, dtype=self.dtype,
                                 name=f"layer_{i}")(last)

        return dict(zip(keys, results))


def build_fpn(name: str, config: Dict[str, Any]) -> FPN:
    from dpft_tpu.models.layers.common import get_compute_dtype
    return FPN(
        in_channels_list=tuple(config["in_channels_list"]),
        out_channels=config["out_channels"],
        dtype=get_compute_dtype(config),
    )
