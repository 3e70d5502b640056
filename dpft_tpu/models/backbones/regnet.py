"""RegNet backbones (flax, channel-last) with intermediate returns.

TPU-native equivalent of the torchvision RegNet family used by the
reference wrapper (src/dprt/models/backbones/regnet.py:54-56,100-104: stem
then the four trunk_output stages). Returns {'1'..'<multi_scale>'} stage
outputs in channel-last layout.

Architecture (Radosavovic et al. 2020): 3x3/2 stem; stages of X/Y blocks -
1x1 reduce, 3x3 grouped conv (stride 2 on the first block), optional
squeeze-excitation (Y variants), 1x1 expand, residual. Stage widths/depths
follow the torchvision per-variant tables below.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from dpft_tpu.models.layers.common import zeros_init

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

_VARIANTS = {
    # name: (depths, widths, group_width, use_se)
    "regnet_x_400mf": ((1, 2, 7, 12), (32, 64, 160, 400), 16, False),
    "regnet_x_800mf": ((1, 3, 7, 5), (64, 128, 288, 672), 16, False),
    "regnet_x_1_6gf": ((2, 4, 10, 2), (72, 168, 408, 912), 24, False),
    "regnet_x_3_2gf": ((2, 6, 15, 2), (96, 192, 432, 1008), 48, False),
    "regnet_y_400mf": ((1, 3, 6, 6), (48, 104, 208, 440), 8, True),
    "regnet_y_800mf": ((1, 3, 8, 2), (64, 144, 320, 784), 16, True),
    "regnet_y_1_6gf": ((2, 6, 17, 2), (48, 120, 336, 888), 24, True),
    "regnet_y_3_2gf": ((2, 5, 13, 1), (72, 216, 576, 1512), 24, True),
}


def _bn(train, name, dtype=jnp.float32):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class SqueezeExcitation(nn.Module):
    channels: int
    squeeze: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze, (1, 1), kernel_init=_conv_init,
                    bias_init=zeros_init, dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), kernel_init=_conv_init,
                    bias_init=zeros_init, dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class RegNetBlock(nn.Module):
    width: int
    group_width: int
    strides: int = 1
    use_se: bool = False
    se_input_width: int = 0  # SE squeeze = input_width // 4 (torchvision)
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        groups = max(1, self.width // self.group_width)

        out = nn.Conv(self.width, (1, 1), use_bias=False,
                      kernel_init=_conv_init, dtype=self.dtype,
                      name="conv1")(x)
        out = _bn(train, "bn1", self.dtype)(out)
        out = nn.relu(out)

        out = nn.Conv(self.width, (3, 3), strides=(self.strides,) * 2,
                      padding=1, feature_group_count=groups, use_bias=False,
                      kernel_init=_conv_init, dtype=self.dtype,
                      name="conv2")(out)
        out = _bn(train, "bn2", self.dtype)(out)
        out = nn.relu(out)

        if self.use_se:
            out = SqueezeExcitation(self.width,
                                    max(1, self.se_input_width // 4),
                                    dtype=self.dtype, name="se")(out)

        out = nn.Conv(self.width, (1, 1), use_bias=False,
                      kernel_init=_conv_init, dtype=self.dtype,
                      name="conv3")(out)
        out = _bn(train, "bn3", self.dtype)(out)

        if self.downsample:
            identity = nn.Conv(self.width, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               kernel_init=_conv_init, dtype=self.dtype,
                               name="down_conv")(x)
            identity = _bn(train, "down_bn", self.dtype)(identity)
        return nn.relu(out + identity)


class RegNetBackbone(nn.Module):
    name_variant: str = "regnet_y_400mf"
    in_channels: int = 3
    multi_scale: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        depths, widths, group_width, use_se = \
            _VARIANTS[self.name_variant.lower()]

        x = batch
        if self.in_channels != 3:
            x = nn.Conv(3, (1, 1), use_bias=False, kernel_init=_conv_init,
                        dtype=self.dtype, name="adjustment")(x)

        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name="stem")(x)
        x = _bn(train, "stem_bn", self.dtype)(x)
        x = nn.relu(x)

        outputs = {}
        in_width = 32
        for stage, (depth, width) in enumerate(zip(depths, widths)):
            for b in range(depth):
                strides = 2 if b == 0 else 1
                down = b == 0 and (strides != 1 or in_width != width)
                x = RegNetBlock(width=width, group_width=group_width,
                                strides=strides, use_se=use_se,
                                se_input_width=in_width, downsample=down,
                                dtype=self.dtype,
                                name=f"block{stage + 1}_{b}")(x, train)
                in_width = width
            outputs[str(stage + 1)] = x
            if stage + 1 >= self.multi_scale:
                break
        return outputs


def build_regnet(name: str, config: Dict[str, Any]) -> RegNetBackbone:
    from dpft_tpu.models.layers.common import get_compute_dtype
    return RegNetBackbone(
        name_variant=name.lower(),
        in_channels=config.get("in_channels", 3),
        multi_scale=config.get("multi_scale", 1),
        dtype=get_compute_dtype(config),
    )
