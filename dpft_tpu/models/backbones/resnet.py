"""ResNet backbones (flax, channel-last) with intermediate feature returns.

TPU-native reimplementation of the torchvision ResNet family as used by the
reference (src/dprt/models/backbones/resnet.py:13-180): resnet18/34 use
BasicBlock, resnet50/101/152 use Bottleneck (expansion 4); the wrapper adds
a 1x1 channel-adjust conv for non-RGB inputs (e.g. the 6-channel radar
planes) and returns the outputs of layer1..layer{multi_scale} as a dict
{'1': ..., '4': ...} in channel-last layout.

Pretrained torchvision weights (IMAGENET1K_V2) can be converted into this
module's parameter tree with dpft_tpu.models.backbones.torch_weights (the
runtime has no network access, so weights must be supplied as a local
state_dict file; with none given, initialization is torch-default random).

BatchNorm: torch momentum 0.1 == flax momentum 0.9; eps 1e-5. Running
statistics live in the 'batch_stats' collection.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn


# torch Conv2d default (kaiming_uniform(a=sqrt(5))) -> U(+-1/sqrt(fan_in)).
_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

_STAGES: Dict[str, tuple] = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


class _BN(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)


def _conv(features, kernel, strides=1, name=None, dtype=jnp.float32):
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(strides, strides),
                   padding=[(pad, pad), (pad, pad)], use_bias=False,
                   kernel_init=_conv_init, dtype=dtype, name=name)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.features, 3, self.strides, "conv1", self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, 1, "conv2", self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, kernel_init=_conv_init,
                               dtype=self.dtype, name="down_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, name="down_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output channels = 4 * features
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False,
                      kernel_init=_conv_init, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, self.strides, "conv2", self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                      kernel_init=_conv_init, dtype=self.dtype,
                      name="conv3")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, kernel_init=_conv_init,
                               dtype=self.dtype, name="down_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, name="down_bn")(identity)
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """ResNet trunk returning {'1': layer1, ..., '<multi_scale>': ...}."""

    name_variant: str = "resnet50"
    in_channels: int = 3
    multi_scale: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        block_kind, counts = _STAGES[self.name_variant.lower()]
        block_cls = BasicBlock if block_kind == "basic" else Bottleneck

        x = batch
        # Channel-adjust for non-RGB inputs (reference resnet.py:47-51).
        if self.in_channels != 3:
            x = nn.Conv(3, (1, 1), use_bias=False, kernel_init=_conv_init,
                        dtype=self.dtype, name="adjustment")(x)

        # Stem: 7x7/2 conv, BN, ReLU, 3x3/2 max pool.
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=_conv_init, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outputs = {}
        widths = (64, 128, 256, 512)
        expansion = 1 if block_kind == "basic" else 4
        in_ch = 64
        for stage, (width, n_blocks) in enumerate(zip(widths, counts)):
            strides = 1 if stage == 0 else 2
            for b in range(n_blocks):
                s = strides if b == 0 else 1
                down = b == 0 and (s != 1 or in_ch != width * expansion)
                x = block_cls(features=width, strides=s, downsample=down,
                              dtype=self.dtype,
                              name=f"layer{stage + 1}_block{b}")(x, train)
                in_ch = width * expansion
            outputs[str(stage + 1)] = x
            if stage + 1 >= self.multi_scale:
                break  # later stages are never consumed
        return outputs


def build_resnet(name: str, config: Dict[str, Any]) -> ResNetBackbone:
    from dpft_tpu.models.layers.common import get_compute_dtype
    return ResNetBackbone(
        name_variant=name.lower(),
        in_channels=config.get("in_channels", 3),
        multi_scale=config.get("multi_scale", 1),
        dtype=get_compute_dtype(config),
    )
