"""ConvNeXt backbones (flax, channel-last) with intermediate returns.

TPU-native equivalent of the torchvision ConvNeXt family used by the
reference wrapper (src/dprt/models/backbones/convnext.py:14-60, which taps
`backbone.features` after each stage). Returns {'1'..'<multi_scale>'} stage
outputs in channel-last layout, matching the ResNet backbone contract.

Architecture (Liu et al. 2022): 4x4/4 patchify stem + LayerNorm; stages of
blocks [depthwise 7x7 conv -> LN -> Dense 4C -> GELU -> Dense C -> layer
scale], with 2x2/2 downsample (LN + conv) between stages.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from dpft_tpu.models.layers.common import zeros_init

_VARIANTS = {
    # name: (depths, dims)
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
}

_trunc_normal = nn.initializers.truncated_normal(stddev=0.02)


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        x = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    kernel_init=_trunc_normal, bias_init=zeros_init,
                    dtype=self.dtype, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, kernel_init=_trunc_normal,
                     bias_init=zeros_init, dtype=self.dtype, name="pw1")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU is exact erf
        x = nn.Dense(self.dim, kernel_init=_trunc_normal,
                     bias_init=zeros_init, dtype=self.dtype, name="pw2")(x)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale),
                           (self.dim,))
        return residual + gamma * x


class ConvNeXtBackbone(nn.Module):
    name_variant: str = "convnext_tiny"
    in_channels: int = 3
    multi_scale: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        depths, dims = _VARIANTS[self.name_variant.lower()]

        x = batch
        if self.in_channels != 3:
            x = nn.Conv(3, (1, 1), use_bias=False, kernel_init=_trunc_normal,
                        dtype=self.dtype, name="adjustment")(x)

        # Patchify stem.
        x = nn.Conv(dims[0], (4, 4), strides=(4, 4),
                    kernel_init=_trunc_normal, bias_init=zeros_init,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)

        outputs = {}
        for stage in range(4):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6,
                                 name=f"down{stage}_norm")(x)
                x = nn.Conv(dims[stage], (2, 2), strides=(2, 2),
                            kernel_init=_trunc_normal, bias_init=zeros_init,
                            dtype=self.dtype, name=f"down{stage}_conv")(x)
            for b in range(depths[stage]):
                x = ConvNeXtBlock(dims[stage], dtype=self.dtype,
                                  name=f"stage{stage + 1}_block{b}")(x)
            outputs[str(stage + 1)] = x
            if stage + 1 >= self.multi_scale:
                break
        return outputs


def build_convnext(name: str, config: Dict[str, Any]) -> ConvNeXtBackbone:
    from dpft_tpu.models.layers.common import get_compute_dtype
    return ConvNeXtBackbone(
        name_variant=name.lower(),
        in_channels=config.get("in_channels", 3),
        multi_scale=config.get("multi_scale", 1),
        dtype=get_compute_dtype(config),
    )
