"""Detection heads: four branches (center / size / angle / class).

Parity: reference src/dprt/models/heads/detection.py:13-283. Branch
activations are center=Identity, size=ReLU, angle=Tanh, class=Identity
(raw logits); the center is predicted as a residual added to the query
reference points (detection.py:144,273). Unary (1x1 conv) and Linear
variants are mathematically identical on channel-last data; both exist for
config parity. Note the reference's Unary variant sizes its class branch
with num_reg_layers (detection.py:86) - reproduced as-is.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from dpft_tpu.models.layers.common import (
    torch_linear_kernel_init, torch_linear_bias_init,
)


class _Branch(nn.Module):
    """Stack of Dense layers with ReLU + dropout between them."""

    in_channels: int
    out_channels: int
    num_layers: int
    use_bias: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # Constant init for the OUTPUT layer's bias (forces the bias on for
    # that layer). Used by the size branch's positive prior; see
    # LinearDetectionHead.size_bias_prior.
    out_bias_prior: float | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.in_channels, use_bias=self.use_bias,
                         kernel_init=torch_linear_kernel_init,
                         bias_init=torch_linear_bias_init(self.in_channels),
                         dtype=self.dtype, name=f"layer{i}")(x)
            x = nn.relu(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        out_bias = self.use_bias
        bias_init = torch_linear_bias_init(self.in_channels)
        if self.out_bias_prior is not None:
            out_bias = True
            prior = float(self.out_bias_prior)
            bias_init = (lambda key, shape, dtype=jnp.float32:
                         jnp.full(shape, prior, dtype))
        return nn.Dense(self.out_channels, use_bias=out_bias,
                        kernel_init=torch_linear_kernel_init,
                        bias_init=bias_init,
                        dtype=self.dtype, name="out")(x)


class LinearDetectionHead(nn.Module):
    in_channels: int
    num_classes: int
    num_reg_layers: int = 1
    num_cls_layers: int = 1
    use_bias: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    # The Unary variant uses num_reg_layers for its class branch too
    # (reference detection.py:86); the Linear variant uses num_cls_layers.
    cls_layers_from_reg: bool = False

    # DELTA vs reference (documented DEFAULT since round 4): constant
    # positive init for the size branch's output bias. The size activation
    # is ReLU (reference detection.py:144,273 activations), so a size unit
    # whose pre-activation goes negative for every query receives zero
    # gradient and is dead permanently. Round-4 sweep evidence (STATUS.md
    # accuracy-proxy section): without the prior the l/w units die at
    # fixture scale under EVERY schedule tried (lr 3e-3/80ep, 1e-3/200ep,
    # 3e-4/400ep — all converge centers/class/height but emit 0-volume
    # boxes, mAP3D floored at 0), while the prior reaches mAP3D > 0.5.
    # Init-only (adds one 3-unit bias vector); set config
    # `size_bias_prior: null` for exact reference-init parity.
    size_bias_prior: float | None = 1.0

    @nn.compact
    def __call__(self, batch: jnp.ndarray, ref: Dict[str, jnp.ndarray],
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """batch: (B, N, in_channels) query features; ref: {'center': (B, N, 3)}."""
        kw = dict(in_channels=self.in_channels, use_bias=self.use_bias,
                  dropout=self.dropout, dtype=self.dtype)
        n_cls = self.num_reg_layers if self.cls_layers_from_reg \
            else self.num_cls_layers

        center = _Branch(out_channels=3, num_layers=self.num_reg_layers,
                         name="center_head", **kw)(batch, deterministic)
        size = _Branch(out_channels=3, num_layers=self.num_reg_layers,
                       out_bias_prior=self.size_bias_prior,
                       name="size_head", **kw)(batch, deterministic)
        angle = _Branch(out_channels=2, num_layers=self.num_reg_layers,
                        name="angle_head", **kw)(batch, deterministic)
        logits = _Branch(out_channels=self.num_classes, num_layers=n_cls,
                         name="class_head", **kw)(batch, deterministic)

        # Outputs are cast to float32: they feed the set loss / Hungarian
        # matcher / metrics, which should run in full precision even when
        # the network computes in bfloat16. (No-op for float32 compute.)
        return {
            "class": logits.astype(jnp.float32),
            "center": (center + ref["center"][..., :3]).astype(jnp.float32),
            "size": nn.relu(size).astype(jnp.float32),
            "angle": jnp.tanh(angle).astype(jnp.float32),
        }


class UnaryDetectionHead(LinearDetectionHead):
    cls_layers_from_reg: bool = True


def build_detection_head(name: str, config: Dict[str, Any]):
    from dpft_tpu.models.layers.common import get_compute_dtype
    cls = UnaryDetectionHead if "unary" in name.lower() else LinearDetectionHead
    if "unary" not in name.lower() and "linear" not in name.lower():
        raise ValueError(f"Unknown detection head: {name}")
    return cls(
        in_channels=config["in_channels"],
        num_classes=config["num_classes"],
        num_reg_layers=config.get("num_reg_layers", 1),
        num_cls_layers=config.get("num_cls_layers", 1),
        use_bias=config.get("bias", False),
        dropout=config.get("dropout", 0.0),
        dtype=get_compute_dtype(config),
        # None when the key is explicitly null (exact reference init);
        # defaults to the class default (1.0) when absent.
        size_bias_prior=config.get("size_bias_prior", 1.0),
    )
