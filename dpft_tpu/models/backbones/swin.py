"""Swin Transformer backbones (flax, channel-last) with intermediate returns.

TPU-native equivalent of the torchvision Swin family used by the reference
wrapper (src/dprt/models/backbones/swin.py - stage outputs are already
channel-last there). Returns {'1'..'<multi_scale>'} stage outputs at
strides 4/8/16/32 with dims C, 2C, 4C, 8C.

Swin v1 (Liu et al. 2021): 4x4 patch embedding, stages of alternating
windowed / shifted-window multi-head self-attention blocks with relative
position bias, patch merging between stages. Feature maps are padded to a
multiple of the window size before partitioning and cropped after (static
shapes: all padding is resolved at trace time).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dpft_tpu.models.layers.common import zeros_init

_VARIANTS = {
    # name: (embed_dim, depths, num_heads)
    "swin_t": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
    "swin_s": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
    "swin_b": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
}

_trunc_normal = nn.initializers.truncated_normal(stddev=0.02)
WINDOW = 7


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, w*w, C); H, W divisible by w."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, C)


def _window_reverse(windows: jnp.ndarray, w: int, B: int, H: int,
                    W: int) -> jnp.ndarray:
    C = windows.shape[-1]
    x = windows.reshape(B, H // w, W // w, w, w, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def _relative_position_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij"))  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, w*w, w*w)
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return rel[..., 0] * (2 * w - 1) + rel[..., 1]  # (w*w, w*w)


def _shift_attn_mask(H: int, W: int, w: int, shift_h: int,
                     shift_w: int) -> np.ndarray:
    """(nWindows, w*w, w*w) additive mask for shifted-window attention.

    Per-axis shifts, matching torchvision's shifted_window_attention: an
    axis whose shift is 0 contributes a single all-covering region.
    """
    def slices(shift):
        end = -shift if shift > 0 else None
        return (slice(0, -w), slice(-w, end), slice(end, None))

    img = np.zeros((1, H, W, 1))
    cnt = 0
    for hs in slices(shift_h):
        for ws in slices(shift_w):
            img[:, hs, ws, :] = cnt
            cnt += 1
    windows = np.asarray(
        _window_partition(jnp.asarray(img), w)).reshape(-1, w * w)
    mask = windows[:, None, :] - windows[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: np.ndarray | None) -> jnp.ndarray:
        """x: (nW*B, N, C); mask: (nWindows, N, N) or None."""
        Bn, N, C = x.shape
        H = self.num_heads
        D = C // H

        qkv = nn.Dense(3 * C, kernel_init=_trunc_normal,
                       bias_init=zeros_init, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (Bn, H, N, D)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(D)

        table = self.param(
            "relative_position_bias_table", _trunc_normal,
            ((2 * WINDOW - 1) ** 2, H))
        idx = _relative_position_index(WINDOW)
        bias = table[idx.reshape(-1)].reshape(N, N, H).transpose(2, 0, 1)
        attn = attn + bias[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, H, N, N) \
                + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(Bn, H, N, N)

        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
        return nn.Dense(C, kernel_init=_trunc_normal, bias_init=zeros_init,
                        dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        w = WINDOW
        pad_h = (w - H % w) % w
        pad_w = (w - W % w) % w
        Hp, Wp = H + pad_h, W + pad_w
        # torchvision disables the shift per axis when the padded size is
        # covered by a single window (shifted_window_attention semantics).
        shift_h = self.shift if w < Hp else 0
        shift_w = self.shift if w < Wp else 0

        shortcut = x
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        h = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

        if shift_h or shift_w:
            h = jnp.roll(h, (-shift_h, -shift_w), axis=(1, 2))
            mask = _shift_attn_mask(Hp, Wp, w, shift_h, shift_w)
        else:
            mask = None

        windows = _window_partition(h, w)
        attended = WindowAttention(self.dim, self.num_heads,
                                   dtype=self.dtype, name="attn")(
            windows, mask)
        h = _window_reverse(attended, w, B, Hp, Wp)

        if shift_h or shift_w:
            h = jnp.roll(h, (shift_h, shift_w), axis=(1, 2))
        h = h[:, :H, :W]
        x = shortcut + h

        # MLP
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio),
                     kernel_init=_trunc_normal, bias_init=zeros_init,
                     dtype=self.dtype, name="mlp1")(h)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU is exact erf
        h = nn.Dense(self.dim, kernel_init=_trunc_normal,
                     bias_init=zeros_init, dtype=self.dtype, name="mlp2")(h)
        return x + h


class PatchMerging(nn.Module):
    dim: int  # input dim; output 2 * dim
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False,
                        kernel_init=_trunc_normal, dtype=self.dtype,
                        name="reduction")(x)


class SwinBackbone(nn.Module):
    name_variant: str = "swin_t"
    in_channels: int = 3
    multi_scale: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        embed_dim, depths, num_heads = _VARIANTS[self.name_variant.lower()]

        x = batch
        if self.in_channels != 3:
            x = nn.Conv(3, (1, 1), use_bias=False, kernel_init=_trunc_normal,
                        dtype=self.dtype, name="adjustment")(x)

        x = nn.Conv(embed_dim, (4, 4), strides=(4, 4),
                    kernel_init=_trunc_normal, bias_init=zeros_init,
                    dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        outputs = {}
        dim = embed_dim
        for stage in range(4):
            if stage > 0:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"merge{stage}")(x)
                dim *= 2
            for b in range(depths[stage]):
                shift = 0 if b % 2 == 0 else WINDOW // 2
                x = SwinBlock(dim, num_heads[stage], shift=shift,
                              dtype=self.dtype,
                              name=f"stage{stage + 1}_block{b}")(x)
            outputs[str(stage + 1)] = x
            if stage + 1 >= self.multi_scale:
                break
        return outputs


def build_swin(name: str, config: Dict[str, Any]) -> SwinBackbone:
    from dpft_tpu.models.layers.common import get_compute_dtype
    return SwinBackbone(
        name_variant=name.lower(),
        in_channels=config.get("in_channels", 3),
        multi_scale=config.get("multi_scale", 1),
        dtype=get_compute_dtype(config),
    )
