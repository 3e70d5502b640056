"""Torch reference modules for numerical parity tests.

torchvision is NOT installed in this environment (only torch), so these
modules transliterate the torchvision architectures the reference consumes
(reference src/dprt/models/backbones/{resnet,convnext,swin,regnet}.py wrap
torchvision models) with torchvision's EXACT state_dict key naming. That
lets the parity tests exercise dpft_tpu.models.backbones.torch_weights on
realistic keys AND compare forward outputs numerically.

Each backbone forward returns the per-stage feature maps (NCHW) that the
reference taps via IntermediateLayerGetter / `features` indices.
"""

from __future__ import annotations

from typing import List

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# ResNet (torchvision.models.resnet naming: conv1/bn1/layerL.B.*/fc)
# ---------------------------------------------------------------------------

class TorchBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


_RESNET_STAGES = {
    "resnet18": (TorchBasicBlock, (2, 2, 2, 2)),
    "resnet34": (TorchBasicBlock, (3, 4, 6, 3)),
    "resnet50": (TorchBottleneck, (3, 4, 6, 3)),
    "resnet101": (TorchBottleneck, (3, 4, 23, 3)),
}


class TorchResNet(nn.Module):
    def __init__(self, variant="resnet18"):
        super().__init__()
        block, counts = _RESNET_STAGES[variant]
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.inplanes = 64
        self.layer1 = self._make_layer(block, 64, counts[0], 1)
        self.layer2 = self._make_layer(block, 128, counts[1], 2)
        self.layer3 = self._make_layer(block, 256, counts[2], 2)
        self.layer4 = self._make_layer(block, 512, counts[3], 2)
        self.fc = nn.Linear(512 * block.expansion, 10)

    def _make_layer(self, block, planes, n, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                          stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        layers += [block(self.inplanes, planes) for _ in range(1, n)]
        return nn.Sequential(*layers)

    def forward(self, x) -> List[torch.Tensor]:
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            outs.append(x)
        return outs


# ---------------------------------------------------------------------------
# ConvNeXt (torchvision.models.convnext naming: features.N..., classifier)
# ---------------------------------------------------------------------------

class LayerNorm2d(nn.LayerNorm):
    """Channels-first LayerNorm, as torchvision.models.convnext uses."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = F.layer_norm(x, self.normalized_shape, self.weight, self.bias,
                         self.eps)
        return x.permute(0, 3, 1, 2)


class _Permute(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.dims = dims

    def forward(self, x):
        return x.permute(self.dims)


class CNBlock(nn.Module):
    def __init__(self, dim, layer_scale=1e-6):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True),
            _Permute([0, 2, 3, 1]),
            nn.LayerNorm(dim, eps=1e-6),
            nn.Linear(dim, 4 * dim, bias=True),
            nn.GELU(),
            nn.Linear(4 * dim, dim, bias=True),
            _Permute([0, 3, 1, 2]),
        )
        self.layer_scale = nn.Parameter(torch.ones(dim, 1, 1) * layer_scale)

    def forward(self, x):
        return x + self.layer_scale * self.block(x)


_CONVNEXT_VARIANTS = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
}


class TorchConvNeXt(nn.Module):
    def __init__(self, variant="convnext_tiny"):
        super().__init__()
        depths, dims = _CONVNEXT_VARIANTS[variant]
        features = [nn.Sequential(
            nn.Conv2d(3, dims[0], 4, 4, 0, bias=True),
            LayerNorm2d(dims[0], eps=1e-6),
        )]
        for stage in range(4):
            if stage > 0:
                features.append(nn.Sequential(
                    LayerNorm2d(dims[stage - 1], eps=1e-6),
                    nn.Conv2d(dims[stage - 1], dims[stage], 2, 2),
                ))
            features.append(nn.Sequential(
                *[CNBlock(dims[stage]) for _ in range(depths[stage])]))
        self.features = nn.Sequential(*features)
        self.classifier = nn.Sequential(
            LayerNorm2d(dims[-1], eps=1e-6), nn.Flatten(1),
            nn.Linear(dims[-1], 10))

    def forward(self, x) -> List[torch.Tensor]:
        outs = []
        for i, feat in enumerate(self.features):
            x = feat(x)
            if i % 2 == 1:  # odd indices are block stages
                outs.append(x)
        return outs


# ---------------------------------------------------------------------------
# Swin v1 (torchvision.models.swin_transformer naming)
# ---------------------------------------------------------------------------

def _torch_shifted_window_attention(x, qkv_weight, proj_weight,
                                    relative_position_bias, window_size,
                                    num_heads, shift_size, qkv_bias,
                                    proj_bias):
    """Transliteration of torchvision's shifted_window_attention (v1)."""
    B, H, W, C = x.shape
    pad_r = (window_size[1] - W % window_size[1]) % window_size[1]
    pad_b = (window_size[0] - H % window_size[0]) % window_size[0]
    x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    _, pad_H, pad_W, _ = x.shape

    shift_size = list(shift_size)
    if window_size[0] >= pad_H:
        shift_size[0] = 0
    if window_size[1] >= pad_W:
        shift_size[1] = 0

    if sum(shift_size) > 0:
        x = torch.roll(x, shifts=(-shift_size[0], -shift_size[1]),
                       dims=(1, 2))

    num_windows = (pad_H // window_size[0]) * (pad_W // window_size[1])
    x = x.view(B, pad_H // window_size[0], window_size[0],
               pad_W // window_size[1], window_size[1], C)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(
        B * num_windows, window_size[0] * window_size[1], C)

    qkv = F.linear(x, qkv_weight, qkv_bias)
    qkv = qkv.reshape(x.size(0), x.size(1), 3, num_heads,
                      C // num_heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (C // num_heads) ** -0.5
    attn = q.matmul(k.transpose(-2, -1))
    attn = attn + relative_position_bias

    if sum(shift_size) > 0:
        attn_mask = x.new_zeros((pad_H, pad_W))
        h_slices = ((0, -window_size[0]),
                    (-window_size[0], -shift_size[0] if shift_size[0] else None),
                    (-shift_size[0] if shift_size[0] else None, None))
        w_slices = ((0, -window_size[1]),
                    (-window_size[1], -shift_size[1] if shift_size[1] else None),
                    (-shift_size[1] if shift_size[1] else None, None))
        count = 0
        for h in h_slices:
            for w in w_slices:
                attn_mask[h[0]:h[1], w[0]:w[1]] = count
                count += 1
        attn_mask = attn_mask.view(pad_H // window_size[0], window_size[0],
                                   pad_W // window_size[1], window_size[1])
        attn_mask = attn_mask.permute(0, 2, 1, 3).reshape(
            num_windows, window_size[0] * window_size[1])
        attn_mask = attn_mask.unsqueeze(1) - attn_mask.unsqueeze(2)
        attn_mask = attn_mask.masked_fill(
            attn_mask != 0, float(-100.0)).masked_fill(attn_mask == 0, 0.0)
        attn = attn.view(x.size(0) // num_windows, num_windows, num_heads,
                         x.size(1), x.size(1))
        attn = attn + attn_mask.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, num_heads, x.size(1), x.size(1))

    attn = F.softmax(attn, dim=-1)
    x = attn.matmul(v).transpose(1, 2).reshape(x.size(0), x.size(1), C)
    x = F.linear(x, proj_weight, proj_bias)

    x = x.view(B, pad_H // window_size[0], pad_W // window_size[1],
               window_size[0], window_size[1], C)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, pad_H, pad_W, C)

    if sum(shift_size) > 0:
        x = torch.roll(x, shifts=(shift_size[0], shift_size[1]), dims=(1, 2))

    return x[:, :H, :W, :].contiguous()


class TorchShiftedWindowAttention(nn.Module):
    def __init__(self, dim, window_size, shift_size, num_heads):
        super().__init__()
        self.window_size = window_size
        self.shift_size = shift_size
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window_size[0] - 1) * (2 * window_size[1] - 1),
                        num_heads))
        coords_h = torch.arange(window_size[0])
        coords_w = torch.arange(window_size[1])
        coords = torch.stack(
            torch.meshgrid(coords_h, coords_w, indexing="ij"))
        coords_flatten = torch.flatten(coords, 1)
        relative_coords = (coords_flatten[:, :, None]
                           - coords_flatten[:, None, :])
        relative_coords = relative_coords.permute(1, 2, 0).contiguous()
        relative_coords[:, :, 0] += window_size[0] - 1
        relative_coords[:, :, 1] += window_size[1] - 1
        relative_coords[:, :, 0] *= 2 * window_size[1] - 1
        self.register_buffer("relative_position_index",
                             relative_coords.sum(-1))
        nn.init.normal_(self.relative_position_bias_table, std=0.02)

    def forward(self, x):
        N = self.window_size[0] * self.window_size[1]
        bias = self.relative_position_bias_table[
            self.relative_position_index.flatten()]
        bias = bias.view(N, N, -1).permute(2, 0, 1).contiguous().unsqueeze(0)
        return _torch_shifted_window_attention(
            x, self.qkv.weight, self.proj.weight, bias, self.window_size,
            self.num_heads, self.shift_size, self.qkv.bias, self.proj.bias)


class TorchSwinBlock(nn.Module):
    def __init__(self, dim, num_heads, window_size, shift_size,
                 mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = TorchShiftedWindowAttention(dim, window_size, shift_size,
                                                num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = nn.Sequential(
            nn.Linear(dim, int(dim * mlp_ratio)), nn.GELU(),
            nn.Dropout(0.0), nn.Linear(int(dim * mlp_ratio), dim),
            nn.Dropout(0.0))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class TorchPatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim, eps=1e-5)

    def forward(self, x):
        H, W = x.shape[1], x.shape[2]
        x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
        x0 = x[..., 0::2, 0::2, :]
        x1 = x[..., 1::2, 0::2, :]
        x2 = x[..., 0::2, 1::2, :]
        x3 = x[..., 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], -1)
        return self.reduction(self.norm(x))


_SWIN_VARIANTS = {
    "swin_t": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
}


class TorchSwin(nn.Module):
    """Channel-last throughout, like torchvision (Permute after patch conv)."""

    def __init__(self, variant="swin_t", window=7):
        super().__init__()
        embed_dim, depths, num_heads = _SWIN_VARIANTS[variant]
        features = [nn.Sequential(
            nn.Conv2d(3, embed_dim, 4, 4),
            _Permute([0, 2, 3, 1]),
            nn.LayerNorm(embed_dim, eps=1e-5),
        )]
        dim = embed_dim
        for stage in range(4):
            if stage > 0:
                features.append(TorchPatchMerging(dim))
                dim *= 2
            blocks = []
            for b in range(depths[stage]):
                shift = 0 if b % 2 == 0 else window // 2
                blocks.append(TorchSwinBlock(
                    dim, num_heads[stage], [window, window], [shift, shift]))
            features.append(nn.Sequential(*blocks))
        self.features = nn.Sequential(*features)
        self.norm = nn.LayerNorm(dim, eps=1e-5)
        self.head = nn.Linear(dim, 10)

    def forward(self, x) -> List[torch.Tensor]:
        outs = []
        for i, feat in enumerate(self.features):
            x = feat(x)
            if i % 2 == 1:
                outs.append(x)  # channel-last (B, H, W, C)
        return outs


# ---------------------------------------------------------------------------
# RegNet (torchvision.models.regnet naming: stem / trunk_output.blockS.*)
# ---------------------------------------------------------------------------

class TorchSqueezeExcitation(nn.Module):
    def __init__(self, input_channels, squeeze_channels):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(input_channels, squeeze_channels, 1)
        self.fc2 = nn.Conv2d(squeeze_channels, input_channels, 1)
        self.activation = nn.ReLU()
        self.scale_activation = nn.Sigmoid()

    def forward(self, x):
        s = self.avgpool(x)
        s = self.activation(self.fc1(s))
        s = self.scale_activation(self.fc2(s))
        return x * s


def _conv_bn_act(w_in, w_out, k, stride, groups=1, act=True):
    layers = [
        nn.Conv2d(w_in, w_out, k, stride, k // 2, groups=groups, bias=False),
        nn.BatchNorm2d(w_out),
    ]
    if act:
        layers.append(nn.ReLU(inplace=True))
    return nn.Sequential(*layers)


class TorchRegNetBlock(nn.Module):
    def __init__(self, w_in, w_out, stride, group_width, use_se):
        super().__init__()
        self.proj = None
        if w_in != w_out or stride != 1:
            self.proj = _conv_bn_act(w_in, w_out, 1, stride, act=False)
        groups = w_out // group_width
        f = nn.Sequential()
        f.add_module("a", _conv_bn_act(w_in, w_out, 1, 1))
        f.add_module("b", _conv_bn_act(w_out, w_out, 3, stride, groups))
        if use_se:
            f.add_module("se", TorchSqueezeExcitation(
                w_out, max(1, w_in // 4)))
        f.add_module("c", _conv_bn_act(w_out, w_out, 1, 1, act=False))
        self.f = f
        self.activation = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = x if self.proj is None else self.proj(x)
        return self.activation(identity + self.f(x))


_REGNET_VARIANTS = {
    # name: (depths, widths, group_width, use_se) - must match
    # dpft_tpu.models.backbones.regnet._VARIANTS
    "regnet_y_400mf": ((1, 3, 6, 6), (48, 104, 208, 440), 8, True),
    "regnet_x_400mf": ((1, 2, 7, 12), (32, 64, 160, 400), 16, False),
}


class TorchRegNet(nn.Module):
    def __init__(self, variant="regnet_y_400mf"):
        super().__init__()
        depths, widths, group_width, use_se = _REGNET_VARIANTS[variant]
        self.stem = _conv_bn_act(3, 32, 3, 2)
        trunk = nn.Sequential()
        w_in = 32
        for s, (depth, width) in enumerate(zip(depths, widths)):
            stage = nn.Sequential()
            for b in range(depth):
                stride = 2 if b == 0 else 1
                stage.add_module(
                    f"block{s + 1}-{b}",
                    TorchRegNetBlock(w_in, width, stride, group_width,
                                     use_se))
                w_in = width
            trunk.add_module(f"block{s + 1}", stage)
        self.trunk_output = trunk
        self.fc = nn.Linear(w_in, 10)

    def forward(self, x) -> List[torch.Tensor]:
        x = self.stem(x)
        outs = []
        for stage in self.trunk_output:
            x = stage(x)
            outs.append(x)
        return outs


def randomize_bn_stats(module: nn.Module, seed: int = 0) -> None:
    """Gives BatchNorm buffers non-trivial values so parity tests exercise
    the running-stat conversion (fresh torch BNs have mean 0 / var 1)."""
    gen = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=gen) * 0.5)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=gen) * 1.5 + 0.5)


# ---------------------------------------------------------------------------
# Multi-scale deformable attention core (Deformable-DETR
# ms_deform_attn_core_pytorch transliteration; the reference consumes the
# CUDA equivalent at src/dprt/models/layers/ms_deform_attn.py:27-68).
# ---------------------------------------------------------------------------

def torch_ms_deform_attn_core(value: torch.Tensor, shapes,
                              locations: torch.Tensor,
                              attention: torch.Tensor) -> torch.Tensor:
    """value (B, Len, H, D), locations (B, N, H, L, P, 2) normalized,
    attention (B, N, H, L, P) -> (B, N, H*D)."""
    B, _, H, D = value.shape
    N = locations.shape[1]
    L, P = locations.shape[3], locations.shape[4]
    value_list = value.split([h * w for h, w in shapes], dim=1)
    sampling_grids = 2 * locations - 1
    sampled = []
    for lid, (h, w) in enumerate(shapes):
        value_l_ = value_list[lid].flatten(2).transpose(1, 2).reshape(
            B * H, D, h, w)
        grid_l_ = sampling_grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(F.grid_sample(
            value_l_, grid_l_, mode="bilinear", padding_mode="zeros",
            align_corners=False))
    attention_weights = attention.transpose(1, 2).reshape(B * H, 1, N, L * P)
    output = (torch.stack(sampled, dim=-2).flatten(-2)
              * attention_weights).sum(-1).view(B, H * D, N)
    return output.transpose(1, 2).contiguous()
