"""Torch full-model DPRT replica with the REFERENCE's state_dict naming.

The reference checkpoint importer (dpft_tpu/models/torch_checkpoint.py)
consumes full-model pickles of the reference DPRT module
(reference src/dprt/models/dprt.py:67-248 + fusers/mpfusion.py:16-749,
saved by trainer.py:256-258). To round-trip-test it without the reference
package, this module rebuilds that composition as torch nn.Modules whose
attribute names produce EXACTLY the reference's state_dict key space:

    backbones.<input>.adjustment_layer.weight / .body.conv1.weight ...
    necks.<input>.fpn.inner_blocks.{i}.0.weight ... (torchvision >= 0.12
        Conv2dNormActivation naming, the published checkpoints' format)
    fuser.mpfusion.fusion{i}.ml_fusion_layers.ms_deform_attn{v}.*
    fuser.heads.{i}.layers.center_head.{j}.weight ...
    fuser.query / fuser.query_embedding.weight
    head.* (the unused template duplicate DPRT also registers)

and whose forward implements the reference semantics (validated transitively:
tests/test_full_model_parity.py pins the same functional pipeline against
the flax model, and test_torch_checkpoint.py pins this module against the
flax model with IMPORTED weights).
"""

from __future__ import annotations

import copy
import math
from typing import Dict, List

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import torch_refs


# ---------------------------------------------------------------------------
# Functional pieces (reference semantics)
# ---------------------------------------------------------------------------

def torch_sinusoidal(x: torch.Tensor, num_feats: int,
                     scale: float = 2 * math.pi,
                     eps: float = 1e-6) -> torch.Tensor:
    """Normalized DETR sine embedding on NCHW input (reference
    sinusoidal.py:63-110); returns x + pos."""
    B, C, H, W = x.shape
    not_mask = torch.ones(B, H, W, dtype=x.dtype)
    y_embed = not_mask.cumsum(1)
    x_embed = not_mask.cumsum(2)
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_feats, dtype=x.dtype)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                        / num_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(),
                         pos_x[..., 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[..., 0::2].sin(),
                         pos_y[..., 1::2].cos()), dim=4).flatten(3)
    pos = (pos_x + pos_y).permute(0, 3, 1, 2)
    return x + pos


def static_query_grid(resolution, minimum, maximum) -> np.ndarray:
    """data_agnostic_static_querent grid: unit linspaces -> min-max scale
    -> meshgrid(ij) -> spher2cart in degrees (reference
    data_agnostic.py:126-172)."""
    axes = []
    for res, mi, ma in zip(resolution, minimum, maximum):
        q = np.linspace(0.0, 1.0, res)
        denom = q.max() - q.min()
        denom = 1.0 if np.isclose(denom, 0.0) else denom
        axes.append((q - q.min()) / denom * (ma - mi) + mi)
    grid = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([g.reshape(-1) for g in grid], axis=-1)
    r, phi, roh = pts[:, 0], np.deg2rad(pts[:, 1]), np.deg2rad(pts[:, 2])
    cart = np.stack([r * np.cos(phi) * np.cos(roh),
                     r * np.sin(phi) * np.cos(roh),
                     r * np.sin(roh)], axis=-1)
    return cart.astype(np.float32)


def torch_reference_points(center, transformation, projection, shape):
    """reference mpfusion.py:617-696 (python `transformation.any()`
    branch)."""
    ones = torch.ones_like(center[..., :1])
    pts = center[..., :3]
    if transformation.any():
        homo = torch.cat([pts, ones], dim=-1)
        tq = torch.einsum("bij,bkj->bki", transformation, homo)
        x, y, z = tq[..., 0], tq[..., 1], tq[..., 2]
        r = torch.sqrt(x * x + y * y + z * z)
        phi = torch.rad2deg(torch.atan2(y, x))
        safe_r = torch.where(r == 0, torch.ones_like(r), r)
        c = torch.where(r == 0, torch.zeros_like(z), z / safe_r)
        roh = torch.rad2deg(torch.asin(torch.clamp(c, -1.0, 1.0)))
        pts = torch.stack([r, phi, roh], dim=-1)
    homo = torch.cat([pts, ones], dim=-1)
    proj = torch.einsum("bij,bkj->bki", projection, homo)
    w = proj[..., 2]
    nonzero = w != 0
    w_safe = torch.where(nonzero, w, torch.ones_like(w))
    u = torch.where(nonzero, proj[..., 0] / w_safe, proj[..., 0])
    v = torch.where(nonzero, proj[..., 1] / w_safe, proj[..., 1])
    u = u / shape[:, 1:2]
    v = v / shape[:, 0:1]
    return torch.clamp(torch.stack([u, v], dim=-1), 0.0, 1.0)


# ---------------------------------------------------------------------------
# Modules (reference attribute naming)
# ---------------------------------------------------------------------------

class TorchMSDeformAttn(nn.Module):
    """Reference MSDeformAttn (ms_deform_attn.py:71-217) with the
    grid-sample core replacing the CUDA kernel."""

    def __init__(self, d_model, n_levels, n_heads, n_points):
        super().__init__()
        self.d_model, self.n_levels = d_model, n_levels
        self.n_heads, self.n_points = n_heads, n_points
        self.sampling_offsets = nn.Linear(
            d_model, n_heads * n_levels * n_points * 2)
        self.attention_weights = nn.Linear(
            d_model, n_heads * n_levels * n_points)
        self.value_proj = nn.Linear(d_model, d_model)
        self.output_proj = nn.Linear(d_model, d_model)

    def forward(self, query, reference_points, input_flatten, shapes):
        B, N, _ = query.shape
        H, L, P = self.n_heads, self.n_levels, self.n_points
        value = self.value_proj(input_flatten).view(
            B, -1, H, self.d_model // H)
        offsets = self.sampling_offsets(query).view(B, N, H, L, P, 2)
        att = F.softmax(
            self.attention_weights(query).view(B, N, H, L * P),
            dim=-1).view(B, N, H, L, P)
        normalizer = torch.tensor([[w, h] for h, w in shapes],
                                  dtype=query.dtype)
        locations = (reference_points[:, :, None, :, None, :]
                     + offsets / normalizer[None, None, None, :, None, :])
        out = torch_refs.torch_ms_deform_attn_core(
            value, shapes, locations, att)
        return self.output_proj(out)


class TorchMLFusion(nn.Module):
    """Reference MLFusion (mpfusion.py:16-263): self-attn -> deformable
    cross-attn -> FFN with residual + optional LayerNorm."""

    def __init__(self, d_model, d_ffn, n_levels, n_heads, n_points,
                 activation="Mish", norm=True):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d_model, n_heads,
                                               batch_first=True)
        self.norm1 = nn.LayerNorm(d_model)
        self.ms_deform_attn = TorchMSDeformAttn(d_model, n_levels, n_heads,
                                                n_points)
        self.norm2 = nn.LayerNorm(d_model)
        self.ffn1 = nn.Linear(d_model, d_ffn)
        self.activation1 = getattr(nn, activation)()
        self.ffn2 = nn.Linear(d_ffn, d_model)
        self.norm3 = nn.LayerNorm(d_model)
        self.use_norm = norm

    def forward(self, query, levels: List[torch.Tensor], ref, query_pos):
        qk = query + query_pos
        out = query + self.self_attn(qk, qk, query, need_weights=False)[0]
        if self.use_norm:
            out = self.norm1(out)

        shapes = tuple((t.shape[1], t.shape[2]) for t in levels)
        flat = torch.cat([t.reshape(t.shape[0], -1, t.shape[-1])
                          for t in levels], dim=1)
        ref_l = ref[:, :, None, :].repeat(1, 1, len(shapes), 1)
        cross = self.ms_deform_attn(out + query_pos, ref_l, flat, shapes)
        out = out + cross
        if self.use_norm:
            out = self.norm2(out)

        h = self.ffn2(self.activation1(self.ffn1(out)))
        out = out + h
        if self.use_norm:
            out = self.norm3(out)
        return out


class TorchUnary1d(nn.Module):
    """Reference Unary1d (layers/unary.py:8-58): 1x1 Conv1d on
    channel-last data, registered under the ``conv1d`` attribute."""

    def __init__(self, in_channels, out_channels, bias=True):
        super().__init__()
        self.conv1d = nn.Conv1d(in_channels, out_channels, 1, bias=bias)

    def forward(self, x):  # (B, N, C) channel-last
        return self.conv1d(x.transpose(1, 2)).transpose(1, 2)


class TorchMPFusion(nn.Module):
    """Reference MPFusion (mpfusion.py:266-514), all six reductions."""

    def __init__(self, m_views, d_model, d_ffn, n_levels, n_heads, n_points,
                 activation="Mish", norm=True, reduction="linear"):
        super().__init__()
        self.m_views, self.d_model = m_views, d_model
        self.reduction, self.use_norm = reduction, norm
        self.ml_fusion_layers = nn.ModuleDict({
            f"ms_deform_attn{v}": TorchMLFusion(
                d_model, d_ffn, n_levels[v], n_heads[v], n_points[v],
                activation, norm)
            for v in range(m_views)
        })
        cv = m_views * d_model
        if reduction == "linear":
            self.reduction_layer = nn.Linear(cv, d_model, bias=False)
        elif reduction == "unary":
            self.reduction_layer = TorchUnary1d(cv, d_model, bias=False)
        elif reduction == "cross-attn":
            self.reduction_layer = nn.MultiheadAttention(
                d_model, min(n_heads), kdim=cv, vdim=cv, batch_first=True)
        elif reduction == "ffn":
            self.reduction_layer = nn.ModuleDict({
                "ffn1": nn.Linear(cv, cv),
                "activation1": getattr(nn, activation)(),
                "ffn2": nn.Linear(cv, d_model),
                "downsample1": nn.Linear(cv, d_model),
                "norm1": nn.LayerNorm(d_model),
            })
        elif reduction in ("mean", "max"):
            self.reduction_layer = None
        else:
            raise ValueError(reduction)

    def forward(self, query, batch, reference_points, query_pos):
        views = [
            layer(query, batch[v], reference_points[v], query_pos)
            for v, layer in enumerate(self.ml_fusion_layers.values())
        ]
        stacked = torch.stack(views, dim=-1)  # (B, N, C, V)
        B, N = query.shape[:2]
        flat = stacked.reshape(B, N, self.d_model * self.m_views)
        if self.reduction == "mean":
            return stacked.mean(-1)
        if self.reduction == "max":
            return stacked.max(-1).values
        if self.reduction in ("linear", "unary"):
            return self.reduction_layer(flat)
        if self.reduction == "cross-attn":
            return self.reduction_layer(query + query_pos, flat, flat,
                                        need_weights=False)[0]
        r = self.reduction_layer  # 'ffn' (reference mpfusion.py:450-470)
        out = r["ffn2"](r["activation1"](r["ffn1"](flat)))
        out = r["downsample1"](flat) + out
        if self.use_norm:
            out = r["norm1"](out)
        return out


class TorchLinearDetectionHead(nn.Module):
    """Reference LinearDetectionHead (detection.py:149-275), bias-free
    branches of Sequential(Linear, ReLU, Dropout, ..., Linear)."""

    def __init__(self, in_channels, num_classes, num_reg_layers=2,
                 num_cls_layers=2, bias=False, dropout=0.0):
        super().__init__()

        def branch(out_channels, n_layers):
            seq = []
            for _ in range(n_layers - 1):
                seq += [nn.Linear(in_channels, in_channels, bias=bias),
                        nn.ReLU(), nn.Dropout(dropout)]
            seq.append(nn.Linear(in_channels, out_channels, bias=bias))
            return nn.Sequential(*seq)

        self.layers = nn.ModuleDict({
            "center_head": branch(3, num_reg_layers),
            "size_head": branch(3, num_reg_layers),
            "angle_head": branch(2, num_reg_layers),
            "class_head": branch(num_classes, num_cls_layers),
        })

    def forward(self, batch, ref):
        out = {
            "class": self.layers["class_head"](batch),
            "center": self.layers["center_head"](batch),
            "size": F.relu(self.layers["size_head"](batch)),
            "angle": torch.tanh(self.layers["angle_head"](batch)),
        }
        out["center"] = out["center"] + ref["center"][..., :3]
        return out


class TorchUnaryDetectionHead(nn.Module):
    """Reference UnaryDetectionHead (detection.py:13-146): Unary1d
    branches; quirk: the class branch is sized with num_reg_layers
    (detection.py:86)."""

    def __init__(self, in_channels, num_classes, num_reg_layers=2,
                 num_cls_layers=2, bias=False, dropout=0.0):
        super().__init__()

        def branch(out_channels, n_layers):
            seq = []
            for _ in range(n_layers - 1):
                seq += [TorchUnary1d(in_channels, in_channels, bias=bias),
                        nn.ReLU(), nn.Dropout(dropout)]
            seq.append(TorchUnary1d(in_channels, out_channels, bias=bias))
            return nn.Sequential(*seq)

        self.layers = nn.ModuleDict({
            "center_head": branch(3, num_reg_layers),
            "size_head": branch(3, num_reg_layers),
            "angle_head": branch(2, num_reg_layers),
            "class_head": branch(num_classes, num_reg_layers),  # quirk
        })

    def forward(self, batch, ref):
        out = {
            "class": self.layers["class_head"](batch),
            "center": self.layers["center_head"](batch),
            "size": F.relu(self.layers["size_head"](batch)),
            "angle": torch.tanh(self.layers["angle_head"](batch)),
        }
        out["center"] = out["center"] + ref["center"][..., :3]
        return out


class TorchIMPFusion(nn.Module):
    """Reference IMPFusion (mpfusion.py:517-749)."""

    def __init__(self, i_iter, m_views, d_model, d_ffn, n_queries,
                 n_levels, n_heads, n_points, head, activation="Mish",
                 norm=True, reduction="linear"):
        super().__init__()
        self.i_iter = i_iter
        self.mpfusion = nn.ModuleDict({
            f"fusion{i}": TorchMPFusion(m_views, d_model, d_ffn, n_levels,
                                        n_heads, n_points, activation, norm,
                                        reduction)
            for i in range(i_iter)
        })
        self.heads = nn.ModuleList(
            [copy.deepcopy(head) for _ in range(i_iter)])
        self.query_embedding = nn.Embedding(n_queries, d_model)
        query = torch.empty((n_queries, d_model))
        nn.init.uniform_(query)
        self.query = nn.Parameter(query)

    def forward(self, batch, shape, projection, out):
        B = out["center"].shape[0]
        query = self.query.unsqueeze(0).repeat(B, 1, 1)
        query_pos = self.query_embedding.weight.unsqueeze(0).repeat(B, 1, 1)
        for i in range(self.i_iter):
            refs = [
                torch_reference_points(out["center"][..., :3], t, p, s)
                for (t, p), s in zip(projection, shape)
            ]
            query = self.mpfusion[f"fusion{i}"](query, batch, refs,
                                                query_pos)
            out = self.heads[i](query, out)
        return out


class TorchFPNNeck(nn.Module):
    """Reference FPN wrapper (necks/fpn.py:11-88) with torchvision >= 0.12
    Conv2dNormActivation key naming (inner_blocks.{i}.0.weight)."""

    def __init__(self, in_channels_list, out_channels):
        super().__init__()
        fpn = nn.Module()
        fpn.inner_blocks = nn.ModuleList([
            nn.Sequential(nn.Conv2d(c, out_channels, 1))
            for c in in_channels_list
        ])
        fpn.layer_blocks = nn.ModuleList([
            nn.Sequential(nn.Conv2d(out_channels, out_channels, 3,
                                    padding=1))
            for _ in in_channels_list
        ])
        self.fpn = fpn

    def forward(self, levels: List[torch.Tensor]) -> List[torch.Tensor]:
        laterals = [blk(t) for blk, t in zip(self.fpn.inner_blocks, levels)]
        results = [None] * len(levels)
        last = laterals[-1]
        results[-1] = self.fpn.layer_blocks[-1](last)
        for i in range(len(levels) - 2, -1, -1):
            up = F.interpolate(last, size=laterals[i].shape[-2:],
                               mode="nearest")
            last = laterals[i] + up
            results[i] = self.fpn.layer_blocks[i](last)
        return results


class TorchBackbone(nn.Module):
    """Reference Backbone wrapper (backbones/resnet.py:13-107): 1x1
    channel-adjust (bias-free) + torchvision body."""

    def __init__(self, variant="resnet18", in_channels=3):
        super().__init__()
        if in_channels != 3:
            self.adjustment_layer = nn.Conv2d(in_channels, 3, 1, bias=False)
        else:
            self.adjustment_layer = nn.Identity()
        self.body = torch_refs.TorchResNet(variant)
        # IntermediateLayerGetter drops the classifier (resnet.py:54-55).
        del self.body.fc

    def forward(self, x):
        return self.body(self.adjustment_layer(x))


class TorchDPRT(nn.Module):
    """Reference DPRT (dprt.py:67-248) at configurable scale.

    Parameter-free submodules (sinusoidal embeddings, the data-agnostic
    querent) are realized functionally in forward; they register no
    state_dict keys, exactly like the reference's.
    """

    def __init__(self, inputs, backbones, necks, querent_cfg, fuser,
                 head, d_model):
        super().__init__()
        self.inputs = list(inputs)
        self.d_model = d_model
        self.backbones = nn.ModuleDict(backbones)
        self.necks = nn.ModuleDict(necks)
        self.querent_grid = static_query_grid(**querent_cfg)
        self.fuser = fuser
        self.head = head  # unused template, kept for key-space parity

    def forward(self, batch: Dict[str, torch.Tensor]):
        feats = {}
        for name in self.inputs:
            raw = batch[name].permute(0, 3, 1, 2)  # to NCHW
            stages = self.backbones[name](raw)
            levels = [raw] + stages  # skiplink (dprt.py:164-179)
            levels = self.necks[name](levels)
            levels = [torch_sinusoidal(t, self.d_model) for t in levels]
            feats[name] = [t.permute(0, 2, 3, 1).contiguous()
                           for t in levels]

        B = batch[self.inputs[0]].shape[0]
        center = torch.from_numpy(
            np.tile(self.querent_grid[None], (B, 1, 1)))
        out = {"center": center}

        projection = [
            (batch[f"label_to_{name}_t"], batch[f"label_to_{name}_p"])
            for name in self.inputs
        ]
        shape = [batch[f"{name}_shape"][:, :2] for name in self.inputs]
        return self.fuser([feats[n] for n in self.inputs], shape,
                          projection, out)


def build_tiny_dprt(config: Dict, seed: int = 0) -> TorchDPRT:
    """Builds a TorchDPRT from a dpft_tpu-style config dict (the tiny
    parity-test scale), with randomized BN stats so conversion of running
    statistics is exercised."""
    torch.manual_seed(seed)
    model_cfg = config["model"]
    inputs = model_cfg["inputs"]
    d_model = model_cfg["fuser"]["d_model"]

    backbones = {}
    for name in inputs:
        bcfg = model_cfg["backbones"][name]
        backbones[name] = TorchBackbone(
            bcfg["name"].lower(), bcfg.get("in_channels", 3))
        torch_refs.randomize_bn_stats(backbones[name],
                                      seed=hash(name) % 1000)

    necks = {
        name: TorchFPNNeck(model_cfg["necks"][name]["in_channels_list"],
                           model_cfg["necks"][name]["out_channels"])
        for name in inputs
    }

    q = model_cfg["querent"]
    querent_cfg = dict(resolution=q["resolution"], minimum=q["minimum"],
                       maximum=q["maximum"])

    h = model_cfg["head"]
    head = TorchLinearDetectionHead(
        h["in_channels"], h["num_classes"], h.get("num_reg_layers", 1),
        h.get("num_cls_layers", 1), h.get("bias", False))

    f = model_cfg["fuser"]
    fuser = TorchIMPFusion(
        f["i_iter"], f["m_views"], f["d_model"], f["d_ffn"],
        f["n_queries"], f["n_levels"], f["n_heads"], f["n_points"],
        head, f.get("activation", "ReLU"), f.get("norm", False))

    return TorchDPRT(inputs, backbones, necks, querent_cfg, fuser, head,
                     d_model).eval()
