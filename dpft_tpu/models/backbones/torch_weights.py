"""Torchvision ResNet state_dict -> flax parameter tree converter.

The reference loads pretrained IMAGENET1K_V2 backbones from torchvision
(reference resnet.py:151-167). This runtime has no network access, so
pretrained weights must be supplied as a local ``.pt``/``.pth`` state_dict
(or a numpy ``.npz`` with the same key names); this module maps them onto
dpft_tpu.models.backbones.resnet.ResNetBackbone's parameter layout.

Key mapping (torchvision -> flax):
    conv1.weight                  -> params/conv1/kernel        (OIHW->HWIO)
    bn1.{weight,bias}             -> params/bn1/{scale,bias}
    bn1.running_{mean,var}        -> batch_stats/bn1/{mean,var}
    layer{L}.{B}.conv{i}.weight   -> params/layer{L}_block{B}/conv{i}/kernel
    layer{L}.{B}.bn{i}.*          -> params|batch_stats/layer{L}_block{B}/bn{i}/*
    layer{L}.{B}.downsample.0/1.* -> .../down_conv, down_bn
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _to_numpy(value) -> np.ndarray:
    if hasattr(value, "detach"):
        return value.detach().cpu().numpy()
    return np.asarray(value)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Loads a torch state_dict file (or .npz) into numpy arrays."""
    if path.endswith(".npz"):
        with np.load(path) as data:
            return {k: data[k] for k in data.files}
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: _to_numpy(v) for k, v in state.items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_resnet(state: Dict[str, np.ndarray]
                   ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Converts a torchvision ResNet state_dict.

    Returns:
        (params, batch_stats) trees matching ResNetBackbone's layout
        (fc.* classifier weights are dropped - the backbone has no head).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = leaf

    for key, value in state.items():
        if key.startswith("fc.") or key.endswith("num_batches_tracked"):
            continue

        m = re.match(r"^conv1\.weight$", key)
        if m:
            put(params, ("conv1", "kernel"), _conv_kernel(value))
            continue
        m = re.match(r"^bn1\.(weight|bias|running_mean|running_var)$", key)
        if m:
            _put_bn(params, stats, ("bn1",), m.group(1), value)
            continue

        m = re.match(r"^layer(\d)\.(\d+)\.(conv\d)\.weight$", key)
        if m:
            block = f"layer{m.group(1)}_block{m.group(2)}"
            put(params, (block, m.group(3), "kernel"), _conv_kernel(value))
            continue
        m = re.match(r"^layer(\d)\.(\d+)\.(bn\d)\."
                     r"(weight|bias|running_mean|running_var)$", key)
        if m:
            block = f"layer{m.group(1)}_block{m.group(2)}"
            _put_bn(params, stats, (block, m.group(3)), m.group(4), value)
            continue

        m = re.match(r"^layer(\d)\.(\d+)\.downsample\.0\.weight$", key)
        if m:
            block = f"layer{m.group(1)}_block{m.group(2)}"
            put(params, (block, "down_conv", "kernel"), _conv_kernel(value))
            continue
        m = re.match(r"^layer(\d)\.(\d+)\.downsample\.1\."
                     r"(weight|bias|running_mean|running_var)$", key)
        if m:
            block = f"layer{m.group(1)}_block{m.group(2)}"
            _put_bn(params, stats, (block, "down_bn"), m.group(3), value)
            continue

        raise ValueError(f"Unmapped torchvision key: {key}")

    return params, stats


def _put_bn(params, stats, path, field, value):
    def put(tree, p, leaf):
        node = tree
        for key in p[:-1]:
            node = node.setdefault(key, {})
        node[p[-1]] = leaf

    if field == "weight":
        put(params, path + ("scale",), value)
    elif field == "bias":
        put(params, path + ("bias",), value)
    elif field == "running_mean":
        put(stats, path + ("mean",), value)
    elif field == "running_var":
        put(stats, path + ("var",), value)


def apply_to_backbone(variables: Dict[str, Any], backbone_name: str,
                      state_path: str) -> Dict[str, Any]:
    """Returns a copy of a model's variables with one backbone's params
    replaced by converted torchvision weights.

    Arguments:
        variables: the full model variable tree ({'params', 'batch_stats'}).
        backbone_name: the flax submodule name of the backbone, e.g.
            'backbones_camera_mono'.
        state_path: path to the torchvision state_dict file.
    """
    import jax

    state = load_state_dict(state_path)
    params, stats = convert_resnet(state)

    new_vars = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v)
            else:
                assert dst[k].shape == v.shape, (k, dst[k].shape, v.shape)
                dst[k] = v.astype(dst[k].dtype) if hasattr(v, "astype") else v

    import copy
    new_params = copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, variables["params"]))
    new_stats = copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, variables["batch_stats"]))
    merge(new_params[backbone_name], params)
    merge(new_stats[backbone_name], stats)
    return {"params": new_params, "batch_stats": new_stats}
