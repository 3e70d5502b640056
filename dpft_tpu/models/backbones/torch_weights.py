"""Torchvision backbone state_dict -> flax parameter tree converters.

The reference loads pretrained IMAGENET1K_V2 backbones from torchvision
(reference resnet.py:151-167). This runtime has no network access, so
pretrained weights must be supplied as a local ``.pt``/``.pth`` state_dict
(or a numpy ``.npz`` with the same key names); this module maps them onto
the flax backbones' parameter layouts. ``convert_backbone`` dispatches on
the backbone family name (ResNet / ConvNeXt / Swin / RegNet).

ResNet key mapping (torchvision -> flax):
    conv1.weight                  -> params/conv1/kernel        (OIHW->HWIO)
    bn1.{weight,bias}             -> params/bn1/{scale,bias}
    bn1.running_{mean,var}        -> batch_stats/bn1/{mean,var}
    layer{L}.{B}.conv{i}.weight   -> params/layer{L}_block{B}/conv{i}/kernel
    layer{L}.{B}.bn{i}.*          -> params|batch_stats/layer{L}_block{B}/bn{i}/*
    layer{L}.{B}.downsample.0/1.* -> .../down_conv, down_bn

ConvNeXt / Swin / RegNet mappings are documented at their converters; the
torchvision module naming they consume is the `features.*` /
`trunk_output.*` scheme of torchvision 0.15+ (numeric Sequential indices).
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

    for key, value in state.items():
        if key.startswith("fc.") or key.endswith("num_batches_tracked"):
            continue

        m = re.match(r"^conv1\.weight$", key)
        if m:
            _put(params, ("conv1", "kernel"), _conv_kernel(value))
            continue
        m = re.match(r"^bn1\.(weight|bias|running_mean|running_var)$", key)
        if m:
            _put_bn(params, stats, ("bn1",), m.group(1), value)
            continue

        m = re.match(r"^layer(\d)\.(\d+)\.(conv\d)\.weight$", key)
        if m:
            block = f"layer{m.group(1)}_block{m.group(2)}"
            _put(params, (block, m.group(3), "kernel"), _conv_kernel(value))
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
            _put(params, (block, "down_conv", "kernel"), _conv_kernel(value))
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
    if field == "weight":
        _put(params, path + ("scale",), value)
    elif field == "bias":
        _put(params, path + ("bias",), value)
    elif field == "running_mean":
        _put(stats, path + ("mean",), value)
    elif field == "running_var":
        _put(stats, path + ("var",), value)


def _put(tree, path, leaf):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = leaf


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear (out, in) -> flax Dense (in, out)."""
    return np.transpose(w, (1, 0))


def convert_convnext(state: Dict[str, np.ndarray]
                     ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Converts a torchvision ConvNeXt state_dict.

    torchvision layout (ConvNeXt `features` Sequential): index 0 is the
    stem Conv2dNormActivation (conv + LayerNorm2d), odd indices are block
    stages (CNBlock: block.0 depthwise conv, block.2 LayerNorm, block.3/5
    Linear, plus `layer_scale` (C,1,1)), even indices >= 2 are downsample
    Sequentials (0: LayerNorm2d, 1: conv). `classifier.*` is dropped.
    """
    params: Dict[str, Any] = {}

    for key, value in state.items():
        if key.startswith("classifier."):
            continue
        m = re.match(r"^features\.0\.0\.(weight|bias)$", key)
        if m:
            leaf = _conv_kernel(value) if m.group(1) == "weight" else value
            _put(params, ("stem_conv",
                          "kernel" if m.group(1) == "weight" else "bias"),
                 leaf)
            continue
        m = re.match(r"^features\.0\.1\.(weight|bias)$", key)
        if m:
            _put(params, ("stem_norm",
                          "scale" if m.group(1) == "weight" else "bias"),
                 value)
            continue
        m = re.match(r"^features\.(\d)\.(\d+)\.block\.(\d)\.(weight|bias)$",
                     key)
        if m:
            f, b, sub, field = (int(m.group(1)), m.group(2), int(m.group(3)),
                                m.group(4))
            block = (f"stage{(f + 1) // 2}_block{b}",)
            name = {0: "dwconv", 2: "norm", 3: "pw1", 5: "pw2"}[sub]
            if name == "dwconv":
                leaf = _conv_kernel(value) if field == "weight" else value
                _put(params, block + (name,
                     "kernel" if field == "weight" else "bias"), leaf)
            elif name == "norm":
                _put(params, block + (name,
                     "scale" if field == "weight" else "bias"), value)
            else:
                leaf = _linear_kernel(value) if field == "weight" else value
                _put(params, block + (name,
                     "kernel" if field == "weight" else "bias"), leaf)
            continue
        m = re.match(r"^features\.(\d)\.(\d+)\.layer_scale$", key)
        if m:
            f, b = int(m.group(1)), m.group(2)
            _put(params, (f"stage{(f + 1) // 2}_block{b}", "gamma"),
                 value.reshape(-1))
            continue
        m = re.match(r"^features\.(\d)\.0\.(weight|bias)$", key)
        if m and int(m.group(1)) % 2 == 0:
            _put(params, (f"down{int(m.group(1)) // 2}_norm",
                          "scale" if m.group(2) == "weight" else "bias"),
                 value)
            continue
        m = re.match(r"^features\.(\d)\.1\.(weight|bias)$", key)
        if m and int(m.group(1)) % 2 == 0:
            leaf = _conv_kernel(value) if m.group(2) == "weight" else value
            _put(params, (f"down{int(m.group(1)) // 2}_conv",
                          "kernel" if m.group(2) == "weight" else "bias"),
                 leaf)
            continue
        raise ValueError(f"Unmapped torchvision ConvNeXt key: {key}")

    return params, {}


def convert_swin(state: Dict[str, np.ndarray]
                 ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Converts a torchvision Swin (v1) state_dict.

    torchvision layout: features.0 = patch embed (conv + LayerNorm),
    features.{1,3,5,7} = block stages (norm1/2, attn.{qkv,proj,
    relative_position_bias_table}, mlp.0/3), features.{2,4,6} =
    PatchMerging (reduction Linear no-bias, norm). The classifier-side
    `norm.*` / `head.*` and the `relative_position_index` buffers are
    dropped.
    """
    params: Dict[str, Any] = {}

    def block_path(f: int, b: str) -> Tuple[str, ...]:
        return (f"stage{(f + 1) // 2}_block{b}",)

    for key, value in state.items():
        if (key.startswith("head.") or key.startswith("norm.")
                or key.endswith("relative_position_index")):
            continue
        m = re.match(r"^features\.0\.0\.(weight|bias)$", key)
        if m:
            leaf = _conv_kernel(value) if m.group(1) == "weight" else value
            _put(params, ("patch_embed",
                          "kernel" if m.group(1) == "weight" else "bias"),
                 leaf)
            continue
        m = re.match(r"^features\.0\.2\.(weight|bias)$", key)
        if m:
            _put(params, ("patch_norm",
                          "scale" if m.group(1) == "weight" else "bias"),
                 value)
            continue
        m = re.match(r"^features\.(\d)\.(\d+)\.(norm1|norm2)\.(weight|bias)$",
                     key)
        if m:
            _put(params, block_path(int(m.group(1)), m.group(2))
                 + (m.group(3),
                    "scale" if m.group(4) == "weight" else "bias"), value)
            continue
        m = re.match(r"^features\.(\d)\.(\d+)\.attn\.(qkv|proj)\."
                     r"(weight|bias)$", key)
        if m:
            leaf = _linear_kernel(value) if m.group(4) == "weight" else value
            _put(params, block_path(int(m.group(1)), m.group(2))
                 + ("attn", m.group(3),
                    "kernel" if m.group(4) == "weight" else "bias"), leaf)
            continue
        m = re.match(r"^features\.(\d)\.(\d+)\.attn\."
                     r"relative_position_bias_table$", key)
        if m:
            _put(params, block_path(int(m.group(1)), m.group(2))
                 + ("attn", "relative_position_bias_table"), value)
            continue
        m = re.match(r"^features\.(\d)\.(\d+)\.mlp\.(0|3)\.(weight|bias)$",
                     key)
        if m:
            name = "mlp1" if m.group(3) == "0" else "mlp2"
            leaf = _linear_kernel(value) if m.group(4) == "weight" else value
            _put(params, block_path(int(m.group(1)), m.group(2))
                 + (name, "kernel" if m.group(4) == "weight" else "bias"),
                 leaf)
            continue
        m = re.match(r"^features\.(\d)\.norm\.(weight|bias)$", key)
        if m:
            _put(params, (f"merge{int(m.group(1)) // 2}", "norm",
                          "scale" if m.group(2) == "weight" else "bias"),
                 value)
            continue
        m = re.match(r"^features\.(\d)\.reduction\.weight$", key)
        if m:
            _put(params, (f"merge{int(m.group(1)) // 2}", "reduction",
                          "kernel"), _linear_kernel(value))
            continue
        raise ValueError(f"Unmapped torchvision Swin key: {key}")

    return params, {}


def convert_regnet(state: Dict[str, np.ndarray]
                   ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Converts a torchvision RegNet state_dict.

    torchvision layout: stem.0 conv + stem.1 BN; blocks at
    trunk_output.block{S}.block{S}-{B} with f.a.{0,1} (1x1 conv + BN),
    f.b.{0,1} (grouped 3x3 + BN), optional f.se.fc{1,2} (1x1 convs),
    f.c.{0,1} (1x1 + BN), optional proj.{0,1} (downsample conv + BN).
    `fc.*` is dropped.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    sub_map = {"f.a.0": "conv1", "f.b.0": "conv2", "f.c.0": "conv3",
               "proj.0": "down_conv"}
    bn_map = {"f.a.1": "bn1", "f.b.1": "bn2", "f.c.1": "bn3",
              "proj.1": "down_bn"}

    for key, value in state.items():
        if key.startswith("fc.") or key.endswith("num_batches_tracked"):
            continue
        m = re.match(r"^stem\.0\.weight$", key)
        if m:
            _put(params, ("stem", "kernel"), _conv_kernel(value))
            continue
        m = re.match(r"^stem\.1\.(weight|bias|running_mean|running_var)$",
                     key)
        if m:
            _put_bn(params, stats, ("stem_bn",), m.group(1), value)
            continue
        m = re.match(r"^trunk_output\.block(\d)\.block\d-(\d+)\."
                     r"(f\.[abc]\.0|proj\.0)\.weight$", key)
        if m:
            block = f"block{m.group(1)}_{m.group(2)}"
            _put(params, (block, sub_map[m.group(3)], "kernel"),
                 _conv_kernel(value))
            continue
        m = re.match(r"^trunk_output\.block(\d)\.block\d-(\d+)\."
                     r"(f\.[abc]\.1|proj\.1)\."
                     r"(weight|bias|running_mean|running_var)$", key)
        if m:
            block = f"block{m.group(1)}_{m.group(2)}"
            _put_bn(params, stats, (block, bn_map[m.group(3)]), m.group(4),
                    value)
            continue
        m = re.match(r"^trunk_output\.block(\d)\.block\d-(\d+)\."
                     r"f\.se\.fc(1|2)\.(weight|bias)$", key)
        if m:
            block = f"block{m.group(1)}_{m.group(2)}"
            leaf = _conv_kernel(value) if m.group(4) == "weight" else value
            _put(params, (block, "se", f"fc{m.group(3)}",
                          "kernel" if m.group(4) == "weight" else "bias"),
                 leaf)
            continue
        raise ValueError(f"Unmapped torchvision RegNet key: {key}")

    return params, stats


def convert_backbone(name: str, state: Dict[str, np.ndarray]
                     ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Dispatches on the backbone family name (substring match, like the
    backbone registry) and returns (params, batch_stats) trees."""
    lname = name.lower()
    if "resnet" in lname:
        return convert_resnet(state)
    if "convnext" in lname:
        return convert_convnext(state)
    if "swin" in lname:
        return convert_swin(state)
    if "regnet" in lname:
        return convert_regnet(state)
    raise ValueError(f"No torchvision weight converter for backbone: {name}")


def apply_to_backbone(variables: Dict[str, Any], backbone_name: str,
                      state_path: str,
                      family: str = "resnet") -> Dict[str, Any]:
    """Returns a copy of a model's variables with one backbone's params
    replaced by converted torchvision weights.

    Arguments:
        variables: the full model variable tree ({'params', 'batch_stats'}).
        backbone_name: the flax submodule name of the backbone, e.g.
            'backbones_camera_mono'.
        state_path: path to the torchvision state_dict file.
        family: backbone family for converter dispatch ('ResNet50',
            'ConvNeXt_T', ... — substring match like the registry). The
            flax submodule name alone cannot identify the family.
    """
    import jax

    state = load_state_dict(state_path)
    params, stats = convert_backbone(family, state)

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
    merge(new_params[backbone_name], params)
    out = {"params": new_params}
    if "batch_stats" in variables:  # ConvNeXt/Swin backbones carry none
        new_stats = copy.deepcopy(
            jax.tree_util.tree_map(np.asarray, variables["batch_stats"]))
        if stats:
            merge(new_stats[backbone_name], stats)
        out["batch_stats"] = new_stats
    return out
