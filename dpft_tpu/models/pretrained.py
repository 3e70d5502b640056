"""Pretrained backbone weight resolution and application.

The reference builds torchvision backbones with pretrained weights when the
config's backbone section carries a ``weights`` value (reference
src/dprt/models/backbones/resnet.py:142-167): an official torchvision enum
name (e.g. ``IMAGENET1K_V2``, downloaded from the hub) or a path to a local
state_dict file. This runtime has no network access, so named weights are
resolved against a local weights directory instead:

    1. empty/None               -> random init (skip)
    2. existing file path       -> that state_dict file
    3. name (IMAGENET1K_V2 ...) -> ``<weights_dir>/<backbone>_<name>.<ext>``
       for ext in (npz, pth, pt), where weights_dir is
       ``computing.weights_dir`` in the config, else $DPFT_WEIGHTS_DIR,
       else ``weights/``. A miss warns loudly (the reference would download
       here; we cannot) and falls back to random init.

``apply_pretrained`` merges each resolved state_dict into the model's
initial variables via the torch_weights converters (all four backbone
families). Called by the trainer on fresh (non-resume) initialization.
"""

from __future__ import annotations

import logging
import os
import os.path as osp
from typing import Any, Dict, Optional

import numpy as np

from dpft_tpu.models.backbones.torch_weights import (convert_backbone,
                                                     load_state_dict)

logger = logging.getLogger(__name__)


def resolve_weights(backbone_name: str, weights: Optional[str],
                    config: Dict[str, Any]) -> Optional[str]:
    """Resolves a config ``weights`` value to a local state_dict path."""
    if not weights:
        return None
    if osp.isfile(weights):
        return weights

    weights_dir = (config.get("computing", {}).get("weights_dir")
                   or os.environ.get("DPFT_WEIGHTS_DIR") or "weights")
    stem = f"{backbone_name.lower()}_{weights}"
    for ext in ("npz", "pth", "pt"):
        candidate = osp.join(weights_dir, f"{stem}.{ext}")
        if osp.isfile(candidate):
            return candidate

    logger.warning(
        "Pretrained weights %r for backbone %s not found (looked for %s.* "
        "under %r; set computing.weights_dir or $DPFT_WEIGHTS_DIR). "
        "Falling back to random initialization - training from scratch "
        "will NOT reach the published AP3D.",
        weights, backbone_name, stem, weights_dir)
    return None


def _merge(dst: Dict[str, Any], src: Dict[str, Any], where: str) -> None:
    for key, value in src.items():
        if key not in dst:
            raise KeyError(f"{where}/{key} not in model variables "
                           f"(have {sorted(dst)})")
        if isinstance(value, dict):
            _merge(dst[key], value, f"{where}/{key}")
        else:
            if tuple(dst[key].shape) != tuple(value.shape):
                raise ValueError(
                    f"{where}/{key}: shape {tuple(value.shape)} does not "
                    f"match model {tuple(dst[key].shape)}")
            dst[key] = np.asarray(value, dtype=dst[key].dtype)


def _to_mutable(tree):
    if hasattr(tree, "unfreeze"):  # flax FrozenDict
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def apply_pretrained(variables: Dict[str, Any],
                     config: Dict[str, Any]) -> Dict[str, Any]:
    """Returns variables with every resolvable pretrained backbone merged.

    The 1x1 input-adjust conv of non-RGB backbones stays at its random
    init (it has no torchvision counterpart, reference resnet.py:47-51).
    No-op (returns the input object) when nothing resolves.
    """
    resolved = []
    for input_name, bcfg in config.get("model", {}).get(
            "backbones", {}).items():
        path = resolve_weights(bcfg["name"], bcfg.get("weights"), config)
        if path is not None:
            resolved.append((input_name, bcfg["name"], path))
    if not resolved:
        return variables

    variables = _to_mutable(variables)
    for input_name, backbone_name, path in resolved:
        params, stats = convert_backbone(backbone_name,
                                         load_state_dict(path))
        module = f"backbones_{input_name}"
        _merge(variables["params"][module], params, f"params/{module}")
        if stats:
            _merge(variables["batch_stats"][module], stats,
                   f"batch_stats/{module}")
        logger.info("Loaded pretrained %s weights for %s from %s",
                    backbone_name, input_name, path)
    return variables
