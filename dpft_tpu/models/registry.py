"""Model builder registry and checkpoint IO.

``build('dprt' | 'dpft', config)`` returns the flax module (reference
src/dprt/models/__init__.py:10-12). Checkpoints are Orbax trees holding the
model variables plus metadata; the directory name encodes
``{timestamp}_checkpoint_{epoch:04d}`` so that ``load`` can recover epoch
and timestamp exactly like the reference filename contract
(src/dprt/models/__init__.py:15-18, trainer.py:256-258).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, Tuple

from dpft_tpu.models import dpft as dpft_module


def build(name: str, config: Dict[str, Any]):
    """Builds a model module by registry name ('dprt' kept as an alias)."""
    if name.lower() in {"dprt", "dpft"}:
        return dpft_module.from_config(config)
    raise ValueError(f"Unknown model: {name}")


def save(variables: Dict[str, Any], config: Dict[str, Any], path: str) -> None:
    """Saves model variables + config to an Orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    path = osp.abspath(path)
    os.makedirs(osp.dirname(path), exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, variables, force=True)
    ckptr.wait_until_finished()

    from dpft_tpu.utils.config import save_config
    save_config(config, osp.join(path, "config.json"))


def parse_checkpoint_name(path: str) -> Tuple[int, str]:
    """Parses (epoch, timestamp) from a checkpoint directory name."""
    name = osp.basename(osp.normpath(path))
    parts = name.split("_checkpoint_")
    if len(parts) != 2:
        raise ValueError(f"Not a checkpoint path: {path}")
    return int(parts[1].split(".")[0]), parts[0]


def load(path: str) -> Tuple[Any, Dict[str, Any], int, str]:
    """Loads (module, variables, epoch, timestamp) from a checkpoint."""
    import orbax.checkpoint as ocp

    from dpft_tpu.utils.config import load_config

    path = osp.abspath(path)
    epoch, timestamp = parse_checkpoint_name(path)
    config = load_config(osp.join(path, "config.json"))
    module = build(config["model"]["name"], config)

    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(path)
    return module, variables, epoch, timestamp
