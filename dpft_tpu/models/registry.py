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


class CheckpointSaver:
    """Asynchronous per-epoch checkpoint writer.

    Orbax's StandardCheckpointer is an AsyncCheckpointer: ``save`` returns
    once the device->host copy is done and commits (atomic directory
    rename) in a background thread, overlapping serialization with the
    next training epoch. config.json can only be written into the
    checkpoint directory after that commit, so it is deferred until the
    next ``wait()`` (called before each subsequent save and at the end of
    training). The reference blocks training on a full-model pickle every
    epoch instead (reference trainer.py:256-258).
    """

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ckptr = ocp.StandardCheckpointer()
        self._pending = None  # (path, config) of the in-flight save

    def save(self, variables: Dict[str, Any], config: Dict[str, Any],
             path: str, wait: bool = False) -> None:
        self.wait()  # finalize any in-flight save first
        path = osp.abspath(path)
        os.makedirs(osp.dirname(path), exist_ok=True)
        self._ckptr.save(path, variables, force=True)
        self._pending = (path, config)
        if wait:
            self.wait()

    def wait(self) -> None:
        """Blocks until the in-flight save committed; writes config.json."""
        if self._pending is None:
            return
        self._ckptr.wait_until_finished()
        path, config = self._pending
        self._pending = None

        from dpft_tpu.utils.config import save_config
        save_config(config, osp.join(path, "config.json"))


def save(variables: Dict[str, Any], config: Dict[str, Any], path: str) -> None:
    """Saves model variables + config to an Orbax checkpoint directory."""
    CheckpointSaver().save(variables, config, path, wait=True)


def parse_checkpoint_name(path: str) -> Tuple[int, str]:
    """Parses (epoch, timestamp) from a checkpoint directory name."""
    name = osp.basename(osp.normpath(path))
    parts = name.split("_checkpoint_")
    if len(parts) != 2:
        raise ValueError(f"Not a checkpoint path: {path}")
    return int(parts[1].split(".")[0]), parts[0]


# Trainer-state keys stored next to the model collections when
# train.save_optimizer is enabled (exact resume); model.apply must only
# ever see flax collections.
TRAINER_STATE_KEYS = ("opt_state_leaves", "step")


def model_collections(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Strips trainer-state keys, keeping only flax variable collections."""
    return {k: v for k, v in variables.items()
            if k not in TRAINER_STATE_KEYS}


def checkpoint_config(path: str,
                      fallback: Dict[str, Any] = None) -> Dict[str, Any]:
    """Resolves the config a checkpoint was trained with.

    Order: the embedded ``<ckpt>/config.json`` (written once the async
    orbax commit finalizes) -> the run directory's snapshot
    ``<dst>/<ts>/config.json`` (written at training start, so it covers a
    run killed inside the async-commit window whose newest checkpoint has
    no embedded copy yet) -> the caller-provided fallback.
    """
    from dpft_tpu.utils.config import load_config

    path = osp.abspath(path)
    if osp.isfile(path):
        # File checkpoint (reference torch .pt): the config snapshot sits
        # next to it in the run directory (reference train.py:53 writes
        # <dst>/<ts>/config.json beside the per-epoch checkpoints).
        candidates = (osp.join(osp.dirname(path), "config.json"),)
    else:
        candidates = (
            osp.join(path, "config.json"),
            osp.join(osp.dirname(osp.dirname(path)), "config.json"),
        )
    for candidate in candidates:
        if osp.isfile(candidate):
            return load_config(candidate)
    if fallback is not None:
        return fallback
    raise FileNotFoundError(
        f"No config found for checkpoint {path} (looked for "
        f"{candidates}); pass one explicitly (e.g. the export CLI's "
        "--cfg)")


def load(path: str, config: Dict[str, Any] = None
         ) -> Tuple[Any, Dict[str, Any], int, str]:
    """Loads (module, variables, epoch, timestamp) from a checkpoint.

    ``config`` is a fallback used only when neither the checkpoint nor
    its run directory carries a config snapshot (checkpoint_config).

    Two formats dispatch on the path: an Orbax checkpoint DIRECTORY (this
    framework's native format), or a reference torch ``.pt``/``.pth`` FILE
    (full-model pickle or state_dict) imported via
    ``models/torch_checkpoint.py`` - so the published reference checkpoints
    (reference README.md:23-24) evaluate on TPU directly. Both use the
    ``{timestamp}_checkpoint_{epoch:04d}`` name contract.
    """
    path = osp.abspath(path)
    epoch, timestamp = parse_checkpoint_name(path)
    config = checkpoint_config(path, fallback=config)
    module = build(config["model"]["name"], config)

    if osp.isfile(path) and path.endswith((".pt", ".pth", ".npz")):
        from dpft_tpu.models import torch_checkpoint
        variables = torch_checkpoint.import_checkpoint(path, config)
        return module, variables, epoch, timestamp

    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(path)
    return module, variables, epoch, timestamp
