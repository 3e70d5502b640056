"""DPFT top-level model: per-view backbone -> skiplink -> FPN -> positional
embedding -> querent -> iterative fusion decoder with detection heads.

Parity: reference src/dprt/models/dprt.py:67-248 (class DPRT). The batch
contract is identical: for every configured input the batch provides
``<input>`` (B, H, W, C) data, ``label_to_<input>_t`` (B, 4, 4) and
``label_to_<input>_p`` (B, R, 4) matrices, and ``<input>_shape`` (B, 3) raw
shapes. Output is the head dict (class/center/size/angle).

Delta vs reference: the reference registers the original head module on the
top model (dprt.py:112) but never calls it - only the per-iteration clones
inside the fuser run (mpfusion.py:743). We do not create those dead
parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dpft_tpu.models.backbones import build_backbone
from dpft_tpu.models.embeddings import build_embedding
from dpft_tpu.models.fusers import build_fuser
from dpft_tpu.models.heads import build_head
from dpft_tpu.models.necks import build_neck
from dpft_tpu.models.queries import build_querent


class DPFT(nn.Module):
    inputs: Sequence[str]
    skiplinks: Dict[str, bool]
    backbones: Dict[str, nn.Module]
    necks: Dict[str, nn.Module]
    embeddings: Dict[str, nn.Module]
    querent: Optional[nn.Module]
    fuser: Optional[nn.Module]

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        det = not train
        features: Dict[str, Dict[str, jnp.ndarray]] = {}

        for name in self.inputs:
            # `train` positional: the remat wrapper's static_argnums only
            # reaches positional arguments (_maybe_remat).
            feats = self.backbones[name](batch[name], train)
            if self.skiplinks.get(name, False):
                # Raw data becomes level '0', inserted in front
                # (reference dprt.py:164-179,221-225).
                feats = {"0": batch[name], **feats}
            feats = self.necks[name](feats)
            feats = self.embeddings[name](feats)
            features[name] = feats

        B = batch[self.inputs[0]].shape[0]
        out = self.querent(B)

        projection = [
            (batch[f"label_to_{name}_t"], batch[f"label_to_{name}_p"])
            for name in self.inputs
        ]
        shape = [batch[f"{name}_shape"][:, :2].astype(jnp.float32)
                 for name in self.inputs]

        out = self.fuser(
            batch=[features[name] for name in self.inputs],
            shape=shape,
            projection=projection,
            out=out,
            deterministic=det,
        )
        return out


def _maybe_remat(module: nn.Module, enabled: bool) -> nn.Module:
    """Wraps a backbone in flax's lifted rematerialization.

    `computing.remat: true` drops the backbone activations after the
    forward and recomputes them during the backward — the standard TPU
    HBM-for-FLOPs trade. The backbones hold nearly all of the forward's
    activation memory (the high-resolution conv stages; the fusion
    decoder is tiny), so remat buys batch-size headroom — and shrinks the
    `train.forward_once` residual stash that must persist across the
    hoisted matcher program (9.44 GB -> the decoder's share at flagship
    B=4). The gradients are bitwise-identical; only the schedule changes.
    """
    if not enabled:
        return module
    cls = type(module)
    kwargs = {f.name: getattr(module, f.name)
              for f in dataclasses.fields(module)
              if f.name not in ("parent", "name")}
    # __call__(self, batch, train=False): `train` selects BatchNorm
    # branches, so it must be static under jax.checkpoint. It must also
    # be passed POSITIONALLY at the call site (static_argnums does not
    # reach kwargs); flax's lifted core_fn sees (scope, batch, train).
    return nn.remat(cls, static_argnums=(2,))(**kwargs)


def from_config(config: Dict[str, Any]) -> DPFT:
    """Builds the DPFT module tree from a kradar*.json-style config.

    Sub-configs are merged with the 'computing' section and dispatched by
    their 'name' string, mirroring reference dprt.py:17-64,114-133.
    """
    computing = config.get("computing", {})
    model = config["model"]
    inputs = list(model["inputs"])

    def merged(sub):
        return dict(computing | sub)

    backbones = {
        k: _maybe_remat(build_backbone(v["name"], merged(v)),
                        bool(computing.get("remat", False)))
        for k, v in model.get("backbones", {}).items()
    }
    necks = {
        k: build_neck(v["name"], merged(v))
        for k, v in model.get("necks", {}).items()
    }
    embeddings = {
        k: build_embedding(v["name"], merged(v))
        for k, v in model.get("embeddings", {}).items()
    }

    querent = None
    if "querent" in model:
        querent = build_querent(model["querent"]["name"],
                                merged(model["querent"]))

    head = None
    if "head" in model:
        head = build_head(model["head"]["name"], merged(model["head"]))

    fuser = None
    if "fuser" in model:
        fuser = build_fuser(model["fuser"]["name"], merged(model["fuser"]),
                            head=head)

    return DPFT(
        inputs=tuple(inputs),
        skiplinks=dict(model.get("skiplinks", {})),
        backbones=backbones,
        necks=necks,
        embeddings=embeddings,
        querent=querent,
        fuser=fuser,
    )


def build_dpft(config: Dict[str, Any]) -> DPFT:
    return from_config(config)
