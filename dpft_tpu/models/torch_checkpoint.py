"""Reference full-model checkpoint importer (torch ``.pt`` -> flax variables).

The reference saves FULL-MODEL pickles every epoch
(``torch.save(model, path)``, reference src/dprt/training/trainer.py:256-258)
and its ``load()`` consumes them directly
(src/dprt/models/__init__.py:15-18); the published Zenodo checkpoints
(v1.0 epoch-122 / v2.0 epoch-49, reference README.md:23-24) are exactly such
files. This module makes those checkpoints consumable on this stack without
torchvision, CUDA, or even the ``dprt`` package being importable:

1. ``load_torch_checkpoint`` reads the file. Full-module pickles are
   unpickled through a *shadow unpickler* that substitutes stub classes for
   any class it cannot import (``dprt.models...``, the MSDA CUDA extension
   wrapper, torchvision containers); the resulting object tree is flattened
   into ``state_dict``-style keys by walking ``_parameters`` / ``_buffers``
   / ``_modules`` exactly like ``nn.Module.state_dict()`` (non-persistent
   buffers excluded). Plain ``state_dict`` files and ``.npz`` archives are
   accepted too.
2. ``convert_full_model`` maps every key onto the dpft_tpu flax variable
   tree: backbones via the per-family converters in
   ``backbones/torch_weights.py`` (body keys are torchvision-named under
   ``backbones.<input>.body.``), FPN necks (both torchvision FPN namings:
   pre-0.12 ``inner_blocks.{i}.weight`` and Conv2dNormActivation
   ``inner_blocks.{i}.0.weight``), the fusion decoder (packed MHA in-proj,
   MSDA linears, FFNs, LayerNorms, all six view reductions), per-iteration
   detection heads, query features/embedding, and the learnable querent.
   Unknown keys raise; nothing is dropped silently.

The flax model's ``size_bias_prior`` init delta (models/heads/detection.py)
is neutralized on import: when the torch head carries no size-output bias,
the flax bias parameter (if the config enables it) is filled with zeros, so
the imported model computes exactly the reference function.
"""

from __future__ import annotations

import logging
import pickle
import re
import types
from typing import Any, Dict, List, Tuple

import numpy as np

from dpft_tpu.models.backbones.torch_weights import (
    convert_backbone, _conv_kernel, _linear_kernel, _put)

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Loading: full-module pickles via a shadow unpickler
# ---------------------------------------------------------------------------

_STUB_SAFE_PREFIXES = ("torch", "collections", "numpy", "builtins",
                       "copyreg", "_codecs")

# torch pickles builtins under the Python-2 module name (e.g.
# ``__builtin__.set`` for nn.Module._non_persistent_buffers_set); resolve
# the alias before stubbing or the stub shadows a real builtin.
_MODULE_ALIASES = {"__builtin__": "builtins"}


def _make_stub(module: str, name: str) -> type:
    """A bare class standing in for an unimportable pickled class.

    Pickle instantiates it via ``cls.__new__(cls)`` and fills ``__dict__``
    with the recorded state, which is all the flattener needs.
    """
    return type(name, (), {"__module__": module})


class _ShadowUnpickler(pickle.Unpickler):
    """Resolves classes normally, stubbing anything unimportable."""

    force_stub = False  # test hook: stub everything non-torch

    def find_class(self, module, name):
        module = _MODULE_ALIASES.get(module, module)
        if self.force_stub and not module.startswith(_STUB_SAFE_PREFIXES):
            return _make_stub(module, name)
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return _make_stub(module, name)


def _shadow_pickle_module(force_stub: bool) -> types.ModuleType:
    shim = types.ModuleType("dpft_tpu._torch_ckpt_shadow_pickle")
    unpickler = type("Unpickler", (_ShadowUnpickler,),
                     {"force_stub": force_stub})
    shim.Unpickler = unpickler
    shim.load = pickle.load
    shim.loads = pickle.loads
    return shim


def _to_numpy(value) -> np.ndarray:
    if hasattr(value, "detach"):
        return value.detach().cpu().numpy()
    return np.asarray(value)


def _flatten_module_tree(obj, prefix: str,
                         out: Dict[str, np.ndarray]) -> None:
    """nn.Module.state_dict() semantics over (possibly stubbed) modules."""
    d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict):
        return
    non_persistent = d.get("_non_persistent_buffers_set") or set()
    for k, v in (d.get("_parameters") or {}).items():
        if v is not None:
            out[prefix + k] = _to_numpy(v)
    for k, v in (d.get("_buffers") or {}).items():
        if v is not None and k not in non_persistent:
            out[prefix + k] = _to_numpy(v)
    for k, v in (d.get("_modules") or {}).items():
        if v is not None:
            _flatten_module_tree(v, prefix + k + ".", out)


def load_torch_checkpoint(path: str,
                          force_stub: bool = False) -> Dict[str, np.ndarray]:
    """Loads a reference checkpoint into a flat numpy state_dict.

    Accepts a full-model pickle (the reference format), a state_dict
    ``.pt``/``.pth``, or an ``.npz`` with state_dict key names.
    ``force_stub`` routes ALL non-torch classes through the stub path, the
    situation a real reference checkpoint presents (its ``dprt.*`` classes
    are not importable here); tests use it to pin that route.
    """
    if path.endswith(".npz"):
        with np.load(path) as data:
            return {k: data[k] for k in data.files}

    import torch
    obj = torch.load(path, map_location="cpu",
                     pickle_module=_shadow_pickle_module(force_stub),
                     weights_only=False)

    if isinstance(obj, dict):
        if "state_dict" in obj and isinstance(obj["state_dict"], dict):
            obj = obj["state_dict"]
        return {k: _to_numpy(v) for k, v in obj.items()
                if not k.endswith("num_batches_tracked")}

    state: Dict[str, np.ndarray] = {}
    _flatten_module_tree(obj, "", state)
    if not state:
        raise ValueError(
            f"{path}: unpickled object of type {type(obj).__name__} "
            "contains no parameters/buffers - not a model checkpoint?")
    return {k: v for k, v in state.items()
            if not k.endswith("num_batches_tracked")}


# ---------------------------------------------------------------------------
# Conversion: reference key space -> flax variable tree
# ---------------------------------------------------------------------------

def _group_by_prefix(state: Dict[str, np.ndarray]
                     ) -> Dict[str, Dict[str, np.ndarray]]:
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for key, value in state.items():
        head, _, rest = key.partition(".")
        groups.setdefault(head, {})[rest] = value
    return groups


def _put_linear(params, path: Tuple[str, ...], sub: Dict[str, np.ndarray],
                prefix: str, transpose=_linear_kernel) -> None:
    """Maps ``<prefix>.weight`` / ``.bias`` onto ``path/{kernel,bias}``."""
    _put(params, path + ("kernel",), transpose(sub.pop(f"{prefix}.weight")))
    bias = sub.pop(f"{prefix}.bias", None)
    if bias is not None:
        _put(params, path + ("bias",), bias)


def _convert_backbone_group(sub: Dict[str, np.ndarray], family: str,
                            params: Dict[str, Any], stats: Dict[str, Any],
                            where: str) -> None:
    """Maps one ``backbones.<input>.*`` group onto a flax backbone tree.

    The reference wrapper's ``body`` strips part of the torchvision
    module path (family-dependent): ResNet wraps the whole model (body
    keys ARE torchvision keys, reference resnet.py:54-55), ConvNeXt/Swin
    wrap ``backbone.features`` (convnext.py:54-55, swin.py:55), RegNet
    keeps ``stem`` as its own attribute and wraps
    ``backbone.trunk_output`` (regnet.py:53-55). Re-prefix accordingly
    before the torchvision-key converters.
    """
    lname = family.lower()
    if "convnext" in lname or "swin" in lname:
        body_prefix = "features."
    elif "regnet" in lname:
        body_prefix = "trunk_output."
    else:  # resnet: body keys are already torchvision-named
        body_prefix = ""

    body = {}
    for key in list(sub):
        if key.startswith("body."):
            body[body_prefix + key[len("body."):]] = sub.pop(key)
        elif "regnet" in lname and key.startswith("stem."):
            body[key] = sub.pop(key)  # wrapper attr == torchvision name
    adj = sub.pop("adjustment_layer.weight", None)
    if sub:
        raise ValueError(f"{where}: unmapped keys {sorted(sub)}")
    bparams, bstats = convert_backbone(family, body)
    params.update(bparams)
    stats.update(bstats)
    if adj is not None:
        # 1x1 channel-adjust conv, bias-free (reference resnet.py:50-51).
        _put(params, ("adjustment", "kernel"), _conv_kernel(adj))


_FPN_RE = re.compile(
    r"^fpn\.(inner_blocks|layer_blocks)\.(\d+)(?:\.0)?\.(weight|bias)$")


def _convert_fpn_group(sub: Dict[str, np.ndarray], params: Dict[str, Any],
                       where: str) -> None:
    for key in list(sub):
        m = _FPN_RE.match(key)
        if not m:
            raise ValueError(f"{where}: unmapped FPN key {key}")
        kind = "inner" if m.group(1) == "inner_blocks" else "layer"
        leaf = "kernel" if m.group(3) == "weight" else "bias"
        value = sub.pop(key)
        if leaf == "kernel":
            value = _conv_kernel(value)
        _put(params, (f"{kind}_{m.group(2)}", leaf), value)


def _convert_mha(sub: Dict[str, np.ndarray], params: Dict[str, Any],
                 path: Tuple[str, ...], prefix: str, where: str) -> None:
    """torch nn.MultiheadAttention -> layers/attention.py parameters."""
    packed_w = sub.pop(f"{prefix}.in_proj_weight", None)
    packed_b = sub.pop(f"{prefix}.in_proj_bias")
    if packed_w is not None:  # same-dim packed fast path
        _put(params, path + ("in_proj_kernel",), _linear_kernel(packed_w))
        _put(params, path + ("in_proj_bias",), packed_b)
    else:  # kdim/vdim differ: separate projections (cross-attn reduction)
        e = packed_b.shape[0] // 3
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _put(params, path + (name, "kernel"),
                 _linear_kernel(sub.pop(f"{prefix}.{name}_weight")))
            _put(params, path + (name, "bias"),
                 packed_b[i * e:(i + 1) * e])
    _put_linear(params, path + ("out_proj",), sub, f"{prefix}.out_proj")


def _convert_layer_norm(sub: Dict[str, np.ndarray], params: Dict[str, Any],
                        path: Tuple[str, ...], prefix: str) -> None:
    _put(params, path + ("scale",), sub.pop(f"{prefix}.weight"))
    _put(params, path + ("bias",), sub.pop(f"{prefix}.bias"))


def _convert_ml_fusion(sub: Dict[str, np.ndarray], params: Dict[str, Any],
                       path: Tuple[str, ...], where: str) -> None:
    """Reference MLFusion (mpfusion.py:16-263) -> flax MLFusion params."""
    _convert_mha(sub, params, path + ("self_attn",), "self_attn", where)
    for norm in ("norm1", "norm2", "norm3"):
        if f"{norm}.weight" in sub:
            _convert_layer_norm(sub, params, path + (norm,), norm)
    for proj in ("sampling_offsets", "attention_weights", "value_proj",
                 "output_proj"):
        _put_linear(params, path + ("ms_deform_attn", proj), sub,
                    f"ms_deform_attn.{proj}")
    for ffn in ("ffn1", "ffn2"):
        _put_linear(params, path + (ffn,), sub, ffn)
    if sub:
        raise ValueError(f"{where}: unmapped MLFusion keys {sorted(sub)}")


def _convert_reduction(sub: Dict[str, np.ndarray], params: Dict[str, Any],
                       path: Tuple[str, ...], reduction: str,
                       where: str) -> None:
    """All six reference view reductions (mpfusion.py:373-414)."""
    if reduction in ("mean", "max"):
        return  # parameter-free
    if reduction == "linear":
        _put_linear(params, path + ("reduction",), sub, "reduction_layer")
    elif reduction == "unary":
        # The flax fuser realizes the Unary1d (1x1 Conv1d) reduction as a
        # Dense named 'reduction' - mathematically identical on
        # channel-last data (fusers/mpfusion.py:172-176).
        w = sub.pop("reduction_layer.conv1d.weight")  # (out, in, 1)
        _put(params, path + ("reduction", "kernel"),
             _linear_kernel(w[..., 0]))
        bias = sub.pop("reduction_layer.conv1d.bias", None)
        if bias is not None:
            _put(params, path + ("reduction", "bias"), bias)
    elif reduction == "cross-attn":
        _convert_mha(sub, params, path + ("reduction",), "reduction_layer",
                     where)
    elif reduction == "ffn":
        _put_linear(params, path + ("red_ffn1",), sub,
                    "reduction_layer.ffn1")
        _put_linear(params, path + ("red_ffn2",), sub,
                    "reduction_layer.ffn2")
        _put_linear(params, path + ("red_downsample",), sub,
                    "reduction_layer.downsample1")
        if "reduction_layer.norm1.weight" in sub:
            _convert_layer_norm(sub, params, path + ("red_norm1",),
                                "reduction_layer.norm1")
    else:
        raise ValueError(f"{where}: unknown reduction {reduction!r}")


_HEAD_LINEAR_RE = re.compile(
    r"^layers\.(center_head|size_head|angle_head|class_head)\.(\d+)"
    r"(?:\.conv1d)?\.(weight|bias)$")


def _convert_head(sub: Dict[str, np.ndarray], params: Dict[str, Any],
                  path: Tuple[str, ...], size_bias_prior,
                  where: str) -> None:
    """Reference detection head (detection.py:13-275) -> flax _Branch tree.

    torch branches are ``nn.Sequential`` with numeric indices that skip
    over activation/dropout modules; the linear/unary layers are mapped in
    order to ``layer0..layerK-1`` plus the final ``out``. Unary1d layers
    (``...{idx}.conv1d.weight`` (out, in, 1)) are squeezed to Dense
    kernels - mathematically identical on channel-last data.
    """
    branches: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
    for key in list(sub):
        m = _HEAD_LINEAR_RE.match(key)
        if not m:
            raise ValueError(f"{where}: unmapped head key {key}")
        branches.setdefault(m.group(1), {}).setdefault(
            int(m.group(2)), {})[m.group(3)] = sub.pop(key)

    for branch, layers in branches.items():
        order = sorted(layers)
        for pos, idx in enumerate(order):
            name = "out" if pos == len(order) - 1 else f"layer{pos}"
            entry = layers[idx]
            w = entry["weight"]
            if w.ndim == 3:  # Unary1d (out, in, 1)
                w = w[..., 0]
            _put(params, path + (branch, name, "kernel"), _linear_kernel(w))
            if "bias" in entry:
                _put(params, path + (branch, name, "bias"), entry["bias"])
        # Neutralize the flax size_bias_prior init delta: the flax model
        # allocates a size-output bias when the prior is enabled
        # (heads/detection.py size_bias_prior); a bias-free reference
        # checkpoint must land on zeros there for exact parity.
        if (branch == "size_head" and size_bias_prior is not None
                and "bias" not in layers[order[-1]]):
            out_ch = layers[order[-1]]["weight"].shape[0]
            _put(params, path + (branch, "out", "bias"),
                 np.zeros((out_ch,), np.float32))


def _convert_fuser(sub: Dict[str, np.ndarray], config: Dict[str, Any],
                   params: Dict[str, Any]) -> None:
    """Reference IMPFusion (mpfusion.py:517-749) -> flax fuser tree."""
    model = config["model"]
    fuser_cfg = model.get("fuser", {})
    head_cfg = model.get("head", {})
    reduction = fuser_cfg.get("reduction", "mean")
    size_bias_prior = head_cfg.get("size_bias_prior", 1.0)

    _put(params, ("query",), sub.pop("query"))
    _put(params, ("query_embedding",), sub.pop("query_embedding.weight"))

    iters: Dict[str, Dict[str, np.ndarray]] = {}
    heads: Dict[str, Dict[str, np.ndarray]] = {}
    for key in list(sub):
        m = re.match(r"^mpfusion\.(fusion\d+)\.(.+)$", key)
        if m:
            iters.setdefault(m.group(1), {})[m.group(2)] = sub.pop(key)
            continue
        m = re.match(r"^heads\.(\d+)\.(.+)$", key)
        if m:
            heads.setdefault(m.group(1), {})[m.group(2)] = sub.pop(key)
            continue
        raise ValueError(f"fuser: unmapped key {key}")
    if sub:
        raise ValueError(f"fuser: unmapped keys {sorted(sub)}")

    for fusion, fsub in iters.items():
        views: Dict[str, Dict[str, np.ndarray]] = {}
        rest: Dict[str, np.ndarray] = {}
        for key, value in fsub.items():
            m = re.match(r"^ml_fusion_layers\.(ms_deform_attn\d+)\.(.+)$",
                         key)
            if m:
                views.setdefault(m.group(1), {})[m.group(2)] = value
            else:
                rest[key] = value
        for view, vsub in views.items():
            _convert_ml_fusion(vsub, params, (fusion, view),
                               f"fuser.{fusion}.{view}")
        _convert_reduction(rest, params, (fusion,), reduction,
                           f"fuser.{fusion}")
        if rest:
            raise ValueError(
                f"fuser.{fusion}: unmapped keys {sorted(rest)}")

    for idx, hsub in heads.items():
        _convert_head(hsub, params, (f"head{idx}",), size_bias_prior,
                      f"fuser.heads.{idx}")


def convert_full_model(state: Dict[str, np.ndarray],
                       config: Dict[str, Any]) -> Dict[str, Any]:
    """Maps a reference full-model state_dict onto dpft_tpu variables.

    Returns a ``{'params': ..., 'batch_stats': ...}`` tree ready for
    ``module.apply``. Every torch key is either consumed or raises - except
    the top-level ``head.*`` template, which the reference keeps as an
    unused duplicate of the per-iteration clones (DPRT holds both
    ``self.head`` and ``fuser.heads``, dprt.py:110-133; only the clones run
    in forward, mpfusion.py:743).
    """
    groups = _group_by_prefix(state)
    groups.pop("head", None)  # unused template module (see docstring)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    model = config["model"]

    backbones = groups.pop("backbones", {})
    for input_name, bcfg in model.get("backbones", {}).items():
        sub = {k[len(input_name) + 1:]: v for k, v in backbones.items()
               if k.startswith(input_name + ".")}
        if not sub:
            raise ValueError(f"checkpoint has no backbones.{input_name}.*")
        for k in list(backbones):
            if k.startswith(input_name + "."):
                del backbones[k]
        bparams: Dict[str, Any] = {}
        bstats: Dict[str, Any] = {}
        _convert_backbone_group(sub, bcfg["name"], bparams, bstats,
                                f"backbones.{input_name}")
        params[f"backbones_{input_name}"] = bparams
        if bstats:
            stats[f"backbones_{input_name}"] = bstats
    if backbones:
        raise ValueError(f"unmapped backbone keys: {sorted(backbones)}")

    necks = groups.pop("necks", {})
    for input_name in model.get("necks", {}):
        sub = {k[len(input_name) + 1:]: v for k, v in necks.items()
               if k.startswith(input_name + ".")}
        if not sub:
            raise ValueError(f"checkpoint has no necks.{input_name}.*")
        for k in list(necks):
            if k.startswith(input_name + "."):
                del necks[k]
        nparams: Dict[str, Any] = {}
        _convert_fpn_group(sub, nparams, f"necks.{input_name}")
        params[f"necks_{input_name}"] = nparams
    if necks:
        raise ValueError(f"unmapped neck keys: {sorted(necks)}")

    embeddings = groups.pop("embeddings", {})
    if embeddings:  # sinusoidal embeddings are parameter-free
        raise ValueError(f"unmapped embedding keys: {sorted(embeddings)}")

    querent = groups.pop("querent", {})
    if "queries" in querent:  # learnable querent (learnable.py:49-50)
        params["querent"] = {"query": querent.pop("queries")}
    if querent:
        raise ValueError(f"unmapped querent keys: {sorted(querent)}")

    fuser = groups.pop("fuser", {})
    if fuser:
        fparams: Dict[str, Any] = {}
        _convert_fuser(fuser, config, fparams)
        params["fuser"] = fparams

    if groups:
        raise ValueError(f"unmapped checkpoint sections: {sorted(groups)}")

    variables: Dict[str, Any] = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return variables


def import_checkpoint(path: str, config: Dict[str, Any],
                      force_stub: bool = False) -> Dict[str, Any]:
    """One-call load + convert: reference ``.pt`` -> flax variables."""
    state = load_torch_checkpoint(path, force_stub=force_stub)
    variables = convert_full_model(state, config)
    n = sum(int(np.prod(x.shape)) for x in
            _flatten_leaves(variables["params"]))
    logger.info("Imported reference checkpoint %s (%d parameters)", path, n)
    return variables


def _flatten_leaves(tree) -> List[np.ndarray]:
    out = []
    for v in tree.values():
        if isinstance(v, dict):
            out.extend(_flatten_leaves(v))
        else:
            out.append(v)
    return out
