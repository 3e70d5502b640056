"""Importer coverage for the secondary converter paths: all six view
reductions, the Unary1d detection head, and the learnable querent.

Every published reference config uses reduction='linear' + the Linear
head + the data-agnostic querent (covered end-to-end by
test_torch_checkpoint.py); these FUSER-level round trips pin the
remaining key mappings (torch_checkpoint.py: _convert_reduction,
_convert_head unary route, querent.queries) against forward equality so
a checkpoint trained with any reference-supported configuration imports
correctly, not just the flagship one.
"""

import math

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dpft_tpu.models.fusers import build_fuser
from dpft_tpu.models.heads import build_detection_head
from dpft_tpu.models.queries import build_querent
from dpft_tpu.models.torch_checkpoint import convert_full_model

import torch_dprt
import torch_refs

D_MODEL = 8
N_HEADS = 2
N_POINTS = 2
N_LEVELS = 2
M_VIEWS = 2
N_QUERIES = 8
I_ITER = 2
B = 2


def _fuser_config(reduction):
    return {
        "i_iter": I_ITER, "m_views": M_VIEWS, "d_model": D_MODEL,
        "d_ffn": 16, "n_queries": N_QUERIES,
        "n_levels": [N_LEVELS] * M_VIEWS, "n_heads": [N_HEADS] * M_VIEWS,
        "n_points": [N_POINTS] * M_VIEWS, "norm": True, "dropout": 0.0,
        "reduction": reduction, "activation": "Mish",
    }


def _head_config(unary=False):
    return {"in_channels": D_MODEL, "num_classes": 2,
            "num_reg_layers": 2, "num_cls_layers": 2}


def _inputs(rng):
    """Per-view feature levels + shape/projection matrices + initial out."""
    feats_t, feats_f, shapes, projections = [], [], [], []
    sizes = [(6, 8), (3, 4)]
    theta = 0.3
    rot = np.array([[math.cos(theta), -math.sin(theta), 0, 0.5],
                    [math.sin(theta), math.cos(theta), 0, -0.3],
                    [0, 0, 1, 0.1],
                    [0, 0, 0, 1]], np.float32)
    for v in range(M_VIEWS):
        levels = [rng.normal(size=(B, h, w, D_MODEL)).astype(np.float32)
                  for h, w in sizes]
        feats_t.append([torch.from_numpy(t) for t in levels])
        feats_f.append({str(i): jnp.asarray(t)
                        for i, t in enumerate(levels)})
        shapes.append(np.tile([32.0, 48.0], (B, 1)).astype(np.float32))
        t = np.tile(rot, (B, 1, 1)) if v else np.zeros((B, 4, 4), np.float32)
        p = rng.normal(size=(B, 3, 4)).astype(np.float32)
        p[:, 2, 3] += 30.0
        projections.append((t, p))
    center = rng.uniform(5, 50, size=(B, N_QUERIES, 3)).astype(np.float32)
    return feats_t, feats_f, shapes, projections, center


def _roundtrip(reduction, unary_head=False):
    torch.manual_seed(0)
    rng = np.random.default_rng(4)
    feats_t, feats_f, shapes, projections, center = _inputs(rng)

    head_cls = (torch_dprt.TorchUnaryDetectionHead if unary_head
                else torch_dprt.TorchLinearDetectionHead)
    thead = head_cls(**_head_config())
    tfuser = torch_dprt.TorchIMPFusion(
        I_ITER, M_VIEWS, D_MODEL, 16, N_QUERIES,
        [N_LEVELS] * M_VIEWS, [N_HEADS] * M_VIEWS, [N_POINTS] * M_VIEWS,
        thead, "Mish", True, reduction).eval()

    with torch.no_grad():
        tout = tfuser(
            feats_t, [torch.from_numpy(s) for s in shapes],
            [(torch.from_numpy(t), torch.from_numpy(p))
             for t, p in projections],
            {"center": torch.from_numpy(center)})

    state = {f"fuser.{k}": v.detach().numpy()
             for k, v in tfuser.state_dict().items()}
    head_name = "unary_detection_head" if unary_head \
        else "linear_detection_head"
    config = {"model": {"fuser": _fuser_config(reduction),
                        "head": dict(_head_config(), name=head_name)}}
    variables = convert_full_model(state, config)

    fhead = build_detection_head(head_name, config["model"]["head"])
    ffuser = build_fuser("IMPFusion", config["model"]["fuser"], head=fhead)
    fout = ffuser.apply(
        {"params": variables["params"]["fuser"]},
        batch=feats_f,
        shape=[jnp.asarray(s) for s in shapes],
        projection=[(jnp.asarray(t), jnp.asarray(p))
                    for t, p in projections],
        out={"center": jnp.asarray(center)},
        deterministic=True)

    for key in ("class", "center", "size", "angle"):
        np.testing.assert_allclose(
            np.asarray(fout[key]), tout[key].numpy(),
            rtol=1e-4, atol=2e-4, err_msg=f"{reduction}/{key}")


@pytest.mark.parametrize("reduction",
                         ["linear", "unary", "cross-attn", "ffn",
                          "mean", "max"])
def test_reduction_roundtrip(reduction):
    _roundtrip(reduction)


def test_unary_head_roundtrip():
    """Unary1d branch keys (layers.*.N.conv1d.weight) -> Dense kernels."""
    _roundtrip("linear", unary_head=True)


def _wrapper_state(tm, family, adj_weight=None):
    """The reference Backbone wrapper's state_dict key space: ResNet
    wraps the whole torchvision model as ``body`` (resnet.py:54-55),
    ConvNeXt/Swin wrap ``backbone.features`` (convnext.py:54-55,
    swin.py:55), RegNet keeps ``stem`` and wraps ``trunk_output``
    (regnet.py:53-55); classifier-side keys never enter the wrapper."""
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    lf = family.lower()
    out = {}
    for k, v in sd.items():
        if "resnet" in lf:
            if k.startswith("fc."):
                continue
            out["body." + k] = v
        elif "convnext" in lf:
            if k.startswith("classifier."):
                continue
            out["body." + k[len("features."):]] = v
        elif "swin" in lf:
            if k.startswith(("head.", "norm.")):
                continue
            out["body." + k[len("features."):]] = v
        else:  # regnet
            if k.startswith("fc."):
                continue
            if k.startswith("stem."):
                out[k] = v
            else:
                out["body." + k[len("trunk_output."):]] = v
    if adj_weight is not None:
        out["adjustment_layer.weight"] = adj_weight
    return out


@pytest.mark.parametrize("family,builder,in_ch", [
    ("ResNet34", lambda: torch_refs.TorchResNet("resnet34"), 6),
    ("ConvNeXt_Tiny", lambda: torch_refs.TorchConvNeXt("convnext_tiny"), 3),
    ("Swin_T", lambda: torch_refs.TorchSwin("swin_t"), 3),
    ("RegNet_Y_400MF", lambda: torch_refs.TorchRegNet("regnet_y_400mf"), 3),
])
def test_backbone_wrapper_roundtrip(family, builder, in_ch):
    """Full-model-import backbone groups for every family: the wrapper's
    body-prefix stripping (family-dependent) must be undone before the
    torchvision-key converters, pinned by forward equality per stage."""
    import torch.nn.functional as F

    from dpft_tpu.models.backbones import build_backbone

    torch.manual_seed(0)
    tm = builder().eval()
    torch_refs.randomize_bn_stats(tm)
    gen = torch.Generator().manual_seed(2)
    adj = (torch.randn(3, in_ch, 1, 1, generator=gen) * 0.3
           if in_ch != 3 else None)
    x = torch.randn(1, in_ch, 64, 64, generator=gen)
    with torch.no_grad():
        x3 = F.conv2d(x, adj) if adj is not None else x
        touts = tm(x3)

    state = {f"backbones.cam.{k}": v
             for k, v in _wrapper_state(
                 tm, family,
                 adj.numpy() if adj is not None else None).items()}
    config = {"model": {"backbones": {
        "cam": {"name": family, "in_channels": in_ch, "multi_scale": 4}}}}
    variables = convert_full_model(state, config)

    fm = build_backbone(family, {"in_channels": in_ch, "multi_scale": 4})
    fvars = {"params": variables["params"]["backbones_cam"]}
    if "backbones_cam" in variables.get("batch_stats", {}):
        fvars["batch_stats"] = variables["batch_stats"]["backbones_cam"]
    xin = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    fouts = fm.apply(fvars, xin, train=False)

    channel_last = "swin" in family.lower()
    for i, t in enumerate(touts):
        t = t.detach().numpy()
        if not channel_last:
            t = np.transpose(t, (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(fouts[str(i + 1)]), t, rtol=1e-4, atol=1e-4,
            err_msg=f"{family} stage {i + 1}")


def test_learnable_querent_roundtrip():
    """querent.queries -> params/querent/query, forward equality."""
    torch.manual_seed(1)
    queries = torch.rand(N_QUERIES, 3) * 20.0

    state = {"querent.queries": queries.numpy()}
    config = {"model": {"querent": {"name": "learnable"}}}
    variables = convert_full_model(state, config)

    querent = build_querent("learnable_query", {
        "n_queries": N_QUERIES, "minimum": [0, 0, 0],
        "maximum": [20, 20, 20]})
    out = querent.apply({"params": variables["params"]["querent"]}, B)
    np.testing.assert_allclose(
        np.asarray(out["center"]),
        np.tile(queries.numpy()[None], (B, 1, 1)), rtol=1e-6)
