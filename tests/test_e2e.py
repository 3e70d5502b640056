"""End-to-end integration: prepare -> train -> evaluate -> export on the
synthetic mini-kradar fixture, plus DP-vs-single-device equivalence."""

import os
import os.path as osp

import jax
import numpy as np
import pytest

from dpft_tpu.data import init as init_dataset
from dpft_tpu.data import load as load_dataset
from dpft_tpu.data import prepare as prepare_dataset
from dpft_tpu.evaluation import evaluate as build_evaluator
from dpft_tpu.models import build as build_model
from dpft_tpu.training import train as build_trainer
from dpft_tpu.utils.misc import set_seed

from kradar_fixture import base_config, make_raw_kradar

pytestmark = pytest.mark.slow


def small_model_config(config):
    """Adds a shrunken full-fusion model section (ResNet18, 1 iteration)."""
    config = {**config}
    config["model"] = {
        "name": "dprt",
        "inputs": ["camera_mono", "radar_bev", "radar_front"],
        "skiplinks": {k: True for k in
                      ["camera_mono", "radar_bev", "radar_front"]},
        "backbones": {
            "camera_mono": {"name": "ResNet18", "multi_scale": 4},
            "radar_bev": {"name": "ResNet18", "in_channels": 6,
                          "multi_scale": 4},
            "radar_front": {"name": "ResNet18", "in_channels": 6,
                            "multi_scale": 4},
        },
        "necks": {
            "camera_mono": {"name": "FPN",
                            "in_channels_list": [3, 64, 128, 256, 512],
                            "out_channels": 16},
            "radar_bev": {"name": "FPN",
                          "in_channels_list": [6, 64, 128, 256, 512],
                          "out_channels": 16},
            "radar_front": {"name": "FPN",
                            "in_channels_list": [6, 64, 128, 256, 512],
                            "out_channels": 16},
        },
        "embeddings": {
            k: {"name": "sinusoidal_embedding", "num_feats": 16,
                "n_levels": 5, "normalize": True}
            for k in ["camera_mono", "radar_bev", "radar_front"]
        },
        "querent": {"name": "data_agnostic_static_querent",
                    "transformation": "spher2cart",
                    "resolution": [4, 4, 1],
                    "minimum": [4, -50, 0], "maximum": [72, 50, 0]},
        "fuser": {"name": "IMPFusion", "i_iter": 1, "m_views": 3,
                  "d_model": 16, "d_ffn": 32, "n_queries": 16,
                  "n_levels": [5, 5, 5], "n_heads": [8, 8, 8],
                  "n_points": [4, 4, 4], "norm": True, "dropout": 0.0,
                  "reduction": "linear", "activation": "Mish"},
        "head": {"name": "linear_detection_head", "in_channels": 16,
                 "num_classes": 2, "num_reg_layers": 2, "num_cls_layers": 2},
    }
    return config


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    src = make_raw_kradar(root)
    processed = osp.join(root, "processed")
    config = small_model_config(base_config())
    config["train"]["epochs"] = 4
    config["train"]["optimizer"]["lr"] = 2e-3
    prepare_dataset("kradar", config).prepare(src, processed)
    return root, processed, config


def test_train_eval_export(pipeline):
    root, processed, config = pipeline
    rng = set_seed(config["computing"]["seed"])

    train_ds = init_dataset("kradar", src=processed, split="train",
                            config=config)
    train_loader = load_dataset(train_ds, config=config)

    model = build_model("dprt", config)
    trainer = build_trainer(config)
    out = trainer(model, train_loader, val_loader=train_loader,
                  timestamp="testrun", dst=osp.join(root, "log"), rng=rng)

    # Loss must be finite and decrease over the overfit run.
    history = out["history"]
    assert all(np.isfinite(history)), history
    assert history[-1] < history[0], history

    # Checkpoints written with the reference naming contract.
    ckpt_dir = osp.join(root, "log", "testrun", "checkpoints")
    ckpts = sorted(os.listdir(ckpt_dir))
    assert ckpts[0] == "testrun_checkpoint_0000"
    assert len(ckpts) == config["train"]["epochs"]

    # ---- Evaluate the final checkpoint.
    test_ds = init_dataset("kradar", src=processed, split="test",
                           config=config)
    test_loader = load_dataset(test_ds, config=config, shuffle=False)
    evaluator = build_evaluator(config)
    results = evaluator(osp.join(ckpt_dir, ckpts[-1]), test_loader,
                        dst=osp.join(root, "eval"))

    assert "mAP" in results and np.isfinite(results["mAP"])
    assert 0 < results["Inference_time_mean_ms"] < 60_000
    assert results["Parameters"] > 1e5

    # ---- Exporter tree: all conf thresholds and the 'all' subset.
    export_root = osp.join(root, "eval", "exports", "kradar")
    assert sorted(os.listdir(export_root)) == \
        ["0.0", "0.3", "0.5", "0.7", "0.9"]
    subset = osp.join(export_root, "0.0", "all")
    assert osp.exists(osp.join(subset, "preds", "000000.txt"))
    assert osp.exists(osp.join(subset, "gts", "000000.txt"))
    assert osp.exists(osp.join(subset, "desc", "000000.txt"))
    assert osp.exists(osp.join(subset, "val.txt"))
    # gts contain the 15-field format with real objects.
    with open(osp.join(subset, "gts", "000000.txt")) as f:
        line = f.readline().split()
    assert line[0] == "sed" and len(line) == 15


def test_dp_equals_single_device(pipeline):
    """A DP-sharded step over 2 virtual devices == single-device step.

    Runs in forward_once (jax.vjp) mode, giving the vjp trainer structure
    e2e coverage; the pipeline test above covers the embedded-matcher
    monolith default, and test_monolith_equals_hoisted pins the two
    structures against each other."""
    root, processed, config = pipeline
    config = {**config, "train": dict(config["train"], forward_once=True)}
    from dpft_tpu.parallel import create_mesh
    from dpft_tpu.training.trainer import CentralizedTrainer, _to_jnp

    train_ds = init_dataset("kradar", src=processed, split="train",
                            config=config)
    loader = load_dataset(train_ds, config=config, shuffle=False)
    batch, targets = next(iter(loader))

    model = build_model("dprt", config)
    variables = model.init(jax.random.PRNGKey(0), _to_jnp(batch),
                           train=False)

    trainer = CentralizedTrainer.from_config(config)
    tx = trainer.optimizer_factory(1e-3)

    def make_state():
        # Fresh copies: the train step donates its state argument.
        fresh = jax.tree_util.tree_map(jax.numpy.copy, variables)
        return {
            "params": fresh["params"],
            "batch_stats": fresh["batch_stats"],
            "opt_state": tx.init(fresh["params"]),
            "step": 0,
        }

    results = {}
    for name, mesh in [("single", create_mesh(data=1)),
                       ("dp2", create_mesh(data=2))]:
        train_step, _ = trainer._make_steps(model, tx, mesh)
        state, total, losses, _ = train_step(
            make_state(), _to_jnp(batch), _to_jnp(targets),
            jax.random.PRNGKey(1))
        results[name] = (float(total),
                         jax.tree_util.tree_map(np.asarray, state["params"]))

    assert abs(results["single"][0] - results["dp2"][0]) < 1e-3
    # Adam divides by sqrt(v): near-zero gradients amplify f32
    # reduction-order noise into ~lr-sized update flips on isolated
    # elements, so compare with a tolerance a few times the lr. A missing
    # all-reduce would produce O(1) systematic differences.
    flat_s = jax.tree_util.tree_leaves(results["single"][1])
    flat_d = jax.tree_util.tree_leaves(results["dp2"][1])
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(a, b, atol=5e-3)


def test_monolith_equals_hoisted(pipeline):
    """The embedded-matcher monolith (default) == the hoisted three-program
    structure on identical inputs: same loss, same updated params.

    The monolith runs the Hungarian matcher (under stop_gradient) INSIDE
    the fused grad program; the hoisted layout solves it in a separate
    program and feeds indices in. Identical math — any divergence beyond
    fusion-reordering noise means the embedded matcher changed the
    assignments or leaked gradients."""
    root, processed, config = pipeline
    from dpft_tpu.parallel import create_mesh
    from dpft_tpu.training.trainer import CentralizedTrainer, _to_jnp

    train_ds = init_dataset("kradar", src=processed, split="train",
                            config=config)
    loader = load_dataset(train_ds, config=config, shuffle=False)
    batch, targets = next(iter(loader))

    model = build_model("dprt", config)
    variables = model.init(jax.random.PRNGKey(0), _to_jnp(batch),
                           train=False)
    mesh = create_mesh(data=1)

    results = {}
    for name, hoist in [("monolith", False), ("hoisted", True)]:
        cfg = {**config, "train": dict(config["train"],
                                       hoist_matcher=hoist)}
        trainer = CentralizedTrainer.from_config(cfg)
        tx = trainer.optimizer_factory(1e-3)
        fresh = jax.tree_util.tree_map(jax.numpy.copy, variables)
        state = {
            "params": fresh["params"],
            "batch_stats": fresh["batch_stats"],
            "opt_state": tx.init(fresh["params"]),
            "step": 0,
        }
        train_step, _ = trainer._make_steps(model, tx, mesh)
        state, total, losses, _ = train_step(
            state, _to_jnp(batch), _to_jnp(targets), jax.random.PRNGKey(1))
        results[name] = (float(total),
                         jax.tree_util.tree_map(np.asarray, state["params"]))

    assert abs(results["monolith"][0] - results["hoisted"][0]) < 1e-4, \
        (results["monolith"][0], results["hoisted"][0])
    flat_m = jax.tree_util.tree_leaves(results["monolith"][1])
    flat_h = jax.tree_util.tree_leaves(results["hoisted"][1])
    for a, b in zip(flat_m, flat_h):
        np.testing.assert_allclose(a, b, atol=5e-3)
