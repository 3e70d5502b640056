"""Mixed-precision (bfloat16 compute, float32 params) coverage.

``computing.compute_dtype: "bfloat16"`` threads a compute dtype through
every parametric module (backbones/necks/fuser/attention/MSDA/heads) while
flax keeps parameters in float32. Stability pins: softmax and LayerNorm in
float32, sinusoidal frequency table in float32, head outputs cast to
float32 before the set loss / Hungarian matcher.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpft_tpu.models.fusers.mpfusion import MLFusion


def _fusion_inputs(rng, dtype=np.float32):
    B, N, C = 2, 8, 16
    query = rng.normal(size=(B, N, C)).astype(dtype)
    levels = {
        "0": rng.normal(size=(B, 6, 8, C)).astype(dtype),
        "1": rng.normal(size=(B, 3, 4, C)).astype(dtype),
    }
    ref = rng.uniform(size=(B, N, 2)).astype(dtype)
    pos = rng.normal(size=(B, N, C)).astype(dtype)
    return query, levels, ref, pos


def test_mlfusion_bf16_matches_f32():
    rng = np.random.default_rng(0)
    query, levels, ref, pos = _fusion_inputs(rng)
    kw = dict(d_model=16, d_ffn=32, n_levels=2, n_heads=4, n_points=2,
              activation="Mish", dropout=0.0, norm=True)

    f32 = MLFusion(**kw, dtype=jnp.float32)
    bf16 = MLFusion(**kw, dtype=jnp.bfloat16)
    variables = f32.init(jax.random.PRNGKey(0), query, levels, ref, pos)

    # Same float32 params drive both precisions.
    out32 = f32.apply(variables, query, levels, ref, pos)
    out16 = bf16.apply(variables, query, levels, ref, pos)

    # Params stay float32 when the module computes in bfloat16.
    re_init = bf16.init(jax.random.PRNGKey(0), query, levels, ref, pos)
    for leaf in jax.tree_util.tree_leaves(re_init["params"]):
        assert leaf.dtype == jnp.float32

    # LayerNorm (float32-pinned) closes each sublayer, so the output is
    # float32 and numerically close to the full-precision path.
    assert out16.dtype == jnp.float32
    err = np.abs(np.asarray(out16) - np.asarray(out32))
    scale = np.abs(np.asarray(out32)).mean()
    assert err.mean() < 0.03 * scale + 0.03, (err.mean(), scale)


@pytest.mark.slow
def test_full_model_bf16_forward_and_train_step():
    import sys
    from test_full_model_parity import make_batch, tiny_config

    from dpft_tpu.models import build
    from dpft_tpu.parallel import create_mesh
    from dpft_tpu.training.trainer import CentralizedTrainer

    sys.path.insert(0, ".")
    from kradar_fixture import base_config

    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng).items()}

    config = base_config(max_boxes=8)
    config["model"] = tiny_config()["model"]

    f32_model = build("dprt", config)
    variables = f32_model.init(jax.random.PRNGKey(0), batch, train=False)
    out32 = f32_model.apply(variables, batch, train=False)

    config_bf16 = {**config,
                   "computing": dict(config["computing"],
                                     compute_dtype="bfloat16")}
    bf16_model = build("dprt", config_bf16)
    out16 = bf16_model.apply(variables, batch, train=False)

    for key in ("class", "center", "size", "angle"):
        a, b = np.asarray(out32[key]), np.asarray(out16[key])
        assert b.dtype == np.float32, key
        denom = np.abs(a).mean() + 1e-3
        assert np.abs(a - b).mean() / denom < 0.12, (
            key, np.abs(a - b).mean(), denom)

    # One bf16 training step: finite loss, float32 state throughout.
    from __graft_entry__ import _example_targets
    targets = _example_targets(config_bf16, B=2)

    trainer = CentralizedTrainer.from_config(config_bf16)
    tx = trainer.optimizer_factory(trainer.optimizer_factory.base_lr)
    state = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }
    train_step, _ = trainer._make_steps(bf16_model, tx, create_mesh(data=1))
    state = train_step.place_state(state)
    state, total, losses, _ = train_step(state, batch, targets,
                                         jax.random.PRNGKey(1))
    assert np.isfinite(float(total)), float(total)
    for leaf in jax.tree_util.tree_leaves(state["params"]):
        assert leaf.dtype == jnp.float32
