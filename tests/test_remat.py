"""Backbone rematerialization (computing.remat) — HBM-for-FLOPs trade."""

import numpy as np

import jax
import jax.numpy as jnp

from dpft_tpu.models.backbones.resnet import ResNetBackbone
from dpft_tpu.models.dpft import _maybe_remat


def _stash_bytes(apply_fn, variables, x):
    """Bytes of vjp residuals held across a jit boundary."""
    def run(variables, x):
        def f(p):
            out = apply_fn({**variables, "params": p}, x)
            return jax.tree_util.tree_leaves(out)[0]
        out, pullback = jax.vjp(f, variables["params"])
        return out, pullback

    shapes = jax.eval_shape(run, variables, x)
    return sum(int(np.prod(l.shape)) * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(shapes[1])
               if hasattr(l, "shape"))


def test_remat_backbone_identical_params_outputs_grads():
    base = ResNetBackbone(name_variant="resnet18", in_channels=3,
                          multi_scale=2)
    remat = _maybe_remat(base, True)
    assert _maybe_remat(base, False) is base

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    v_base = base.init(jax.random.PRNGKey(0), x, train=False)
    v_remat = remat.init(jax.random.PRNGKey(0), x, False)

    # Identical parameter trees: remat is a pure schedule change, so
    # checkpoints move freely between the two.
    assert jax.tree_util.tree_structure(v_base) \
        == jax.tree_util.tree_structure(v_remat)
    for a, b in zip(jax.tree_util.tree_leaves(v_base),
                    jax.tree_util.tree_leaves(v_remat)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_b = base.apply(v_base, x, train=False)
    out_r = remat.apply(v_base, x, False)
    for k in out_b:
        np.testing.assert_allclose(np.asarray(out_b[k]),
                                   np.asarray(out_r[k]), rtol=1e-6,
                                   err_msg=k)

    def loss(module):
        def f(params):
            out = module.apply({**v_base, "params": params}, x,
                               False)
            return sum(jnp.sum(v ** 2) for v in out.values())
        return jax.grad(f)(v_base["params"])

    g_b, g_r = loss(base), loss(remat)
    for a, b in zip(jax.tree_util.tree_leaves(g_b),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_remat_shrinks_vjp_residual_stash():
    base = ResNetBackbone(name_variant="resnet18", in_channels=3,
                          multi_scale=4)
    remat = _maybe_remat(base, True)
    x = jax.ShapeDtypeStruct((2, 64, 64, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: base.init(jax.random.PRNGKey(0),
                          jnp.zeros(x.shape, x.dtype), train=False))

    def apply_eval(module):
        return lambda v, xx: module.apply(v, xx, False)

    full = _stash_bytes(apply_eval(base), variables, x)
    cut = _stash_bytes(apply_eval(remat), variables, x)
    # The stash under remat is the params + inputs + stage boundaries; the
    # intermediate conv activations are gone.
    assert cut < 0.55 * full, (cut, full)


def test_remat_config_plumbs_through_build():
    from test_full_model_parity import tiny_config

    from dpft_tpu.models import build

    config = tiny_config()
    config["computing"]["remat"] = True
    model = build("dprt", config)
    assert type(model.backbones["camera_mono"]).__name__ != "ResNetBackbone"
    config["computing"]["remat"] = False
    model = build("dprt", config)
    assert type(model.backbones["camera_mono"]).__name__ == "ResNetBackbone"
