"""StableHLO deployment export (dpft_tpu/export.py) round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from dpft_tpu.export import export_forward, load_exported, save_exported


def test_export_roundtrip_toy(tmp_path):
    class Toy(nn.Module):
        @nn.compact
        def __call__(self, batch, train=False):
            return {"y": nn.Dense(3)(batch["x"])}

    model = Toy()
    batch = {"x": jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 5)), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), batch)

    exported = export_forward(model, variables, batch)
    path = str(tmp_path / "toy.stablehlo")
    save_exported(exported, path)
    reloaded = load_exported(path)

    want = model.apply(variables, batch)
    got = reloaded.call(batch)
    np.testing.assert_allclose(np.asarray(got["y"]), np.asarray(want["y"]),
                               rtol=1e-6)


@pytest.mark.slow
def test_export_roundtrip_full_model(tmp_path):
    from test_full_model_parity import make_batch, tiny_config

    from dpft_tpu.models import build

    config = tiny_config()
    model = build("dprt", config)
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(np.random.default_rng(0)).items()}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    exported = export_forward(model, variables, batch)
    path = str(tmp_path / "dpft.stablehlo")
    save_exported(exported, path)
    reloaded = load_exported(path)

    want = model.apply(variables, batch, train=False)
    got = reloaded.call(batch)
    for key in ("class", "center", "size", "angle"):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(want[key]), rtol=1e-5,
                                   atol=1e-5, err_msg=key)
