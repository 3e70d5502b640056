"""Reference-checkpoint importer round-trip tests.

The converse of test_full_model_parity.py: a torch DPRT replica with the
reference's exact state_dict key space (tests/torch_dprt.py) is saved as a
FULL-MODEL pickle (the reference's checkpoint format, reference
trainer.py:256-258), imported through dpft_tpu/models/torch_checkpoint.py,
and the flax model with the imported variables is pinned numerically
against the torch module's own forward. This is the evidence that anyone
holding the published Zenodo checkpoints (reference README.md:23-24) can
reproduce the reference function on TPU with zero training.

The stub-unpickler route is exercised explicitly (force_stub): a real
reference checkpoint references ``dprt.*`` classes that are not importable
here, so the import must work from pickled module state alone.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dpft_tpu.models import build as build_model
from dpft_tpu.models import registry
from dpft_tpu.models import torch_checkpoint
from dpft_tpu.utils.config import save_config

from test_full_model_parity import make_batch, tiny_config
import torch_dprt

pytestmark = pytest.mark.slow


def _config():
    cfg = tiny_config()
    # Default config (size_bias_prior active): the importer must
    # neutralize the flax init delta with a zero bias.
    del cfg["model"]["head"]["size_bias_prior"]
    return cfg


@pytest.fixture(scope="module")
def saved_checkpoint(tmp_path_factory):
    """A full-model pickle + config snapshot in the reference layout."""
    cfg = _config()
    model = torch_dprt.build_tiny_dprt(cfg, seed=3)
    run_dir = tmp_path_factory.mktemp("run")
    path = run_dir / "2026-08-20-12-00-00_checkpoint_0122.pt"
    torch.save(model, str(path))
    save_config(cfg, str(run_dir / "config.json"))

    rng = np.random.default_rng(7)
    batch_np = make_batch(rng)
    with torch.no_grad():
        tout = model({k: torch.from_numpy(v) for k, v in batch_np.items()})
    return cfg, str(path), batch_np, {k: v.numpy() for k, v in tout.items()}


def _assert_forward_parity(cfg, variables, batch_np, tout):
    model = build_model("dprt", cfg)
    fbatch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    fout = model.apply(variables, fbatch, train=False)
    for key in ("class", "center", "size", "angle"):
        np.testing.assert_allclose(
            np.asarray(fout[key]), tout[key], rtol=1e-4, atol=2e-4,
            err_msg=key)


def test_import_full_pickle_stub_route(saved_checkpoint):
    """force_stub: every non-torch class is reconstructed from pickled
    state, the situation a real reference checkpoint presents."""
    cfg, path, batch_np, tout = saved_checkpoint
    variables = torch_checkpoint.import_checkpoint(path, cfg,
                                                   force_stub=True)
    # The size_bias_prior delta is neutralized with zeros.
    bias = variables["params"]["fuser"]["head0"]["size_head"]["out"]["bias"]
    np.testing.assert_array_equal(np.asarray(bias), np.zeros(3))
    _assert_forward_parity(cfg, variables, batch_np, tout)


def test_registry_load_torch_checkpoint(saved_checkpoint):
    """End-to-end registry.load: name contract parse + sibling config.json
    + torch import dispatch."""
    _, path, batch_np, tout = saved_checkpoint
    module, variables, epoch, timestamp = registry.load(path)
    assert epoch == 122
    assert timestamp == "2026-08-20-12-00-00"
    fbatch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    fout = module.apply(variables, fbatch, train=False)
    for key in ("class", "center", "size", "angle"):
        np.testing.assert_allclose(
            np.asarray(fout[key]), tout[key], rtol=1e-4, atol=2e-4,
            err_msg=key)


def test_state_dict_checkpoint_accepted(saved_checkpoint, tmp_path):
    """A bare state_dict .pt (not a full-model pickle) imports too."""
    cfg, path, batch_np, tout = saved_checkpoint
    model = torch_dprt.build_tiny_dprt(cfg, seed=3)
    sd_path = tmp_path / "state_dict.pt"
    torch.save(model.state_dict(), str(sd_path))
    state = torch_checkpoint.load_torch_checkpoint(str(sd_path))
    variables = torch_checkpoint.convert_full_model(state, cfg)
    _assert_forward_parity(cfg, variables, batch_np, tout)


def test_export_from_torch_checkpoint(saved_checkpoint, tmp_path):
    """A reference .pt freezes into a StableHLO serving artifact whose
    execution matches the torch forward (the full switch-over chain:
    torch pickle -> flax variables -> jax.export -> deserialize/call)."""
    from dpft_tpu import export as export_mod

    cfg, path, batch_np, tout = saved_checkpoint
    module, variables, _, _ = registry.load(path)
    fbatch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    exported = export_mod.export_forward(module, variables, fbatch)
    artifact = tmp_path / "model.stablehlo"
    export_mod.save_exported(exported, str(artifact))
    out = export_mod.load_exported(str(artifact)).call(fbatch)
    for key in ("class", "center", "size", "angle"):
        np.testing.assert_allclose(
            np.asarray(out[key]), tout[key], rtol=1e-4, atol=2e-4,
            err_msg=key)


def test_unknown_key_raises(saved_checkpoint):
    """Strictness: nothing is dropped silently."""
    cfg, path, _, _ = saved_checkpoint
    state = torch_checkpoint.load_torch_checkpoint(path, force_stub=True)
    state["fuser.mystery.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="mystery"):
        torch_checkpoint.convert_full_model(state, cfg)
