"""Tests for misc utilities (endpoint interp parity, seeding, config IO)."""

import numpy as np
import jax.numpy as jnp

from dpft_tpu.utils import misc
from dpft_tpu.utils.config import load_config, loads_config, save_config


def np_reference_interp(x, xp, fp, left=None, right=None):
    """Direct numpy transliteration of the reference endpoint interp."""
    x0, x1, y0, y1 = xp[0], xp[-1], fp[0], fp[-1]
    left = left if left is not None else y0
    right = right if right is not None else y1
    if np.isclose(x1 - x0, 0):
        y = np.zeros_like(x)
    else:
        y = y0 + (x - x0) * (y1 - y0) / (x1 - x0)
    y = np.where(x < x0, left, y)
    y = np.where(x > x1, right, y)
    return y


def test_interp_endpoint_semantics(rng):
    xp = np.sort(rng.uniform(0, 1, size=20)).astype(np.float32)
    fp = rng.uniform(0, 1, size=20).astype(np.float32)
    x = np.linspace(-0.2, 1.2, 101).astype(np.float32)
    want = np_reference_interp(x, xp, fp, right=0.0)
    got = np.asarray(misc.interp(jnp.array(x), jnp.array(xp), jnp.array(fp),
                                 right=0.0))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_interp_degenerate_zero_span():
    xp = jnp.array([0.5, 0.5])
    fp = jnp.array([1.0, 2.0])
    x = jnp.array([0.5])
    assert float(misc.interp(x, xp, fp)[0]) == 0.0


def test_as_list():
    assert misc.as_list(1) == [1]
    assert misc.as_list([1, 2]) == [1, 2]
    assert misc.as_list((1, 2)) == [1, 2]


def test_set_seed_returns_key():
    key = misc.set_seed(42)
    assert key is not None
    assert misc.set_seed(None) is None


def test_host_prng_key_committed_to_cpu():
    """host_prng_key must return a key COMMITTED to a cpu-platform device.

    default_device only places the array; without the device_put commit,
    later fold_in/split calls made outside the context dispatch on the
    current default device (the tunneled TPU in production) — the opposite
    of the intent. Committed inputs pin eager ops and their outputs.
    """
    import jax

    key = misc.host_prng_key(7)
    assert key.committed
    assert key.device.platform == "cpu"
    folded = jax.random.fold_in(key, 3)
    assert folded.committed and folded.device == key.device
    a, b = jax.random.split(key)
    assert a.committed and a.device == key.device
    assert b.committed and b.device == key.device


def test_fold_in_host_detaches_cpu_key_only():
    """The trainer's per-step key derivation: a cpu-resident key detaches
    to numpy (free); any other key must pass through untouched (np.asarray
    there would force a per-step device->host readback)."""
    import jax

    from dpft_tpu.training.trainer import _fold_in_host

    key = misc.host_prng_key(7)
    out = _fold_in_host(key, 5)
    assert isinstance(out, np.ndarray)
    np.testing.assert_array_equal(out,
                                  np.asarray(jax.random.fold_in(key, 5)))


def test_init_on_host_matches_direct_init():
    import jax
    import flax.linen as nn

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(x)

    model = Toy()
    key = misc.host_prng_key(0)
    x = np.ones((2, 3), np.float32)
    via_host = misc.init_on_host(model.init, key, x)
    direct = model.init(key, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        via_host, direct)


def test_config_roundtrip(tmp_path):
    cfg = {"a": 1, "nested": {"b": [1, 2, 3]}}
    path = str(tmp_path / "sub" / "config.json")
    save_config(cfg, path)
    assert load_config(path) == cfg
    assert loads_config('{"x": 2}') == {"x": 2}


def test_trainer_evaluating_auto_default():
    """With train.logging=None the reference computes the per-step
    mAP/mGIoU and discards it (reference trainer.py:136,186: computed
    unconditionally, observable only through the step/epoch writers), so
    the trainer defaults to skipping it; any logging mode keeps it, and an
    explicit train.evaluating overrides both ways."""
    from kradar_fixture import base_config
    from dpft_tpu.training.trainer import CentralizedTrainer

    cfg = base_config()
    cfg["train"]["logging"] = None
    assert CentralizedTrainer.from_config(cfg).evaluating == -1

    cfg["train"]["logging"] = "epoch"
    assert CentralizedTrainer.from_config(cfg).evaluating == 1

    cfg["train"]["logging"] = None
    cfg["train"]["evaluating"] = 1
    assert CentralizedTrainer.from_config(cfg).evaluating == 1
