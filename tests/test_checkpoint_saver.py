"""Async CheckpointSaver: overlapped saves commit atomically with config."""

import os.path as osp

import jax.numpy as jnp
import numpy as np

from dpft_tpu.models.registry import CheckpointSaver, parse_checkpoint_name


def test_async_saves_commit_with_config(tmp_path):
    saver = CheckpointSaver()
    cfg = {"model": {"name": "dprt"}, "train": {"epochs": 2}}
    tree0 = {"params": {"w": jnp.arange(8, dtype=jnp.float32)}}
    tree1 = {"params": {"w": jnp.arange(8, dtype=jnp.float32) + 1}}

    p0 = str(tmp_path / "ts_checkpoint_0000")
    p1 = str(tmp_path / "ts_checkpoint_0001")
    saver.save(tree0, cfg, p0)           # async, no wait
    saver.save(tree1, cfg, p1)           # finalizes p0 first
    saver.wait()

    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    for path, tree in ((p0, tree0), (p1, tree1)):
        assert osp.exists(osp.join(path, "config.json"))
        got = ckptr.restore(path)
        np.testing.assert_array_equal(np.asarray(got["params"]["w"]),
                                      np.asarray(tree["params"]["w"]))

    assert parse_checkpoint_name(p1) == (1, "ts")


def test_checkpoint_config_fallback_chain(tmp_path):
    """A checkpoint whose async commit was interrupted before config.json
    landed must still resolve its config: first from the run directory's
    snapshot (<dst>/<ts>/config.json, written at training start), then
    from an explicit fallback."""
    import json
    import os

    from dpft_tpu.models.registry import checkpoint_config

    run_dir = tmp_path / "ts"
    ckpt = run_dir / "checkpoints" / "ts_checkpoint_0003"
    os.makedirs(ckpt)  # orbax-committed dir, config.json missing

    # 1) Embedded copy wins when present.
    with open(ckpt / "config.json", "w") as f:
        json.dump({"source": "embedded"}, f)
    assert checkpoint_config(str(ckpt))["source"] == "embedded"
    os.remove(ckpt / "config.json")

    # 2) Run-directory snapshot covers the crash window.
    with open(run_dir / "config.json", "w") as f:
        json.dump({"source": "run_dir"}, f)
    assert checkpoint_config(str(ckpt))["source"] == "run_dir"
    os.remove(run_dir / "config.json")

    # 3) Explicit fallback (export --cfg); otherwise a clear error.
    assert checkpoint_config(str(ckpt),
                             fallback={"source": "cli"})["source"] == "cli"
    import pytest
    with pytest.raises(FileNotFoundError, match="No config found"):
        checkpoint_config(str(ckpt))


def test_wait_is_idempotent(tmp_path):
    saver = CheckpointSaver()
    saver.wait()  # no pending save: no-op
    saver.save({"params": {"w": jnp.zeros(4)}}, {}, str(tmp_path / "a_checkpoint_0000"),
               wait=True)
    saver.wait()
    assert osp.exists(str(tmp_path / "a_checkpoint_0000" / "config.json"))
