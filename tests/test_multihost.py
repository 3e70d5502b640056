"""Multi-host (DCN) extension points: config-guarded no-op, process-local
index sharding, loud under-use / indivisible-batch handling, and a REAL
two-process training run (Gloo-backed CPU collectives) checked against the
single-process baseline."""

import logging
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

from dpft_tpu.parallel import (data_parallel_size,
                               maybe_initialize_distributed,
                               process_local_indices,
                               shard_dataset_for_process)

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_multi_host_disabled_is_noop():
    assert maybe_initialize_distributed({}) is False
    assert maybe_initialize_distributed(
        {"computing": {"multi_host": False}}) is False


def test_process_local_indices_single_process():
    # Single-process runtime: identity shard.
    np.testing.assert_array_equal(process_local_indices(7), np.arange(7))


def test_process_local_indices_round_robin():
    np.testing.assert_array_equal(
        process_local_indices(10, process_index=1, process_count=4),
        np.array([1, 5, 9]))
    # Every index lands on exactly one process.
    all_idx = np.concatenate([
        process_local_indices(10, process_index=p, process_count=4)
        for p in range(4)])
    np.testing.assert_array_equal(np.sort(all_idx), np.arange(10))


def test_process_local_indices_even_padding():
    # 10 samples over 4 hosts: every host gets ceil(10/4)=3 indices; the
    # short hosts wrap around (lockstep batch counts across hosts).
    counts = []
    for p in range(4):
        idx = process_local_indices(10, process_index=p, process_count=4,
                                    even=True)
        counts.append(len(idx))
        assert (idx < 10).all()
    assert counts == [3, 3, 3, 3]
    # Identity when single-process or already even.
    np.testing.assert_array_equal(
        process_local_indices(8, process_index=1, process_count=4,
                              even=True),
        np.array([1, 5]))


def test_shard_dataset_identity_single_process():
    ds = list(range(5))
    assert shard_dataset_for_process(ds) is ds


def test_subset_pickle_and_copy():
    """Regression: unconditional __getattr__ delegation recursed through
    the missing self.dataset during unpickle (__setstate__ probe)."""
    import copy
    import pickle

    from dpft_tpu.data.loader import Subset

    sub = Subset(list(range(6)), [1, 3], real=[True, False])
    back = pickle.loads(pickle.dumps(sub))
    assert [back[i] for i in range(2)] == [1, 3]
    np.testing.assert_array_equal(back.real_mask, [True, False])
    dup = copy.deepcopy(sub)
    assert [dup[i] for i in range(2)] == [1, 3]


def test_subset_delegates():
    from dpft_tpu.data.loader import Subset

    class DS:
        max_boxes = 7

        def __len__(self):
            return 6

        def __getitem__(self, i):
            return i * 10

    sub = Subset(DS(), [1, 3, 5])
    assert len(sub) == 3
    assert [sub[i] for i in range(3)] == [10, 30, 50]
    assert sub.max_boxes == 7  # attribute fall-through


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    """Spawns TWO OS processes that jax.distributed-initialize against each
    other (2 CPU devices each -> a 4-device global mesh), train over
    host-local dataset shards with make_global_batch assembling the global
    batch, and converge to parameters equal to the single-process run on
    the full dataset (batch-mean losses are row-permutation invariant)."""
    worker = osp.join(REPO, "tests", "multihost_worker.py")
    outs = [str(tmp_path / f"p{p}.npz") for p in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, worker, str(p), "9934", outs[p]],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for p in range(2)]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    a, b = np.load(outs[0]), np.load(outs[1])
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)

    # Single-process baseline on the full dataset, global batch size 4
    # (= 2 hosts x local batch 2).
    import jax

    from dpft_tpu.data.loader import DataLoader
    from dpft_tpu.training.optimizer import build_optimizer
    from dpft_tpu.training.trainer import CentralizedTrainer
    from multihost_worker import build_job

    model, loss, dataset = build_job()
    loader = DataLoader(dataset, batch_size=4, shuffle=False)
    trainer = CentralizedTrainer(
        epochs=2, optimizer=build_optimizer("SGD", lr=0.05), loss=loss,
        scheduler=lambda epoch: 1.0, metric=None, config={})
    result = trainer.train(model, loader, rng=jax.random.PRNGKey(0))
    flat = {"/".join(map(str, path)): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                result["variables"]["params"])[0]}
    for k, v in flat.items():
        np.testing.assert_allclose(a[k], v, rtol=1e-5, atol=1e-6,
                                   err_msg=k)
    np.testing.assert_allclose(a["history"],
                               np.asarray(result["history"]),
                               rtol=1e-5, atol=1e-6)


def test_data_parallel_size_warns_on_idle_devices(caplog):
    with caplog.at_level(logging.WARNING, "dpft_tpu.parallel.mesh"):
        assert data_parallel_size(4, 8) == 4
    assert any("idle" in r.message for r in caplog.records)


def test_data_parallel_size_require_full_raises():
    with pytest.raises(ValueError, match="idle"):
        data_parallel_size(3, 8, require_full=True)
    # Divisible batch: no error, full mesh.
    assert data_parallel_size(8, 8, require_full=True) == 8
