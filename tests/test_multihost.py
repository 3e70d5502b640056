"""Multi-host (DCN) extension points: config-guarded no-op, process-local
index sharding, and loud under-use / indivisible-batch handling."""

import logging

import numpy as np
import pytest

from dpft_tpu.parallel import (data_parallel_size,
                               maybe_initialize_distributed,
                               process_local_indices)


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


def test_data_parallel_size_warns_on_idle_devices(caplog):
    with caplog.at_level(logging.WARNING, "dpft_tpu.parallel.mesh"):
        assert data_parallel_size(4, 8) == 4
    assert any("idle" in r.message for r in caplog.records)


def test_data_parallel_size_require_full_raises():
    with pytest.raises(ValueError, match="idle"):
        data_parallel_size(3, 8, require_full=True)
    # Divisible batch: no error, full mesh.
    assert data_parallel_size(8, 8, require_full=True) == 8
