"""Device mesh and sharding helpers.

The reference is a single-process single-GPU trainer (reference
trainer.py:20,70 - `CentralizedTrainer`, one `torch.device`); the TPU-native
equivalent scales data-parallel over a `jax.sharding.Mesh`. Gradients,
BatchNorm statistics and loss reductions are GLOBAL-batch semantics under
pjit: XLA inserts the ICI all-reduces automatically, so a DP step is
numerically the single-device step on the concatenated batch.

The mesh is 2D ('data', 'model'); the 'model' axis defaults to size 1 and is
the extension point for tensor/sequence sharding (the DPFT workload -
d_model 16, 400 queries - has no use for TP, but the axis keeps every
sharding route through one abstraction).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def data_parallel_size(batch_size: int,
                       n_devices: Optional[int] = None,
                       require_full: bool = False) -> int:
    """Largest device count <= n_devices that divides the batch size.

    Logs when devices would sit idle; with require_full (multi-chip
    production runs, config computing.require_full_mesh) an indivisible
    batch fails loudly instead.
    """
    n = n_devices if n_devices is not None else jax.device_count()
    for d in range(min(n, batch_size), 0, -1):
        if batch_size % d == 0 and n % d == 0:
            if d < n:
                msg = (f"batch_size={batch_size} uses only {d} of {n} "
                       f"devices on the 'data' axis ({n - d} idle); pick a "
                       f"batch size divisible by the device count")
                if require_full:
                    raise ValueError(msg)
                logger.warning(msg)
            return d
    return 1


def maybe_initialize_distributed(config: Dict[str, Any]) -> bool:
    """Multi-host (DCN) setup: ``jax.distributed.initialize`` guarded by
    ``computing.multi_host`` (beyond reference scope - the reference is
    single-process, SURVEY.md section 2.9).

    Coordinator/process parameters come from ``computing`` when present
    (coordinator_address, num_processes, process_id) and are otherwise
    auto-detected by JAX (TPU pod metadata / env vars). After this,
    ``jax.devices()`` spans all hosts and ``create_mesh`` lays ICI inside
    a host-slice and DCN across; each process feeds its local shard of
    the global batch. Returns True when initialization ran.
    """
    comp = config.get("computing", {})
    if not comp.get("multi_host"):
        return False
    kwargs = {k: comp[k] for k in
              ("coordinator_address", "num_processes", "process_id")
              if comp.get(k) is not None}
    jax.distributed.initialize(**kwargs)
    logger.info("jax.distributed initialized: process %d of %d, "
                "%d global devices", jax.process_index(),
                jax.process_count(), jax.device_count())
    return True


def process_local_indices(n: int, process_index: Optional[int] = None,
                          process_count: Optional[int] = None,
                          even: bool = False) -> np.ndarray:
    """Round-robin shard of dataset indices for this host in multi-host
    data parallelism (identity on a single process).

    even=True pads every process to ceil(n / process_count) indices by
    wrapping around, so all hosts see the SAME number of samples (and
    therefore the same number of loader batches). Hosts must stay in
    lockstep: the jitted step over the global mesh is a collective
    program, and a host with one fewer batch would deadlock the others.
    The wrap-around duplicates at most process_count - 1 samples per
    epoch.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    idx, _ = _even_local_indices(n, pi, pc) if even else (
        np.arange(pi, n, pc), None)
    return idx


def _even_local_indices(n: int, pi: int, pc: int):
    """(indices, real_mask) for one host's lockstep-even shard.

    The single source of the padding contract: the host's own round-robin
    indices first, then wrap-around duplicates (continuing the stride
    cyclically so short hosts duplicate DIFFERENT samples) flagged False
    in real_mask.
    """
    own = np.arange(pi, n, pc)
    per = -(-n // pc) if pc > 0 else len(own)  # ceil
    if pc <= 1 or len(own) >= per:
        return own, np.ones(len(own), bool)
    pad = np.arange(pi + len(own) * pc, pi + per * pc, pc) % max(n, 1)
    return (np.concatenate([own, pad]),
            np.arange(per) < len(own))


def shard_dataset_for_process(dataset):
    """Wraps a map-style dataset in the Subset of this host's indices
    (identity when single-process). Lockstep-even across hosts: short
    hosts are padded by wrap-around duplicates, which the Subset flags in
    `real_mask` so a pad_last loader weights them out of eval metrics."""
    if jax.process_count() <= 1:
        return dataset
    from dpft_tpu.data.loader import Subset
    idx, real = _even_local_indices(len(dataset), jax.process_index(),
                                    jax.process_count())
    return Subset(dataset, idx, real=real)


def make_global_batch(tree, sharding: NamedSharding):
    """Forms global device arrays from this host's process-local numpy
    batch. Single-process this is device_put; multi-host each process
    contributes its local shard of the global batch
    (jax.make_array_from_process_local_data inserts it at the right rows
    of the 'data'-sharded global array). Leaves already placed with the
    target sharding pass through untouched (idempotent, so a prefetch
    stage can place batches ahead of the step)."""
    def place(x):
        if isinstance(x, jax.Array) and x.sharding == sharding:
            return x
        if jax.process_count() <= 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
    return jax.tree_util.tree_map(place, tree)


def create_mesh(data: Optional[int] = None, model: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Creates a ('data', 'model') mesh over the given (or all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    if data is None:
        assert len(devices) % model == 0
        data = len(devices) // model
    used = devices[: data * model]
    arr = np.array(used).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shards the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
