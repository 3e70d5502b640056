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

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_size(batch_size: int,
                       n_devices: Optional[int] = None) -> int:
    """Largest device count <= n_devices that divides the batch size."""
    n = n_devices if n_devices is not None else jax.device_count()
    for d in range(min(n, batch_size), 0, -1):
        if batch_size % d == 0 and n % d == 0:
            return d
    return 1


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
