"""Tensor-parallel ('model' mesh axis) parameter sharding.

The reference has no model parallelism (SURVEY.md §2.9 — single-GPU
`CentralizedTrainer`, reference trainer.py:20,70); the DPFT workload
(d_model 16) does not *need* TP. This module is the extension point the
mesh design promises: every parameter (and its mirrored optimizer moments)
can be sharded over the 'model' axis purely by shape rules, with GSPMD
inserting the all-gathers/reduce-scatters on ICI. Because weight sharding
is a layout change, the TP step is numerically the single-device step
(verified in tests/test_tp.py on a virtual CPU mesh).

Rule: for each array leaf, shard the largest dimension divisible by the
'model' axis size (preferring later dimensions on ties — output features /
hidden dims live last in flax kernels); replicate anything that does not
divide (biases, scales, scalars).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_spec_for_shape(shape, tp_size: int, axis_name: str = "model") -> P:
    """PartitionSpec sharding the largest tp-divisible dim of `shape`."""
    if tp_size <= 1 or len(shape) < 2:
        return P()
    best = None
    for d in range(len(shape)):
        if shape[d] % tp_size == 0 and shape[d] >= tp_size:
            if best is None or shape[d] >= shape[best]:
                best = d
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis_name
    return P(*spec)


def place_tensor_parallel(tree: Any, mesh: Mesh,
                          axis_name: str = "model") -> Any:
    """device_puts every leaf with its shape-rule sharding over `mesh`.

    Applies uniformly to params, optimizer moments (same shapes as params)
    and batch statistics (1-D ⇒ replicated); GSPMD propagates the layouts
    through the jitted train step.
    """
    tp_size = mesh.shape[axis_name]

    def place(x):
        spec = tp_spec_for_shape(getattr(x, "shape", ()), tp_size, axis_name)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)
