"""Backward-time probe: model backward vs set-loss backward, flagship B=4.

Investigation tooling for the backward-time anomaly (STATUS.md): the
model-only backward measured 13.75-29.7 ms on one day and 457 ms on the
next through the tunneled chip with an IDENTICAL lowered grad program
(modulo LayerNorm-eps constants), pointing at remote-environment drift.
Run on the real TPU to discriminate:
  - "model fwd+bwd (dummy loss)" ~40-45 ms  -> environment recovered
  - ~460 ms                                  -> drift persists
Usage: python scripts/probe_backward.py   (needs the TPU tunnel; ~2 min
of remote compiles on a warm cache, ~15 min cold).
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _flagship
from dpft_tpu.training.trainer import CentralizedTrainer
from dpft_tpu.utils.profiling import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
B = 4
config, model, batch, targets, variables = _flagship(B, "")
trainer = CentralizedTrainer.from_config(config)
loss_fn = trainer.loss_fn
jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
jtargets = jax.tree_util.tree_map(jnp.asarray, targets)
rng = jax.random.PRNGKey(1)


def timeit(name, f, *args, reps=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter() - t0) / reps * 1e3:9.2f} ms",
          flush=True)
    return out


def fwd(params, b):
    out, _ = model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        b, train=True, mutable=["batch_stats"], rngs={"dropout": rng})
    return out


out = jax.jit(fwd)(variables["params"], jbatch)
out = jax.tree_util.tree_map(jnp.asarray, out)
idx = jax.jit(loss_fn.match)(out, jtargets)
jax.block_until_ready(idx)

# (b) loss fwd + backward wrt the model OUTPUT only (small program).
def loss_of_out(o):
    total, _ = loss_fn(o, jtargets, indices=idx)
    return total

timeit("loss forward", jax.jit(loss_of_out), out)
timeit("loss backward (wrt output)", jax.jit(jax.grad(loss_of_out)), out)

# (a) model backward with a dummy scalar loss (no set loss).
def dummy(params, b):
    o = fwd(params, b)
    return sum(jnp.sum(v) for v in o.values())

timeit("model fwd+bwd (dummy loss)", jax.jit(jax.grad(dummy)),
       variables["params"], jbatch)
