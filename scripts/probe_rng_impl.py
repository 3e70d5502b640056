"""Probe: threefry vs TPU hardware RNG (rbg) for the train step's dropout.

The B=8 bf16 monolith's entry computation carries ~5k threefry ops
(xor/shift/or chains) generating the decoder's dropout masks (census
2026-08-20). JAX's 'rbg' PRNG lowers to the TPU RngBitGenerator
instruction instead. Masks differ stream-wise (both valid Bernoulli
noise); the question is only whether threefry arithmetic costs step
time. Each variant is timed independently and failures are recorded
per-variant (the tunneled backend may reject extended-dtype transfers
or the rbg lowering outright).
"""
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.chdir(ROOT)

import jax
import jax.numpy as jnp

import bench
from dpft_tpu.parallel import create_mesh
from dpft_tpu.training.trainer import CentralizedTrainer
from dpft_tpu.utils.profiling import (enable_persistent_compilation_cache,
                                      sync)

enable_persistent_compilation_cache()

B = int(os.environ.get("PROBE_BATCH", "8"))
reps = int(os.environ.get("PROBE_REPS", "20"))
config, model, batch, targets, variables = bench._flagship(B, "bfloat16")
trainer = CentralizedTrainer.from_config(config)
tx = trainer.optimizer_factory(trainer.optimizer_factory.base_lr)
mesh = create_mesh(data=1)
state0 = {"params": variables["params"],
          "batch_stats": variables["batch_stats"],
          "opt_state": tx.init(variables["params"]),
          "step": jnp.zeros((), jnp.int32)}
train_step, _ = trainer._make_steps(model, tx, mesh)
state0 = train_step.place_state(state0)
jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
jtargets = jax.tree_util.tree_map(jnp.asarray, targets)


def key_threefry():
    return jax.random.PRNGKey(1)


def key_rbg():
    # Created ON DEVICE inside a jitted program: transferring an
    # extended-dtype (typed key) host array to the tunneled backend is
    # its own failure mode, separate from the rbg lowering itself.
    return jax.jit(lambda: jax.random.key(1, impl="rbg"))()


for name, mk in (("threefry", key_threefry), ("rbg", key_rbg)):
    try:
        key = mk()
        state = state0
        print(f"{name}: first call...", flush=True)
        t0 = time.perf_counter()
        state, total, _, _ = train_step(state, jbatch, jtargets, key)
        sync(total)
        compile_s = time.perf_counter() - t0
        for _ in range(3):
            state, total, _, _ = train_step(state, jbatch, jtargets, key)
        sync(total)
        t0 = time.perf_counter()
        for _ in range(reps):
            state, total, _, _ = train_step(state, jbatch, jtargets, key)
        sync(total)
        sec = (time.perf_counter() - t0) / reps
        print(f"{name}: {sec:.4f} s/step ({B / sec:.2f} frames/s), "
              f"first-call {compile_s:.0f}s, loss={float(total):.3f}",
              flush=True)
    except Exception:
        print(f"{name}: FAILED", flush=True)
        traceback.print_exc()
