"""Definitive train-step and forward timings via readback barriers.

probe_timing_integrity.py established that on this tunneled backend
`block_until_ready` can under-report (the end-block-only chained train
loop says 13.5 ms/step while per-call blocking says 672 ms/step), while a
device_get of a scalar that depends on the result cannot be signalled
early. This probe times, all with readback barriers:

  1. N chained train steps, ONE final readback of the last loss: the
     states chain serially, so wall/N is the true steady-state step time
     regardless of client-side completion signalling.
  2. The same with per-call readbacks (isolates per-call sync overhead).
  3. Camera-backbone-only eval forward (conv-heavy, few kernels) and the
     full flagship eval forward, both pipelined+readback: separates real
     conv throughput from per-kernel launch overhead (the full model
     launches ~1-2k fused kernels; the backbone a few hundred).

Run on the real TPU: python scripts/probe_step_truth.py
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _flagship
from dpft_tpu.parallel import create_mesh
from dpft_tpu.training.trainer import CentralizedTrainer
from dpft_tpu.utils.profiling import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
B = 4
config, model, batch, targets, variables = _flagship(B, "")
trainer = CentralizedTrainer.from_config(config)
tx = trainer.optimizer_factory(trainer.optimizer_factory.base_lr)
jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
jtargets = jax.tree_util.tree_map(jnp.asarray, targets)
rng = jax.random.PRNGKey(1)

train_fn, _ = trainer._make_steps(model, tx, create_mesh(data=1))
state = train_fn.place_state({
    "params": variables["params"], "batch_stats": variables["batch_stats"],
    "opt_state": tx.init(variables["params"]),
    "step": jnp.zeros((), jnp.int32)})

# Warm: 3 steps, readback.
for _ in range(3):
    state, total, _, _ = train_fn(state, jbatch, jtargets, rng)
float(jax.device_get(total))

# 1. chained steps, one final readback.
N = 20
t0 = time.perf_counter()
for _ in range(N):
    state, total, _, _ = train_fn(state, jbatch, jtargets, rng)
final = float(jax.device_get(total))
dt = (time.perf_counter() - t0) / N * 1e3
print(f"train step, {N} chained, final readback     {dt:9.2f} ms/step "
      f"(loss {final:.3f})", flush=True)

# 2. per-call readback.
times = []
for _ in range(5):
    t0 = time.perf_counter()
    state, total, _, _ = train_fn(state, jbatch, jtargets, rng)
    float(jax.device_get(total))
    times.append((time.perf_counter() - t0) * 1e3)
print(f"train step, per-call readback (median of 5) "
      f"{float(np.median(times)):9.2f} ms/step", flush=True)

# 3. conv-throughput vs launch-overhead: backbone alone vs full model.
from dpft_tpu.models.backbones import build_backbone  # noqa: E402
from dpft_tpu.utils.misc import host_prng_key, init_on_host  # noqa: E402

cfg = dict(config["computing"] | config["model"]["backbones"]["camera_mono"])
cfg.pop("weights", None)
bb = build_backbone(cfg.pop("name"), cfg)
x = jnp.asarray(np.random.default_rng(0).normal(
    size=(B, 512, 910, 3)).astype(np.float32))
bvars = init_on_host(bb.init, host_prng_key(0), x, False)
bb_fwd = jax.jit(lambda v, x: bb.apply(v, x, False))

out = bb_fwd(bvars, x)
float(jax.device_get(jnp.sum(out["4"])))
t0 = time.perf_counter()
M = 10
for _ in range(M):
    out = bb_fwd(bvars, x)
bsum = float(jax.device_get(jnp.sum(out["4"])))
print(f"camera R101 backbone fwd, pipelined+readback "
      f"{(time.perf_counter() - t0) / M * 1e3:9.2f} ms/call", flush=True)

fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
dbatch = jax.device_put(batch)
out = fwd(variables, dbatch)
float(jax.device_get(jnp.sum(out["class"])))
t0 = time.perf_counter()
for _ in range(M):
    out = fwd(variables, dbatch)
float(jax.device_get(jnp.sum(out["class"])))
print(f"flagship eval fwd, pipelined+readback        "
      f"{(time.perf_counter() - t0) / M * 1e3:9.2f} ms/call", flush=True)
print("done", flush=True)
