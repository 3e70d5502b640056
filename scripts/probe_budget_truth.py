"""Readback-fenced step-time budget of the flagship train step.

Replaces profile_train_step.py's numbers for the budget table in
STATUS.md: that script's end-blocked loops under-report on the tunneled
backend (scripts/probe_timing_integrity.py), so every program here is
timed with utils/profiling.sync fences. Chained-state loops fence once at
the tail (serial dependence bounds the chain); independent-rep loops fence
every call and subtract the measured readback round trip.

Run on the real TPU: python scripts/probe_budget_truth.py
(all programs come from the persistent compile cache).
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
from dpft_tpu.utils.profiling import (enable_persistent_compilation_cache,
                                      readback_rtt_ms, sync)

enable_persistent_compilation_cache()
B = 4
config, model, batch, targets, variables = _flagship(B, "")
trainer = CentralizedTrainer.from_config(config)
loss_fn = trainer.loss_fn
metric = trainer.metric
tx = trainer.optimizer_factory(trainer.optimizer_factory.base_lr)
jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
jtargets = jax.tree_util.tree_map(jnp.asarray, targets)
rng = jax.random.PRNGKey(1)


def percall(name, fn, *args, reps=10, runs=3):
    """Repeated-medians protocol (utils/profiling.benchmark_medians):
    tunnel drift makes single-run lines +-70%, so each budget line is the
    median of `runs` independent run-medians with the min-max half-spread
    as its error bar."""
    out = fn(*args)
    sync(out)
    medians = []
    for _ in range(runs):
        rtt = readback_rtt_ms(jax.tree_util.tree_leaves(out)[0])
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            times.append((time.perf_counter() - t0) * 1e3)
        medians.append(max(float(np.median(times)) - rtt, 0.0))
    med = float(np.median(medians))
    spread = (max(medians) - min(medians)) / 2.0
    print(f"{name:36s} {med:9.2f} ms +- {spread:6.2f}", flush=True)
    return out


def fwd_train(state, b, rng):
    out, _ = model.apply(
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        b, train=True, mutable=["batch_stats"], rngs={"dropout": rng})
    return out


state = {
    "params": variables["params"],
    "batch_stats": variables["batch_stats"],
    "opt_state": tx.init(variables["params"]),
    "step": jnp.zeros((), jnp.int32),
}
out = percall("forward (train mode)", jax.jit(fwd_train), state, jbatch,
              rng)
idx = percall("hungarian matcher", jax.jit(loss_fn.match), out, jtargets)


def grad_only(state, b, t, rng, idx):
    def compute(p):
        o, upd = model.apply(
            {"params": p, "batch_stats": state["batch_stats"]},
            b, train=True, mutable=["batch_stats"], rngs={"dropout": rng})
        total, losses = loss_fn(o, t, indices=idx)
        return total, (losses, upd, o)
    (total, aux), g = jax.value_and_grad(compute, has_aux=True)(
        state["params"])
    return total, g


total, grads = percall("fwd+bwd (value_and_grad)", jax.jit(grad_only),
                       state, jbatch, jtargets, rng, idx)


def update_only(state, grads):
    import optax
    upd, new_opt = tx.update(grads, state["opt_state"], state["params"])
    return optax.apply_updates(state["params"], upd)


percall("optimizer update", jax.jit(update_only), state, grads)
if metric is not None:
    percall("per-step metric", jax.jit(metric), out, jtargets)

# Full trainer step, with and without per-step metric: chained states,
# one tail fence per timed window, repeated-medians across runs.
for label, ev in [("full step (with metric)", 1),
                  ("full step (no metric)", -1)]:
    trainer.evaluating = ev
    train_fn, _ = trainer._make_steps(model, tx, create_mesh(data=1))
    medians = []
    for _ in range(3):
        fresh = jax.tree_util.tree_map(jnp.copy, variables)
        st = train_fn.place_state({
            "params": fresh["params"], "batch_stats": fresh["batch_stats"],
            "opt_state": tx.init(fresh["params"]),
            "step": jnp.zeros((), jnp.int32)})
        for _ in range(2):
            st, tt, _, _ = train_fn(st, jbatch, jtargets, rng)
        sync(tt)
        t0 = time.perf_counter()
        for _ in range(10):
            st, tt, _, _ = train_fn(st, jbatch, jtargets, rng)
        sync(tt)
        medians.append((time.perf_counter() - t0) / 10 * 1e3)
        del st, fresh
    med = float(np.median(medians))
    spread = (max(medians) - min(medians)) / 2.0
    print(f"{label:36s} {med:9.2f} ms +- {spread:6.2f}", flush=True)
print("done", flush=True)
