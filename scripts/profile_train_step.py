"""Decomposes the flagship train step into its constituent programs.

Times, on the current backend: the train-mode forward, the hoisted
Hungarian matcher program, the monolithic fwd+bwd grad program, the
optimizer update, the per-step metric, and the full trainer step with and
without per-step metrics. Run from the repo root:

    python scripts/profile_train_step.py

Compiles are served from the persistent cache (utils/profiling.py), so
re-runs are cheap; the first run compiles a few instrumentation-only
programs. Complements `BENCH_MODE=train python bench.py` (end-to-end
number) and `utils/profiling.trace` (XLA trace for xprof).
"""
import sys
import os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from bench import _flagship
from dpft_tpu.parallel import create_mesh
from dpft_tpu.training.trainer import CentralizedTrainer
from dpft_tpu.utils.profiling import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
B = 4
config, model, batch, targets, variables = _flagship(B, "")
trainer = CentralizedTrainer.from_config(config)
tx = trainer.optimizer_factory(trainer.optimizer_factory.base_lr)
state = {
    "params": variables["params"],
    "batch_stats": variables["batch_stats"],
    "opt_state": tx.init(variables["params"]),
    "step": jnp.zeros((), jnp.int32),
}
jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
jtargets = jax.tree_util.tree_map(jnp.asarray, targets)
rng = jax.random.PRNGKey(1)
loss_fn = trainer.loss_fn
metric = trainer.metric


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3:9.2f} ms")
    return out


def fwd_train(state, b, rng):
    out, _ = model.apply(
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        b, train=True, mutable=["batch_stats"], rngs={"dropout": rng})
    return out


fwd_jit = jax.jit(fwd_train)
match_jit = jax.jit(loss_fn.match)
out = timeit("forward (train mode)", fwd_jit, state, jbatch, rng)
idx = timeit("hungarian matcher", match_jit, out, jtargets)


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


def update_only(state, grads):
    upd, new_opt = tx.update(grads, state["opt_state"], state["params"])
    import optax
    return optax.apply_updates(state["params"], upd)


total, grads = timeit("fwd+bwd (value_and_grad)", jax.jit(grad_only),
                      state, jbatch, jtargets, rng, idx)
timeit("optimizer update", jax.jit(update_only), state, grads)
if metric is not None:
    timeit("per-step metric", jax.jit(metric), out, jtargets)

# Full step via the trainer, with and without per-step metrics.
for label, ev in [("full step (with metric)", 1),
                  ("full step (no metric)", -1)]:
    trainer.evaluating = ev
    train_fn, _ = trainer._make_steps(model, tx, create_mesh(data=1))
    # Fresh copies: the jitted step donates its state argument, so the
    # original `variables` buffers must not be reused across modes.
    fresh = jax.tree_util.tree_map(jnp.copy, variables)
    st = train_fn.place_state({
        "params": fresh["params"],
        "batch_stats": fresh["batch_stats"],
        "opt_state": tx.init(fresh["params"]),
        "step": jnp.zeros((), jnp.int32),
    })
    st, t0_, _, _ = train_fn(st, jbatch, jtargets, rng)
    jax.block_until_ready(t0_)
    t0 = time.perf_counter()
    for _ in range(10):
        st, tt, _, _ = train_fn(st, jbatch, jtargets, rng)
    jax.block_until_ready(tt)
    print(f"{label:28s} {(time.perf_counter() - t0) / 10 * 1e3:9.2f} ms")
