"""Bisects the slow monolithic train-step program (STATUS.md anomaly).

profile_train_step.py shows the full trainer step at seconds/step while its
constituent programs (forward 2.7 ms, matcher 0.03 ms, value_and_grad
6.9 ms, optimizer update 12.2 ms, metric 0.05 ms) sum to ~22 ms. The
monolith differs from the parts in exactly three ways; this script times
one variant per difference to find the poison:

  1. buffer donation of the state argument (donate_argnums)
  2. the `loss > 0` lax.cond update gate (reference trainer.py:131-133)
  3. being one fused program at all (grad + optimizer + metric together)

Run on the real TPU: python scripts/probe_monolith.py
Compiles go through the persistent cache (utils/profiling.py).
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from bench import _flagship
from dpft_tpu.training.trainer import CentralizedTrainer
from dpft_tpu.utils.profiling import enable_persistent_compilation_cache

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
idx = jax.jit(loss_fn.match)(
    jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, jbatch),
    jtargets)
jax.block_until_ready(idx)


def fresh_state():
    vs = jax.tree_util.tree_map(jnp.copy, variables)
    return {"params": vs["params"], "batch_stats": vs["batch_stats"],
            "opt_state": tx.init(vs["params"]),
            "step": jnp.zeros((), jnp.int32)}


def make_step(gate: str, with_metric: bool):
    def step(state, batch, targets, rng, indices):
        def compute_loss(params):
            vs = {"params": params, "batch_stats": state["batch_stats"]}
            out, updates = model.apply(vs, batch, train=True,
                                       mutable=["batch_stats"],
                                       rngs={"dropout": rng})
            total, losses = loss_fn(out, targets, indices=indices)
            return total, (losses, updates, out)

        (total, (losses, updates, out)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state["params"])

        if gate == "cond":
            def apply_up(_):
                upd, new_opt = tx.update(grads, state["opt_state"],
                                         state["params"])
                return optax.apply_updates(state["params"], upd), new_opt

            def skip_up(_):
                return state["params"], state["opt_state"]

            new_params, new_opt = jax.lax.cond(total > 0, apply_up,
                                               skip_up, None)
        elif gate == "select":
            upd, new_opt_full = tx.update(grads, state["opt_state"],
                                          state["params"])
            applied = optax.apply_updates(state["params"], upd)
            take = total > 0
            new_params = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, a, b), applied,
                state["params"])
            new_opt = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, a, b), new_opt_full,
                state["opt_state"])
        else:  # 'none': unconditional update
            upd, new_opt = tx.update(grads, state["opt_state"],
                                     state["params"])
            new_params = optax.apply_updates(state["params"], upd)

        new_state = dict(state, params=new_params, opt_state=new_opt,
                         step=state["step"] + 1,
                         batch_stats=updates["batch_stats"])
        metrics = metric(out, targets) if with_metric else {}
        return new_state, total, losses, metrics
    return step


def timeit(name, fn, state, reps=5):
    out = fn(state, jbatch, jtargets, rng, idx)
    jax.block_until_ready(out[1])
    state = out[0]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(state, jbatch, jtargets, rng, idx)
        state = out[0]
    jax.block_until_ready(out[1])
    print(f"{name:40s} {(time.perf_counter() - t0) / reps * 1e3:9.2f} ms",
          flush=True)


# (2) donation off, cond kept: is donation the poison?
timeit("monolith no-donate + cond + metric",
       jax.jit(make_step("cond", True)), fresh_state())
# (3) donation kept, cond -> select: is the cond the poison?
timeit("monolith donate + select + metric",
       jax.jit(make_step("select", True), donate_argnums=(0,)),
       fresh_state())
# (4) both off: is it the fusion of grad+opt itself?
timeit("monolith no-donate + select + metric",
       jax.jit(make_step("select", True)), fresh_state())
# (5) unconditional update, no donation (closest to profile's parts)
timeit("monolith no-donate + nogate + nometric",
       jax.jit(make_step("none", False)), fresh_state())
print("done", flush=True)
