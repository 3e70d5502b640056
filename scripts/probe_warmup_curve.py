"""Per-call latency curve of large executables on the tunneled backend.

Closes the STATUS.md backward-time anomaly: the SAME cached executable
measures 13.5 ms/step under bench.py's 10-warmup protocol and ~8 s/step
when timed after a single warmup call (profile_train_step's old loop), and
the dummy-loss grad program sits at ~455 ms under a 1-warmup/20-rep mean.
Hypothesis: the remote runtime executes a freshly loaded large program in
a degraded tier for its first calls (or first tens of seconds) while an
optimized tier is prepared in the background.

This script times EVERY call individually (block_until_ready per call) for
the two implicated programs and prints the decay curve, giving the
discriminating data: a step-function drop after N calls / T seconds
confirms tiered warm-up; a flat curve means the program is just slow.

Run on the real TPU: python scripts/probe_warmup_curve.py
(compiles come from the persistent cache; ~5 min).
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

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
loss_fn = trainer.loss_fn
tx = trainer.optimizer_factory(trainer.optimizer_factory.base_lr)
jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
jtargets = jax.tree_util.tree_map(jnp.asarray, targets)
rng = jax.random.PRNGKey(1)


def curve(name, fn, n=40):
    print(f"--- {name}: per-call ms", flush=True)
    t_start = time.perf_counter()
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        dt = (time.perf_counter() - t0) * 1e3
        print(f"call {i:3d}  t+{time.perf_counter() - t_start:7.2f}s "
              f"{dt:10.2f} ms", flush=True)


# (a) the dummy-loss grad program (455 ms under a 20-rep mean).
def dummy(params, b):
    out, _ = model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        b, train=True, mutable=["batch_stats"], rngs={"dropout": rng})
    return sum(jnp.sum(v) for v in out.values())


dummy_grad = jax.jit(jax.grad(dummy))
curve("dummy-loss grad", lambda: dummy_grad(variables["params"], jbatch))

# (b) the monolithic train step through the trainer (13.5 ms warmed).
train_fn, _ = trainer._make_steps(model, tx, create_mesh(data=1))
fresh = jax.tree_util.tree_map(jnp.copy, variables)
st = train_fn.place_state({
    "params": fresh["params"], "batch_stats": fresh["batch_stats"],
    "opt_state": tx.init(fresh["params"]),
    "step": jnp.zeros((), jnp.int32)})
holder = {"st": st}


def step_once():
    st, total, _, _ = train_fn(holder["st"], jbatch, jtargets, rng)
    holder["st"] = st
    return total


curve("monolithic train step", step_once)
print("done", flush=True)
