"""Split the matcher + optimizer budget lines into their parts.

STATUS.md's step budget charges 27-46 ms to "Hungarian matcher" and
21-29 ms to "optimizer update" at flagship B=4. This probe separates,
with the readback-fenced protocol (utils/profiling.sync):

  matcher = cost-matrix build (giou3d over B x 400 x 32 yaw-box pairs)
          + JV solve (sequential augmenting-path while loops)
  optimizer = AdamW update as a param-tree program (one fused elementwise
              chain per tensor, ~hundreds of executed ops on this
              overhead-bound backend) vs optax.flatten'd (one ravelled
              buffer, a handful of ops)

Run on the real TPU: python scripts/probe_matcher_split.py
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bench import _flagship
from dpft_tpu.training import assigner as assigner_lib
from dpft_tpu.utils.profiling import (enable_persistent_compilation_cache,
                                      readback_rtt_ms, sync)

enable_persistent_compilation_cache()
B = 4
config, model, batch, targets, variables = _flagship(B, "")

from dpft_tpu.training.trainer import CentralizedTrainer  # noqa: E402

trainer = CentralizedTrainer.from_config(config)
loss_fn = trainer.loss_fn
jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
jtargets = jax.tree_util.tree_map(jnp.asarray, targets)
rng = jax.random.PRNGKey(1)


def percall(name, fn, *args, reps=10):
    out = fn(*args)
    sync(out)
    rtt = readback_rtt_ms(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) * 1e3)
    med = max(float(np.median(times)) - rtt, 0.0)
    print(f"{name:44s} {med:9.2f} ms  (rtt {rtt:.1f})", flush=True)
    return out


def fwd_train(params, bstats, b, rng):
    out, _ = model.apply({"params": params, "batch_stats": bstats},
                         b, train=True, mutable=["batch_stats"],
                         rngs={"dropout": rng})
    return out


out = percall("forward (train mode)", jax.jit(fwd_train),
              variables["params"], variables["batch_stats"], jbatch, rng)

tgt_nm = {k: v for k, v in jtargets.items() if k != "sample_mask"}


def cost_only(out, tgt):
    def per_sample(o, t):
        sg = jax.lax.stop_gradient
        return assigner_lib.cost_matrix(sg(o), sg(t), loss_fn.loss_weights,
                                        loss_fn.giou_weight)
    return jax.vmap(per_sample)(out, tgt)


cost = percall("matcher: cost matrix (giou3d etc)", jax.jit(cost_only),
               out, tgt_nm)


def solve_only(cost, mask):
    return jax.vmap(assigner_lib.hungarian_assign)(cost, mask)


percall("matcher: JV solve", jax.jit(solve_only), cost, tgt_nm["gt_mask"])
percall("matcher: full match program", jax.jit(loss_fn.match), out, jtargets)

# ---- optimizer: tree form (production) ----
# optax.flatten was measured head-to-head here and REJECTED at flagship
# scale: its ravel/unravel concat buffers tried to allocate 23 GB
# (f32[44946042, 2] split output) on the 16 GB v5e — the per-op overhead
# it would save is a tunneled-backend artifact anyway (see STATUS.md
# "Environment gotchas"), while the OOM is real hardware.
tx_tree = trainer.optimizer_factory(trainer.optimizer_factory.base_lr)
params = variables["params"]
grads = jax.tree_util.tree_map(jnp.ones_like, params)
opt_state = jax.jit(tx_tree.init)(params)
sync(opt_state)


def update(g, s, p):
    upd, ns = tx_tree.update(g, s, p)
    return optax.apply_updates(p, upd), ns


percall("optimizer: AdamW (param tree)", jax.jit(update),
        grads, opt_state, params)

print("done", flush=True)
