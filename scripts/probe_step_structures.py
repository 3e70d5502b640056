"""Round-4 A/B: train-step structures at flagship B=4 (readback-fenced).

The round-3 budget charges the recompute step an ~86 ms duplicate forward
(hoisted-matcher mode re-runs the forward inside the grad program,
trainer.py). Two structures could eliminate it; both were blocked by facts
that round 3 changed:

  A. recompute (production baseline): fwd -> matcher program -> grad
     program (re-runs fwd) -> opt -> metric.
  B. monolith: the warm-started matcher EMBEDDED in the one fused step
     program (loss_fn(..., indices=None) path). The old 1000x-slower-
     while-loop measurement predates the LAPJV row-reduction warm start,
     which leaves ~0-5 of 64 rows actually augmenting — re-measure.
  C. forward_once + backbone remat: jax.vjp residuals cross the matcher
     boundary; computing.remat shrinks the stash 16.5 -> 6.4 GB at
     flagship B=4 (eval_shape), which now fits a 16 GB v5e.
  D. recompute + backbone remat (control: what does remat alone cost?).

Each structure is timed as the full trainer step (with per-step metric)
with chained states and one tail readback per run, repeated-runs protocol
(median of run medians +- half spread, utils/profiling.benchmark_medians
rationale).

Run on the real TPU:  python scripts/probe_step_structures.py
Env: PROBE_DTYPE (default f32; 'bfloat16'), PROBE_REPS, PROBE_RUNS,
PROBE_ONLY (comma list of A,B,C,D).
"""
import os
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
                                      sync)

enable_persistent_compilation_cache()
B = int(os.environ.get("PROBE_BATCH", "4"))
DTYPE = os.environ.get("PROBE_DTYPE", "")
REPS = int(os.environ.get("PROBE_REPS", "10"))
RUNS = int(os.environ.get("PROBE_RUNS", "3"))
ONLY = set(os.environ.get("PROBE_ONLY", "A,B,C,D").split(","))

config, model, batch, targets, variables = _flagship(B, DTYPE)
jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
jtargets = jax.tree_util.tree_map(jnp.asarray, targets)
rng = jax.random.PRNGKey(1)


def build_model(remat):
    from dpft_tpu.models import build
    cfg = dict(config)
    cfg["computing"] = dict(config["computing"], remat=bool(remat))
    return build(cfg["model"]["name"], cfg), cfg


def run_structure(label, cfg, mdl):
    trainer = CentralizedTrainer.from_config(cfg)
    tx = trainer.optimizer_factory(trainer.optimizer_factory.base_lr)
    train_fn, _ = trainer._make_steps(mdl, tx, create_mesh(data=1))
    medians = []
    try:
        for _ in range(RUNS):
            fresh = jax.tree_util.tree_map(jnp.copy, variables)
            st = train_fn.place_state({
                "params": fresh["params"],
                "batch_stats": fresh["batch_stats"],
                "opt_state": tx.init(fresh["params"]),
                "step": jnp.zeros((), jnp.int32)})
            for _ in range(2):
                st, tt, _, _ = train_fn(st, jbatch, jtargets, rng)
            sync(tt)
            t0 = time.perf_counter()
            for _ in range(REPS):
                st, tt, _, _ = train_fn(st, jbatch, jtargets, rng)
            sync(tt)
            medians.append((time.perf_counter() - t0) / REPS * 1e3)
            del st, fresh
    except Exception as e:
        print(f"{label:44s} FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return
    m = np.asarray(medians)
    print(f"{label:44s} {float(np.median(m)):9.2f} ms "
          f"+- {float((m.max() - m.min()) / 2):.2f}  (runs: "
          + ", ".join(f"{x:.1f}" for x in m) + ")", flush=True)


if "A" in ONLY:
    cfg = dict(config)
    run_structure("A recompute (production)", cfg, model)

if "B" in ONLY:
    # Monolith: Loss.use_assigner stays True but the trainer must NOT
    # hoist — drive the underlying train_step directly with indices=None
    # by disabling split_matching via a config knob the trainer reads.
    cfg = dict(config)
    cfg["train"] = dict(config["train"], hoist_matcher=False)
    run_structure("B monolith (embedded warm-start matcher)", cfg, model)

if "C" in ONLY:
    mdl, cfg = build_model(remat=True)
    cfg["train"] = dict(cfg["train"], forward_once=True)
    run_structure("C forward_once + backbone remat", cfg, mdl)

if "D" in ONLY:
    mdl, cfg = build_model(remat=True)
    run_structure("D recompute + backbone remat", cfg, mdl)

print("done", flush=True)
