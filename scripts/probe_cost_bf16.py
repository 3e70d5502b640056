"""bf16 matcher cost-matrix A/B: time + assignment equality vs f32.

The matcher program is ~100% cost-matrix build (round-3
probe_matcher_split.py: ~25.7 ms of the matcher's ~26 ms at flagship
B=4), dominated by exact GIoU polygon clipping over 400x64 yaw-box pairs
per sample (training/assigner.py -> ops/iou.py). Matching is rank-based:
the Hungarian solve only needs cost ORDER to be preserved well enough
that the argmin assignment is unchanged, so a bf16 cost build is sound
iff the resulting assignments match f32 in practice.

This probe measures, at flagship shapes on the real TPU:
  1. cost-build time f32 vs bf16 (inputs cast to bf16, clipping in bf16,
     result cast back to f32 for the solver);
  2. assignment agreement between the two cost matrices over many random
     prediction/target draws (trained-net-like: predictions clustered
     near targets, the regime where costs are closest).

Run: python scripts/probe_cost_bf16.py   (PROBE_REPS, PROBE_DRAWS env)
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
from dpft_tpu.training import assigner as assigner_lib
from dpft_tpu.training.trainer import CentralizedTrainer
from dpft_tpu.utils.profiling import (benchmark_medians,
                                      enable_persistent_compilation_cache)

enable_persistent_compilation_cache()
B = 4
REPS = int(os.environ.get("PROBE_REPS", "10"))
DRAWS = int(os.environ.get("PROBE_DRAWS", "32"))

config, model, batch, targets, variables = _flagship(B, "")
trainer = CentralizedTrainer.from_config(config)
loss_fn = trainer.loss_fn
jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
jtargets = jax.tree_util.tree_map(jnp.asarray, targets)
rng = jax.random.PRNGKey(1)

out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, jbatch)
tgt = {k: v for k, v in jtargets.items() if k != "sample_mask"}


def cost_build(out, tgt, dtype):
    def per_sample(o, t):
        sg = jax.lax.stop_gradient
        o, t = sg(o), sg(t)
        if dtype is not None:
            o = jax.tree_util.tree_map(
                lambda x: x.astype(dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, o)
            t = jax.tree_util.tree_map(
                lambda x: x.astype(dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        c = assigner_lib.cost_matrix(o, t, loss_fn.loss_weights,
                                     loss_fn.giou_weight)
        return c.astype(jnp.float32)
    return jax.vmap(per_sample)(out, tgt)


f32_fn = jax.jit(lambda o, t: cost_build(o, t, None))
bf16_fn = jax.jit(lambda o, t: cost_build(o, t, jnp.bfloat16))

m, s = benchmark_medians(f32_fn, out, tgt, repetitions=REPS, runs=3)
print(f"cost build f32 : {m:8.2f} ms +- {s:.2f}", flush=True)
m, s = benchmark_medians(bf16_fn, out, tgt, repetitions=REPS, runs=3)
print(f"cost build bf16: {m:8.2f} ms +- {s:.2f}", flush=True)

# Full matcher (cost + solve) in both dtypes.
for name, cfn in (("matcher f32 (cost+solve)", f32_fn),
                  ("matcher bf16 (cost+solve)", bf16_fn)):
    fn = jax.jit(lambda o, t, _c=cfn: jax.vmap(
        assigner_lib.hungarian_assign)(_c(o, t), t["gt_mask"]))
    m, s = benchmark_medians(fn, out, tgt, repetitions=REPS, runs=3)
    print(f"{name:27s}: {m:8.2f} ms +- {s:.2f}", flush=True)

# ---- assignment agreement over random trained-like draws (host CPU) ----
cpu = jax.devices("cpu")[0]
rngnp = np.random.default_rng(7)
N = out["class"].shape[1]
M = tgt["gt_mask"].shape[1]
C = out["class"].shape[-1]
diff_pairs = 0
tot_pairs = 0
diff_draws = 0
with jax.default_device(cpu):
    csolve = jax.jit(lambda c, msk: jax.vmap(
        assigner_lib.hungarian_assign)(c, msk))
    cf32 = jax.jit(lambda o, t: cost_build(o, t, None))
    cbf16 = jax.jit(lambda o, t: cost_build(o, t, jnp.bfloat16))
    for d in range(DRAWS):
        n_real = int(rngnp.integers(1, 12))
        gtc = np.zeros((1, M, C), np.float32)
        cls_ids = rngnp.integers(1, C, M)
        gtc[0, np.arange(M), cls_ids] = 1.0
        ang = rngnp.uniform(-np.pi, np.pi, (1, M))
        t = {
            "gt_class": gtc,
            "gt_center": rngnp.uniform(4, 70, (1, M, 3)).astype(np.float32),
            "gt_size": rngnp.uniform(0.5, 5, (1, M, 3)).astype(np.float32),
            "gt_angle": np.stack([np.sin(ang), np.cos(ang)],
                                 -1).astype(np.float32),
            "gt_mask": (np.arange(M)[None] < n_real),
        }
        # Predictions: queries clustered near the real targets (trained
        # regime) + background noise.
        ctr = np.tile(t["gt_center"], (1, (N + M - 1) // M, 1))[:, :N]
        o = {
            "class": rngnp.normal(0, 2, (1, N, C)).astype(np.float32),
            "center": (ctr + rngnp.normal(0, 1.0, (1, N, 3))
                       ).astype(np.float32),
            "size": rngnp.uniform(0.5, 5, (1, N, 3)).astype(np.float32),
            "angle": rngnp.normal(0, 1, (1, N, 2)).astype(np.float32),
        }
        o = {k: jnp.asarray(v) for k, v in o.items()}
        t = {k: jnp.asarray(v) for k, v in t.items()}
        ia, ja = csolve(cf32(o, t), t["gt_mask"])
        ib, jb_ = csolve(cbf16(o, t), t["gt_mask"])
        # Compare the real-target assignment as a set of (query, target)
        # pairs (order within the output is solver-defined).
        real = np.asarray(t["gt_mask"][0])
        pa = {(int(q), int(r)) for q, r in zip(np.asarray(ia[0]),
                                               np.asarray(ja[0]))
              if q < N and real[r]}
        pb = {(int(q), int(r)) for q, r in zip(np.asarray(ib[0]),
                                               np.asarray(jb_[0]))
              if q < N and real[r]}
        tot_pairs += len(pa)
        diff_pairs += len(pa.symmetric_difference(pb)) // 2
        diff_draws += int(pa != pb)
print(f"assignment agreement: {DRAWS - diff_draws}/{DRAWS} draws "
      f"identical; {diff_pairs}/{tot_pairs} pairs differ", flush=True)
print("done", flush=True)
