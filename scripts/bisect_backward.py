"""Bisects the slow flagship backward (STATUS.md anomaly) by component.

scripts/probe_backward.py discriminates environment drift at the
whole-model level (model fwd+bwd with a dummy loss); this script breaks
that 455 ms program apart to find WHICH component's backward the current
remote runtime executes slowly:

  - each backbone alone (camera ResNet101 @ 512x910, radar ResNet50s)
  - train mode (BatchNorm batch stats) vs eval mode
  - grads wrt params vs grads wrt the input (separates the conv
    filter-gradient path from the data-gradient path)
  - a bare stem-conv microbench at camera resolution

Run on the real TPU: python scripts/bisect_backward.py  [BISECT_DTYPE=...]
Compiles go through the persistent cache (utils/profiling.py).
"""
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dpft_tpu.models.backbones import build_backbone
from dpft_tpu.utils.config import load_config
from dpft_tpu.utils.misc import host_prng_key, init_on_host
from dpft_tpu.utils.profiling import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

B = int(os.environ.get("BENCH_BATCH", "4"))
DTYPE = os.environ.get("BISECT_DTYPE", "")
config = load_config("config/kradar.json")
if DTYPE:
    config["computing"]["compute_dtype"] = DTYPE
computing = config["computing"]

SHAPES = {
    "camera_mono": (B, 512, 910, 3),
    "radar_bev": (B, 256, 107, 6),
    "radar_front": (B, 37, 107, 6),
}


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter() - t0) / reps * 1e3:9.2f} ms",
          flush=True)


rng = np.random.default_rng(0)
for view in SHAPES:
    cfg = dict(computing | config["model"]["backbones"][view])
    cfg.pop("weights", None)  # random init is fine for timing
    bb = build_backbone(cfg.pop("name"), cfg)
    x = jnp.asarray(rng.normal(size=SHAPES[view]).astype(np.float32))
    variables = init_on_host(bb.init, host_prng_key(0), x, False)
    params, bstats = variables["params"], variables["batch_stats"]

    def fwd_train(p, bs, x):
        out, upd = bb.apply({"params": p, "batch_stats": bs}, x, True,
                            mutable=["batch_stats"])
        return sum(jnp.sum(v) for v in out.values())

    def fwd_eval(p, bs, x):
        out = bb.apply({"params": p, "batch_stats": bs}, x, False)
        return sum(jnp.sum(v) for v in out.values())

    timeit(f"{view} fwd (train)", jax.jit(fwd_train), params, bstats, x)
    timeit(f"{view} bwd wrt params (train)",
           jax.jit(jax.grad(fwd_train)), params, bstats, x)
    if view == "camera_mono":
        timeit(f"{view} bwd wrt params (eval)",
               jax.jit(jax.grad(fwd_eval)), params, bstats, x)
        timeit(f"{view} bwd wrt INPUT (train)",
               jax.jit(jax.grad(fwd_train, argnums=2)), params, bstats, x)

# Bare conv microbenches at camera resolution: stem 7x7/2 and a 3x3.
x = jnp.asarray(rng.normal(size=(B, 512, 910, 3)).astype(np.float32))
w7 = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.01)
x3 = jnp.asarray(rng.normal(size=(B, 128, 228, 256)).astype(np.float32))
w3 = jnp.asarray(rng.normal(size=(3, 3, 256, 64)).astype(np.float32) * 0.01)


def conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


timeit("stem conv 7x7/2 fwd", jax.jit(lambda x, w: jnp.sum(conv(x, w, 2))),
       x, w7)
timeit("stem conv 7x7/2 wgrad",
       jax.jit(jax.grad(lambda w, x: jnp.sum(conv(x, w, 2)))), w7, x)
timeit("mid conv 3x3 wgrad",
       jax.jit(jax.grad(lambda w, x: jnp.sum(conv(x, w, 1)))), w3, x3)
timeit("stem conv 7x7/2 dgrad",
       jax.jit(jax.grad(lambda x, w: jnp.sum(conv(x, w, 2)))), x, w7)
print("done", flush=True)
