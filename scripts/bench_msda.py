"""Head-to-head: fused-Pallas MSDA kernel vs the pure-XLA gather core.

Captures the EXACT per-view sampling-core shapes of the flagship model at
train batch (B=4 default) by shape-tracing one forward, then times, on the
current backend (run on the real TPU):

  - core forward, per view shape, both backends
  - core forward+backward (grads wrt value/locations/weights), both

Prints one line per measurement plus a JSON summary. The winner is wired
via config `fuser.pallas_msda` (models/fusers/mpfusion.py) and the
decision recorded in STATUS.md. Compiles go through the persistent cache.

Usage: python scripts/bench_msda.py   [BENCH_BATCH=4] [BENCH_REPS=50]
"""
import functools
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dpft_tpu.utils.profiling import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

B = int(os.environ.get("BENCH_BATCH", "4"))
REPS = int(os.environ.get("BENCH_REPS", "50"))

# ---- Capture the flagship per-view core shapes with a shape-only trace.
from bench import _flagship  # noqa: E402
from dpft_tpu.ops import deform_attn  # noqa: E402

captured = []
_real_core = deform_attn.ms_deform_attn_core


def _recording_core(value, spatial_shapes, loc, att):
    captured.append({
        "value": tuple(value.shape),
        "spatial_shapes": tuple(spatial_shapes),
        "loc": tuple(loc.shape),
        "att": tuple(att.shape),
    })
    return _real_core(value, spatial_shapes, loc, att)


config, model, batch, targets, variables = _flagship(B, "")
deform_attn.ms_deform_attn_core = _recording_core
# Shape-only trace: records every core call without executing anything.
import dpft_tpu.models.layers.ms_deform_attn as msda_layer
msda_layer.ms_deform_attn_core = _recording_core
jax.eval_shape(lambda v, b: model.apply(v, b, train=False), variables, batch)
deform_attn.ms_deform_attn_core = _real_core
msda_layer.ms_deform_attn_core = _real_core

# One entry per distinct shape (the decoder repeats views x iterations).
unique = {}
for c in captured:
    unique.setdefault(json.dumps(c, sort_keys=True), c)
shapes = list(unique.values())
counts = {json.dumps(c, sort_keys=True): 0 for c in shapes}
for c in captured:
    counts[json.dumps(c, sort_keys=True)] += 1
print(f"{len(captured)} core calls per forward, {len(shapes)} distinct "
      f"shapes", flush=True)


def timeit(fn, *args, reps=REPS):
    """Readback-fenced (utils/profiling.sync): block_until_ready is not
    trustworthy on the tunneled backend. Calls are independent but execute
    serially on the one device, so one tail fence bounds all reps; NOTE
    same-input reps — cross-checked per-call in probe_timing_integrity."""
    from dpft_tpu.utils.profiling import sync
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


from dpft_tpu.ops.deform_attn import ms_deform_attn_core  # noqa: E402
from dpft_tpu.ops.pallas.deform_attn import \
    ms_deform_attn_pallas  # noqa: E402

results = []
rng = np.random.default_rng(0)
for c in shapes:
    ss = tuple(tuple(s) for s in c["spatial_shapes"])
    value = jnp.asarray(rng.normal(size=c["value"]).astype(np.float32))
    loc = jnp.asarray(rng.uniform(0, 1, size=c["loc"]).astype(np.float32))
    att = jnp.asarray(rng.uniform(size=c["att"]).astype(np.float32))
    att = att / att.sum(axis=(-2, -1), keepdims=True)
    entry = {"value_shape": c["value"], "levels": ss,
             "calls_per_forward": counts[json.dumps(c, sort_keys=True)]}

    xla_fwd = jax.jit(functools.partial(ms_deform_attn_core,
                                        spatial_shapes=ss))
    entry["xla_fwd_ms"] = timeit(
        lambda v, l, a: xla_fwd(v, sampling_locations=l,
                                attention_weights=a), value, loc, att)

    def loss_x(v, l, a):
        return jnp.sum(ms_deform_attn_core(v, ss, l, a) ** 2)

    xla_bwd = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
    entry["xla_fwdbwd_ms"] = timeit(xla_bwd, value, loc, att)

    try:
        pl_fwd = jax.jit(lambda v, l, a: ms_deform_attn_pallas(
            v, ss, l, a, False))
        entry["pallas_fwd_ms"] = timeit(pl_fwd, value, loc, att)

        def loss_p(v, l, a):
            return jnp.sum(ms_deform_attn_pallas(v, ss, l, a, False) ** 2)

        pl_bwd = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))
        entry["pallas_fwdbwd_ms"] = timeit(pl_bwd, value, loc, att)

        # Numerical check on-device as well.
        got = np.asarray(pl_fwd(value, loc, att))
        want = np.asarray(xla_fwd(value, sampling_locations=loc,
                                  attention_weights=att))
        entry["max_abs_err"] = float(np.abs(got - want).max())
    except Exception as e:  # Mosaic lowering may reject the gather
        entry["pallas_error"] = f"{type(e).__name__}: {e}"[:500]

    results.append(entry)
    print(json.dumps(entry), flush=True)

total = {"backend": jax.default_backend(), "batch": B, "reps": REPS,
         "per_forward_xla_ms": sum(r["xla_fwd_ms"] * r["calls_per_forward"]
                                   for r in results),
         "per_forward_pallas_ms": sum(
             r.get("pallas_fwd_ms", float("nan")) * r["calls_per_forward"]
             for r in results),
         "per_step_xla_fwdbwd_ms": sum(
             r["xla_fwdbwd_ms"] * r["calls_per_forward"] for r in results),
         "per_step_pallas_fwdbwd_ms": sum(
             r.get("pallas_fwdbwd_ms", float("nan"))
             * r["calls_per_forward"] for r in results)}
print(json.dumps(total), flush=True)
