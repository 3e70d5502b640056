"""Validates the latency-measurement protocol on the tunneled TPU backend.

The recorded flagship numbers imply >peak utilization (inference: 683
GFLOP/batch in 1.2 ms = 554 TFLOP/s on an f32 program; v5e bf16 peak is
~197 TFLOP/s), so either XLA's cost-analysis FLOPs overcount by ~an order
of magnitude or `block_until_ready` under-measures on this backend. This
probe discriminates with compute whose FLOPs are beyond dispute:

  1. A chained 8192^2 matmul program (4 matmuls = 4.40 TFLOP f32 per call,
     definitionally; >=45 ms/call at the f32 peak, >=22 ms at bf16 peak).
     Timed per-call with block_until_ready AND with a forced scalar
     readback (device_get of a sum) — if the readback barrier reports much
     larger times than block_until_ready, readiness is being signalled
     before the compute actually finished and every block-timed number
     must be re-based on the readback protocol.
  2. Tunnel round-trip floor: readback of a trivial program's scalar.
  3. The flagship inference forward timed (a) on one repeated batch and
     (b) cycling 4 pre-staged different batches — distinguishes genuine
     compute latency from any same-input result caching/pipelining.

Run on the real TPU: python scripts/probe_timing_integrity.py
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dpft_tpu.utils.profiling import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def _scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(leaf) for leaf in leaves)


def per_call(name, fn, *argsets, reps=10, readback=False):
    # warmup on every distinct argset
    for args in argsets:
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for i in range(reps):
        args = argsets[i % len(argsets)]
        t0 = time.perf_counter()
        out = fn(*args)
        if readback:
            # The sum's bytes must exist on the host: cannot be signalled
            # early without actually finishing the compute.
            float(jax.device_get(_scalarize(out)))
        else:
            jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)
    med = float(np.median(times))
    print(f"{name:52s} med {med:9.2f} ms  "
          f"(min {min(times):8.2f}, max {max(times):8.2f})", flush=True)
    return med


def pipelined(name, fn, *argsets, reps=30):
    """Enqueue all reps without intermediate blocking, one readback at the
    end: dispatch overlaps execution, so this measures device throughput
    (the device runs programs serially; distinct argsets defeat any
    same-input result caching in the tunnel runtime)."""
    for args in argsets:
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*argsets[i % len(argsets)])
    float(jax.device_get(_scalarize(out)))
    med = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:52s} avg {med:9.2f} ms/call", flush=True)
    return med


# ---- 2. tunnel round-trip floor
one = jnp.ones((8, 128), jnp.float32)
triv = jax.jit(lambda x: x + 1.0)
per_call("trivial add, block_until_ready", triv, (one,))
per_call("trivial add, scalar readback", triv, (one,), readback=True)

# ---- 1. known-FLOPs matmul chain: 4 x (8192 @ 8192) = 4.40 TFLOP f32
A = jnp.asarray(np.random.default_rng(0).normal(
    size=(8192, 8192)).astype(np.float32))


@jax.jit
def chain(a):
    x = a
    for _ in range(4):
        x = x @ a
        x = x / jnp.float32(90.0)  # keep magnitudes finite
    return x


t_block = per_call("matmul chain 4.40 TFLOP f32, block", chain, (A,))
t_read = per_call("matmul chain 4.40 TFLOP f32, readback", chain, (A,),
                  readback=True)
print(f"implied TFLOP/s: block {4.40e3 / t_block:8.1f}   "
      f"readback {4.40e3 / t_read:8.1f}   (f32 peak ~98, bf16 peak ~197)",
      flush=True)

Ab = A.astype(jnp.bfloat16)


@jax.jit
def chain_bf16(a):
    x = a
    for _ in range(4):
        x = (x @ a) / jnp.bfloat16(90.0)
    return x


t_bf = per_call("matmul chain 4.40 TFLOP bf16, readback", chain_bf16,
                (Ab,), readback=True)
print(f"implied bf16 TFLOP/s: {4.40e3 / t_bf:8.1f}", flush=True)

# ---- 3. flagship forward: repeated batch vs distinct batches, per-call
# vs pipelined. Distinguishes true device throughput from per-call
# dispatch overhead AND from any same-input result caching.
from bench import _flagship  # noqa: E402

config, model, batch, targets, variables = _flagship(4, "")
fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
base = jax.device_put(batch)
batches = []
rng = np.random.default_rng(1)
for k in range(6):
    b = {key: (val + rng.normal(scale=0.01, size=val.shape)
               .astype(np.float32)) if val.dtype == np.float32 else val
         for key, val in batch.items()}
    batches.append((variables, jax.device_put(b)))
per_call("flagship fwd B=4, SAME batch, block", fwd, (variables, base),
         reps=30)
per_call("flagship fwd B=4, SAME batch, readback", fwd, (variables, base),
         reps=30, readback=True)
per_call("flagship fwd B=4, 6 DISTINCT batches, readback", fwd, *batches,
         reps=30, readback=True)
pipelined("flagship fwd B=4, SAME batch, pipelined", fwd,
          (variables, base))
pipelined("flagship fwd B=4, 6 DISTINCT batches, pipelined", fwd, *batches)
print("done", flush=True)
