"""Probe: per-row cost of widening gather slices (bilinear patch fetch).

The MSDA gather path fetches the 4 bilinear neighbours with 4 separate
row gathers (ops/deform_attn.py:_sample_level_gather). Since the two
x-neighbours are contiguous in the flattened value row, and rows y0/y1
are adjacent, the same data is one (2, 2*D) patch per sample. If XLA's
TPU gather charges per ROW (operand- and width-independent, see the
round-3 probes), a patch gather should cut the fixed cost ~4x.

Shapes: the flagship camera raw level under MSDA: value (BH=8, 465920, 2)
bf16, S = N*P = 1600 sample rows.
"""
import sys, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from dpft_tpu.utils.profiling import benchmark, enable_persistent_compilation_cache

enable_persistent_compilation_cache()

H, W, D = 512, 910, 2
BH, S = 8, 1600
rng = np.random.default_rng(0)
val = jnp.asarray(rng.normal(size=(BH, H * W, D)).astype(np.float32)).astype(jnp.bfloat16)
x = jnp.asarray(rng.uniform(-1, W, (BH, S)).astype(np.float32))
y = jnp.asarray(rng.uniform(-1, H, (BH, S)).astype(np.float32))

def v_4gather(val, x, y):
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    lx = x - x0; ly = y - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    out = jnp.zeros(x.shape + (D,), val.dtype)
    for dy, dx in ((0,0),(0,1),(1,0),(1,1)):
        xi = x0i + dx; yi = y0i + dy
        wgt = (lx if dx else (1.0-lx)) * (ly if dy else (1.0-ly))
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        flat = jnp.clip(yi, 0, H-1) * W + jnp.clip(xi, 0, W-1)
        g = jnp.take_along_axis(val, flat[..., None], axis=1)
        out = out + g * (wgt * inside)[..., None]
    return out

def v_patch(val, x, y):
    # one gather of a (2, 2*D) patch from (BH, H, W*D); window clamping
    # compensated by the start offset trick.
    v3 = val.reshape(BH, H, W * D)
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    lx = x - x0; ly = y - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    ys = jnp.clip(y0i, 0, H - 2)
    xs = jnp.clip(x0i, 0, W - 2)
    oy = y0i - ys          # in {-inf..}: really {<=0? no}: y0i<0 -> negative
    ox = x0i - xs
    idx = jnp.stack([ys, xs * D], axis=-1)              # (BH, S, 2)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2), operand_batching_dims=(),
        start_indices_batching_dims=())
    b = jnp.broadcast_to(jnp.arange(BH, dtype=jnp.int32)[:, None, None],
                         (BH, S, 1))
    gidx = jnp.concatenate([b, idx], axis=-1)           # (BH, S, 3)
    patch = lax.gather(v3, gidx, dn, slice_sizes=(1, 2, 2 * D))
    patch = patch.reshape(BH, S, 2, 2, D)               # (.., dy, dx, D)
    out = jnp.zeros(x.shape + (D,), val.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0i + dx; yi = y0i + dy
            inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            wgt = (lx if dx else (1.0-lx)) * (ly if dy else (1.0-ly))
            # patch position of this corner after start clamping
            py = yi - ys    # dy - (ys - y0i)
            px = xi - xs
            sel = patch[:, :, :, :, :]
            # select via one-hot over the 2x2 patch (py, px in {0,1} when
            # inside; clamp for the masked-out cases)
            py = jnp.clip(py, 0, 1); px = jnp.clip(px, 0, 1)
            g = jnp.take_along_axis(
                jnp.take_along_axis(
                    sel, py[..., None, None, None], axis=2),
                px[..., None, None, None], axis=3)[:, :, 0, 0, :]
            out = out + g * (wgt * inside)[..., None]
    return out

# parity first (f32 check on small case)
got4 = np.asarray(v_4gather(val, x, y), np.float32)
gotp = np.asarray(v_patch(val, x, y), np.float32)
err = np.abs(got4 - gotp).max()
print("max abs diff:", err)
assert err < 1e-2, err

f4 = jax.jit(v_4gather)
fp = jax.jit(v_patch)
g4 = jax.jit(lambda v, x, y: jax.grad(
    lambda v: v_4gather(v.astype(jnp.bfloat16), x, y).astype(jnp.float32).sum())(v))
gp = jax.jit(lambda v, x, y: jax.grad(
    lambda v: v_patch(v.astype(jnp.bfloat16), x, y).astype(jnp.float32).sum())(v))
valf = val.astype(jnp.float32)

for name, fn, args in (("fwd 4gather", f4, (val, x, y)),
                       ("fwd patch", fp, (val, x, y)),
                       ("bwd 4gather", g4, (valf, x, y)),
                       ("bwd patch", gp, (valf, x, y))):
    m, s = benchmark(fn, *args, repetitions=30, warmup=3)
    print(f"{name}: {m:.3f} ms +- {s:.3f}")
