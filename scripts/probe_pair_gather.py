"""Probe: fetch bilinear x-neighbour PAIRS with one (1,2,2)-slice gather.

Follow-up to probe_patch_gather.py (2x4 patch gather: 12x slower — the
2-row slice breaks contiguity AND the corner selection there used
take_along_axis, i.e. 8 more gathers). Here: per y-row one gather whose
slice covers the two x-neighbours (contiguous in the flattened (Len, D)
value: 4 bf16 elements), corners picked with jnp.where selects.
"""
import sys
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

def _pair(val, flat_start):
    """gather (2, D) slices at flat_start (already clipped to Len-2)."""
    BHl, Len, Dl = val.shape
    Sl = flat_start.shape[1]
    dn = lax.GatherDimensionNumbers(
        offset_dims=(2, 3), collapsed_slice_dims=(),
        start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    pair = lax.gather(val, flat_start[..., None], dn,
                      slice_sizes=(1, 2, Dl))
    return pair.reshape(BHl, Sl, 2, Dl)

def v_pair(val, x, y):
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    lx = x - x0; ly = y - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    xs = jnp.clip(x0i, 0, W - 2)
    ox = x0i - xs                      # {-1, 0, 1}
    out = jnp.zeros(x.shape + (D,), val.dtype)
    for dy in (0, 1):
        yi = y0i + dy
        yrow = jnp.clip(yi, 0, H - 1)
        pair = _pair(val, yrow * W + xs)      # (BH, S, 2, D)
        wy = ly if dy else (1.0 - ly)
        for dx in (0, 1):
            xi = x0i + dx
            inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            wgt = (lx if dx else (1.0 - lx)) * wy
            pos1 = (ox + dx) == 1            # else position 0 (or masked)
            g = jnp.where(pos1[..., None], pair[:, :, 1], pair[:, :, 0])
            out = out + g * (wgt * inside)[..., None]
    return out

got4 = np.asarray(v_4gather(val, x, y), np.float32)
gotp = np.asarray(v_pair(val, x, y), np.float32)
err = np.abs(got4 - gotp).max()
print("max abs diff:", err)
assert err == 0.0, err

f4 = jax.jit(v_4gather)
fp = jax.jit(v_pair)
g4 = jax.jit(lambda v, x, y: jax.grad(
    lambda v: v_4gather(v.astype(jnp.bfloat16), x, y).astype(jnp.float32).sum())(v))
gp = jax.jit(lambda v, x, y: jax.grad(
    lambda v: v_pair(v.astype(jnp.bfloat16), x, y).astype(jnp.float32).sum())(v))
valf = val.astype(jnp.float32)
# grad parity
e = np.abs(np.asarray(g4(valf, x, y) - gp(valf, x, y), np.float32)).max()
print("grad max diff:", e)

for name, fn, args in (("fwd 4gather", f4, (val, x, y)),
                       ("fwd pair  ", fp, (val, x, y)),
                       ("bwd 4gather", g4, (valf, x, y)),
                       ("bwd pair  ", gp, (valf, x, y))):
    m, s = benchmark(fn, *args, repetitions=40, warmup=4)
    print(f"{name}: {m:.3f} ms +- {s:.3f}")
