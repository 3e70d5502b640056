"""Optimized-HLO op/byte census of the flagship forward (locality probe).

Compiles the B=1 (PROBE_BATCH) flagship forward on the current backend,
dumps the optimized HLO, and reports:

  - opcode counts over the whole module and over the ENTRY computation
    (one top-level instruction = one executed thunk),
  - per-opcode SUMMED OUTPUT-BUFFER BYTES over the entry computation
    (the locality metric: what HBM has to absorb, modulo S(1) buffers
    the scheduler keeps in alternate memory),
  - the largest single outputs with their producing instructions.

This is the probe that found the round-5 locality fixes (in-graph
sinusoidal tables ~30 MB f32/level/call; f32-promoted MSDA sampling
chains): entry bytes 4113 MB -> 3036 MB across the two fixes.

Usage: python scripts/probe_hlo_census.py [dump.hlo]
Env:   PROBE_BATCH (default 1), PROBE_DTYPE (default bfloat16).
"""
import collections
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "s64": 8}


def shape_bytes(s: str) -> int:
    total = 0
    for dt, dims in re.findall(
            r"(bf16|f32|f16|s32|u32|s8|u8|pred|s64)\[([\d,]*)\]", s):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def main():
    import jax

    import bench
    from dpft_tpu.utils.profiling import \
        enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    B = int(os.environ.get("PROBE_BATCH", "1"))
    dtype = os.environ.get("PROBE_DTYPE", "bfloat16")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fwd_census.hlo"

    _, model, batch, _, variables = bench._flagship(B, dtype)
    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
    txt = fwd.lower(variables, batch).compile().as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print("HLO chars:", len(txt), "->", out_path)

    ops = collections.Counter()
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = [^ ]+ ([a-z\-]+)\(", line)
        if m:
            ops[m.group(1)] += 1
    print("module opcodes:", ops.most_common(15))

    m = re.search(r"^ENTRY [^{]+\{(.*?)^\}", txt, re.S | re.M)
    lines = m.group(1).strip().splitlines()
    cnt = collections.Counter()
    bts = collections.Counter()
    big = []
    for ln in lines:
        mm = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = ([^ ]+) ([a-z\-]+)\(", ln)
        if not mm:
            continue
        shape, op = mm.groups()
        if op == "fusion":
            k = re.search(r"kind=(\w+)", ln)
            op = "fusion:" + (k.group(1) if k else "?")
        b = shape_bytes(shape)
        cnt[op] += 1
        bts[op] += b
        big.append((b, op, ln.strip()[:120]))
    print("entry instructions:", len(lines))
    for o, c in cnt.most_common(20):
        print(f"  {o:18s} {c:5d}  out_bytes={bts[o] / 1e6:9.1f} MB")
    print("entry total out MB:", round(sum(bts.values()) / 1e6, 1))
    big.sort(reverse=True)
    print("largest outputs:")
    for b, o, ln in big[:20]:
        print(f"  {b / 1e6:8.1f} MB {o:14s} {ln}")


if __name__ == "__main__":
    main()
