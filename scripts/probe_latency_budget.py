"""Inference latency decomposition at the deployment point (VERDICT r4 #3).

Decomposes the flagship forward (default B=1 bf16, the round-4 headline
9.73 ms/frame cell) into per-component readback-fenced medians:

  - each input's frontend (backbone -> skiplink -> FPN -> sinusoidal),
  - the fusion decoder (4 iterations incl. per-iteration heads),
  - a single-iteration decoder (to expose the per-iteration cost),
  - the whole forward (per-call and pipelined), in the same session.

Plus the two numbers that close the "is the ~10% MFU a tunnel floor or
real headroom?" question:

  - MEASURED per-executed-op charge of the tunneled runtime (a chain of
    optimization_barrier'd adds, slope between two lengths - not the
    40-120 us folklore range, today's actual value), and
  - executed-op counts of every compiled program (top-level instructions
    in the ENTRY computation of the optimized HLO: one fusion = one
    executed thunk; parameters/constants excluded),

giving floor_ms = ops * per_op_ms per program to compare against its
measured time. Appends one JSON object to LATENCY_BUDGET_r05.json.

Usage:  python scripts/probe_latency_budget.py [out.json]
Env:    PROBE_BATCH (default 1), PROBE_DTYPE (default bfloat16),
        PROBE_REPS/PROBE_RUNS for the medians protocol.
"""

import json
import os
import re
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def entry_op_count(compiled) -> int:
    """Top-level executed instructions in the ENTRY computation."""
    text = compiled.as_text()
    in_entry = False
    count = 0
    for line in text.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                break
            m = re.match(r"\s+(ROOT\s+)?\S+ = \S*\s*(\w+)\(", line)
            if m and m.group(2) not in ("parameter", "constant"):
                count += 1
    return count


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from dpft_tpu.models import build
    from dpft_tpu.models.backbones import build_backbone
    from dpft_tpu.models.embeddings import build_embedding
    from dpft_tpu.models.fusers import build_fuser
    from dpft_tpu.models.heads import build_head
    from dpft_tpu.models.necks import build_neck
    from dpft_tpu.utils.config import load_config
    from dpft_tpu.utils.misc import host_prng_key, init_on_host
    from dpft_tpu.utils.profiling import (
        benchmark_medians, benchmark_pipelined,
        enable_persistent_compilation_cache, readback_rtt_ms)

    enable_persistent_compilation_cache()

    B = int(os.environ.get("PROBE_BATCH", "1"))
    dtype = os.environ.get("PROBE_DTYPE", "bfloat16")
    reps = int(os.environ.get("PROBE_REPS", "20"))
    runs = int(os.environ.get("PROBE_RUNS", "5"))
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "LATENCY_BUDGET_r05.json")

    config = load_config(os.path.join(ROOT, "config/kradar.json"))
    if dtype:
        config["computing"]["compute_dtype"] = dtype
    cam_hw, bev_hw, front_hw = (512, 910), (256, 107), (37, 107)
    if os.environ.get("PROBE_SMOKE"):  # CPU smoke test: tiny everything
        jax.config.update("jax_platforms", "cpu")
        cam_hw, bev_hw, front_hw = (64, 96), (32, 16), (16, 16)
        for v in config["model"]["backbones"].values():
            v["name"] = "ResNet18"
        for v in config["model"]["necks"].values():
            v["in_channels_list"] = [v["in_channels_list"][0],
                                     64, 128, 256, 512]
        config["model"]["fuser"]["n_queries"] = 16
        config["model"]["querent"]["resolution"] = [4, 4, 1]
    model = build(config["model"]["name"], config)
    batch = _example_batch(config, B=B, cam_hw=cam_hw, bev_hw=bev_hw,
                           front_hw=front_hw)
    variables = init_on_host(model.init, host_prng_key(0), batch,
                             train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    result = {"batch": B, "dtype": dtype or "float32",
              "protocol": f"median-of-medians, {runs} runs x {reps} reps, "
                          "readback-fenced, rtt-subtracted",
              "components": {}}

    # ------------------------------------------------------------------
    # Measured per-executed-op charge of the tunneled runtime.
    # ------------------------------------------------------------------
    # A chain of tiny matmuls: XLA never merges two dots into one fusion,
    # so each is its own executed thunk (verified via entry_op_count on
    # the compiled text below; optimization_barrier'd adds do NOT work -
    # the barrier is dropped and the adds fuse to one kLoop).
    def chain(n):
        def f(x):
            for _ in range(n):
                x = x @ x
            return x
        return jax.jit(f)

    x0 = jax.device_put(jnp.full((8, 8), 0.99, jnp.float32))
    short_n, long_n = 20, 220
    short_c = chain(short_n)
    long_c = chain(long_n)
    ops_short = entry_op_count(short_c.lower(x0).compile())
    ops_long = entry_op_count(long_c.lower(x0).compile())
    t_short, e_short = benchmark_medians(short_c, x0, repetitions=reps,
                                         runs=runs)
    t_long, e_long = benchmark_medians(long_c, x0, repetitions=reps,
                                       runs=runs)
    per_op_ms = max((t_long - t_short) / max(ops_long - ops_short, 1), 0.0)
    result["per_op_charge"] = {
        "ms_per_executed_op": round(per_op_ms, 4),
        "chain_ops": [ops_short, ops_long],
        "chain_ms": [round(t_short, 3), round(t_long, 3)],
        "chain_err_ms": [round(e_short, 3), round(e_long, 3)],
    }
    print("per-op charge:", json.dumps(result["per_op_charge"]),
          flush=True)

    computing = config["computing"]
    model_cfg = config["model"]

    def merged(sub):
        return dict(computing | sub)

    # ------------------------------------------------------------------
    # Frontends: backbone -> skiplink -> neck -> embedding per input.
    # ------------------------------------------------------------------
    feats_by_input = {}
    for name in model_cfg["inputs"]:
        bb = build_backbone(model_cfg["backbones"][name]["name"],
                            merged(model_cfg["backbones"][name]))
        nk = build_neck(model_cfg["necks"][name]["name"],
                        merged(model_cfg["necks"][name]))
        em = build_embedding(model_cfg["embeddings"][name]["name"],
                             merged(model_cfg["embeddings"][name]))
        bvars = {"params": params[f"backbones_{name}"]}
        if f"backbones_{name}" in stats:
            bvars["batch_stats"] = stats[f"backbones_{name}"]
        nvars = {"params": params[f"necks_{name}"]}

        def frontend(bv, nv, x, _bb=bb, _nk=nk, _em=em):
            feats = _bb.apply(bv, x, False)
            feats = {"0": x, **feats}  # skiplink
            feats = _nk.apply(nv, feats)
            return _em.apply({}, feats)

        jf = jax.jit(frontend)
        xs = jax.device_put(jnp.asarray(batch[name]))
        compiled = jf.lower(bvars, nvars, xs).compile()
        med, err = benchmark_medians(jf, bvars, nvars, xs,
                                     repetitions=reps, runs=runs)
        ops = entry_op_count(compiled)
        result["components"][f"frontend_{name}"] = {
            "ms": round(med, 3), "err_ms": round(err, 3), "ops": ops,
            "floor_ms": round(ops * per_op_ms, 3)}
        print(f"frontend_{name}:",
              json.dumps(result["components"][f"frontend_{name}"]),
              flush=True)
        feats_by_input[name] = jax.device_put(jf(bvars, nvars, xs))

    # ------------------------------------------------------------------
    # Decoder: querent + IMPFusion (+ per-iteration heads), 4 and 1 iter.
    # ------------------------------------------------------------------
    head = build_head(model_cfg["head"]["name"], merged(model_cfg["head"]))
    fuser4 = build_fuser(model_cfg["fuser"]["name"],
                         merged(model_cfg["fuser"]), head=head)
    from dpft_tpu.models.queries import build_querent
    querent = build_querent(model_cfg["querent"]["name"],
                            merged(model_cfg["querent"]))
    out0 = querent.apply({"params": params.get("querent", {})}, B)
    feats_list = [feats_by_input[n] for n in model_cfg["inputs"]]
    shapes = [jnp.asarray(batch[f"{n}_shape"][:, :2], jnp.float32)
              for n in model_cfg["inputs"]]
    projections = [(jnp.asarray(batch[f"label_to_{n}_t"]),
                    jnp.asarray(batch[f"label_to_{n}_p"]))
                   for n in model_cfg["inputs"]]
    fvars = {"params": params["fuser"]}

    def run_fuser(fu):
        def f(fv, feats, shp, proj, o0):
            return fu.apply(fv, batch=feats, shape=shp, projection=proj,
                            out=o0, deterministic=True)
        return jax.jit(f)

    jd4 = run_fuser(fuser4)
    compiled4 = jd4.lower(fvars, feats_list, shapes, projections,
                          out0).compile()
    med4, err4 = benchmark_medians(jd4, fvars, feats_list, shapes,
                                   projections, out0,
                                   repetitions=reps, runs=runs)
    ops4 = entry_op_count(compiled4)
    result["components"]["decoder_4iter"] = {
        "ms": round(med4, 3), "err_ms": round(err4, 3), "ops": ops4,
        "floor_ms": round(ops4 * per_op_ms, 3)}
    print("decoder_4iter:",
          json.dumps(result["components"]["decoder_4iter"]), flush=True)

    one_cfg = dict(model_cfg["fuser"], i_iter=1)
    fuser1 = build_fuser(one_cfg["name"], merged(one_cfg), head=head)
    f1params = {k: params["fuser"][k]
                for k in ("query", "query_embedding", "fusion0", "head0")}
    jd1 = run_fuser(fuser1)
    med1, err1 = benchmark_medians(jd1, {"params": f1params}, feats_list,
                                   shapes, projections, out0,
                                   repetitions=reps, runs=runs)
    ops1 = entry_op_count(jd1.lower({"params": f1params}, feats_list,
                                    shapes, projections, out0).compile())
    result["components"]["decoder_1iter"] = {
        "ms": round(med1, 3), "err_ms": round(err1, 3), "ops": ops1,
        "floor_ms": round(ops1 * per_op_ms, 3)}
    print("decoder_1iter:",
          json.dumps(result["components"]["decoder_1iter"]), flush=True)

    # ------------------------------------------------------------------
    # Whole forward, same session: per-call medians + pipelined.
    # ------------------------------------------------------------------
    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
    jb = jax.device_put({k: jnp.asarray(v) for k, v in batch.items()})
    compiled_f = fwd.lower(variables, jb).compile()
    ops_f = entry_op_count(compiled_f)
    medf, errf = benchmark_medians(fwd, variables, jb, repetitions=reps,
                                   runs=runs)
    rng = np.random.default_rng(1)
    argsets = []
    for _ in range(4):
        b2 = {k: (v + rng.normal(scale=0.01, size=v.shape).astype(v.dtype))
              if np.issubdtype(v.dtype, np.floating) else v
              for k, v in batch.items()}
        argsets.append((variables, jax.device_put(b2)))
    pipelined = benchmark_pipelined(fwd, argsets, repetitions=40, warmup=6)
    result["whole_forward"] = {
        "per_call_ms": round(medf, 3), "err_ms": round(errf, 3),
        "pipelined_ms": round(pipelined, 3), "ops": ops_f,
        "floor_ms": round(ops_f * per_op_ms, 3),
        "readback_rtt_ms": round(readback_rtt_ms(jb["camera_mono"]), 3),
    }
    comp_sum = sum(v["ms"] for k, v in result["components"].items()
                   if k != "decoder_1iter")
    result["component_sum_ms"] = round(comp_sum, 3)
    print(json.dumps(result), flush=True)

    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
