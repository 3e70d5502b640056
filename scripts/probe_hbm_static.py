"""Static HBM accounting of the train-step structures (VERDICT r4 #4).

Cross-checks the round-4 forward_once stash claims (16.5 GB residuals at
flagship B=4 f32, 6.4 GB under computing.remat — both measured
RESOURCE_EXHAUSTED at runtime) with the compiler's buffer accounting:
each structure's programs are LOWERED AND COMPILED but never executed,
and `memory_analysis` records argument/output/temp/code bytes per
program. The forward_once residual stash appears as the hoisted forward
program's OUTPUT bytes (the vjp residuals crossing the matcher
boundary). A structure whose compile itself dies with RESOURCE_EXHAUSTED
is recorded as such — that is the frontier datapoint.

Run on the real TPU:  python scripts/probe_hbm_static.py [out.json]
Env: PROBE_BATCH (default 4), PROBE_DTYPE (default '' = f32),
PROBE_ONLY (comma list of monolith,hoist,fwd_once,fwd_once_remat).
Writes HBM_STATIC_r05.json.
"""

import json
import os
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _flagship  # noqa: E402
from dpft_tpu.parallel import create_mesh  # noqa: E402
from dpft_tpu.training.trainer import CentralizedTrainer  # noqa: E402
from dpft_tpu.utils.profiling import (  # noqa: E402
    enable_persistent_compilation_cache, memory_analysis)

enable_persistent_compilation_cache()

B = int(os.environ.get("PROBE_BATCH", "4"))
DTYPE = os.environ.get("PROBE_DTYPE", "")
ONLY = set(os.environ.get(
    "PROBE_ONLY", "monolith,hoist,fwd_once,fwd_once_remat").split(","))

VARIANTS = {
    "monolith": {},
    "hoist": {"hoist_matcher": True},
    "fwd_once": {"forward_once": True},
    "fwd_once_remat": {"forward_once": True, "_remat": True},
}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else osp.join(
        ROOT, "HBM_STATIC_r05.json")
    config, _, batch, targets, variables = _flagship(B, DTYPE)
    jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
    jtargets = jax.tree_util.tree_map(jnp.asarray, targets)
    rng = jax.random.PRNGKey(1)

    results = {"batch": B, "dtype": DTYPE or "float32", "variants": {}}
    for name, opts in VARIANTS.items():
        if name not in ONLY:
            continue
        cfg = dict(config)
        cfg["train"] = dict(config["train"],
                            **{k: v for k, v in opts.items()
                               if not k.startswith("_")})
        cfg["computing"] = dict(config["computing"],
                                remat=bool(opts.get("_remat")))
        from dpft_tpu.models import build
        mdl = build(cfg["model"]["name"], cfg)
        trainer = CentralizedTrainer.from_config(cfg)
        tx = trainer.optimizer_factory(trainer.optimizer_factory.base_lr)
        train_fn, _ = trainer._make_steps(mdl, tx, create_mesh(data=1))
        state = train_fn.place_state({
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
            "opt_state": tx.init(variables["params"]),
            "step": jnp.zeros((), jnp.int32)})

        row = {}
        try:
            jits = train_fn.jitted
            # NOTHING below executes: the fwd_once forward's own execution
            # is the measured runtime OOM, so intermediate values flow as
            # ShapeDtypeStructs (jax.eval_shape) and only
            # lower().compile() runs per program.
            if name.startswith("fwd_once"):
                fwd = jits["forward"]
                row["forward"] = memory_analysis(
                    fwd.lower(state, jbatch, rng).compile())
                out_s, pullback_s, updates_s = jax.eval_shape(
                    fwd, state, jbatch, rng)
                idx_s = jax.eval_shape(jits["match"], out_s, jtargets)
                row["match"] = memory_analysis(
                    jits["match"].lower(out_s, jtargets).compile())
                # tail(state, pullback, out, targets, updates, indices)
                row["step"] = memory_analysis(
                    jits["step"].lower(state, pullback_s, out_s, jtargets,
                                       updates_s, idx_s).compile())
            elif "match" in jits:  # hoisted recompute
                row["forward"] = memory_analysis(
                    jits["forward"].lower(state, jbatch, rng).compile())
                out_s = jax.eval_shape(jits["forward"], state, jbatch, rng)
                idx_s = jax.eval_shape(jits["match"], out_s, jtargets)
                row["match"] = memory_analysis(
                    jits["match"].lower(out_s, jtargets).compile())
                row["step"] = memory_analysis(
                    jits["step"].lower(state, jbatch, jtargets, rng,
                                       idx_s).compile())
            else:
                row["step"] = memory_analysis(
                    jits["step"].lower(state, jbatch, jtargets,
                                       rng).compile())
            row["peak_total_gb"] = max(
                m.get("total_gb", 0.0) for m in row.values()
                if isinstance(m, dict))
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {e}"[:400]
        results["variants"][name] = row
        print(name, json.dumps(row), flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
