"""Benchmark: flagship-model inference latency (default) or train step.

Prints ONE JSON line, e.g.:
    {"metric": "inference_ms_per_frame", "value": ..., "unit": "ms",
     "vs_baseline": ..., "baseline_source": "..."}

vs_baseline compares against the reference PyTorch implementation's
ESTIMATED per-frame GPU latency: the reference measures latency at eval
time but publishes no number (SURVEY.md section 6 / BASELINE.md); the DPFT
paper (arXiv:2404.03015) reports about 90 ms/frame on the authors' CUDA
GPU setup, which we adopt as the baseline estimate and label as such in
the output. The rebuild target is >= 3x that throughput.

Env vars: BENCH_BATCH (default 4), BENCH_DTYPE (e.g. 'bfloat16'),
BENCH_REPS, BENCH_WARMUP, BENCH_MODE ('inference' | 'train'). Train mode
reports the full train-step time (forward + Hungarian set loss + backward
+ AdamW + per-step metrics) plus an achieved-FLOPs estimate from XLA cost
analysis and the MFU fraction against the chip's bf16 peak.
"""

import json
import os
import time

import numpy as np

REFERENCE_MS_PER_FRAME = 90.0  # estimate; see module docstring
BASELINE_SOURCE = "paper arXiv:2404.03015 ~90 ms/frame (estimate)"
# Per-chip peak for MFU accounting (TPU v5e: ~197 TFLOP/s bf16; f32 runs
# on the same MXU via passes so the bf16 peak is the honest denominator).
PEAK_FLOPS_BF16 = 197e12


def _flagship(batch_size, compute_dtype):
    import jax

    from __graft_entry__ import _example_batch, _example_targets
    from dpft_tpu.models import build
    from dpft_tpu.utils.config import load_config

    config = load_config("config/kradar.json")
    if compute_dtype:
        config["computing"]["compute_dtype"] = compute_dtype
    model = build(config["model"]["name"], config)
    # Production input shapes: camera resized to shorter side 512
    # (1280x720 -> 512x910), radar planes at raster resolution.
    batch = _example_batch(config, B=batch_size, cam_hw=(512, 910),
                           bev_hw=(256, 107), front_hw=(37, 107))
    targets = _example_targets(config, B=batch_size)
    # Host-CPU init: eager flax init pays one remote compile (~19 s) per op
    # on the tunneled TPU backend; see utils.misc.init_on_host.
    from dpft_tpu.utils.misc import host_prng_key, init_on_host
    variables = init_on_host(model.init, host_prng_key(0), batch,
                             train=False)
    return config, model, batch, targets, variables


def bench_inference(batch_size, repetitions, warmup, compute_dtype):
    import jax

    _, model, batch, _, variables = _flagship(batch_size, compute_dtype)

    # The reference latency benchmark times one batch drawn from the test
    # loader, which batches at config['train']['batch_size'] = 4
    # (reference evaluator.py:96-135, loader.py:40, config/kradar.json:34),
    # so batch 4 is the protocol-matched default; per-frame = batch / 4.
    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
    # One explicit H2D: _example_batch returns host numpy; the timed loop
    # must run against a device-resident batch (reference protocol times
    # compute, not transfers).
    batch = jax.device_put(batch)
    for _ in range(warmup):
        jax.block_until_ready(fwd(variables, batch))

    timings = np.zeros(repetitions)
    for i in range(repetitions):
        start = time.perf_counter()
        jax.block_until_ready(fwd(variables, batch))
        timings[i] = (time.perf_counter() - start) * 1e3

    # Median, not mean: the tunneled single-chip backend occasionally
    # stalls for hundreds of ms on individual dispatches, which would
    # otherwise dominate a 100-rep mean.
    ms_per_frame = float(np.median(timings)) / batch_size
    return {
        "metric": "inference_ms_per_frame",
        "value": round(ms_per_frame, 3),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_MS_PER_FRAME / ms_per_frame, 3),
        "baseline_source": BASELINE_SOURCE,
        "batch": batch_size,
        "dtype": compute_dtype or "float32",
        "mean_ms_per_frame": round(float(np.mean(timings)) / batch_size, 3),
    }


def bench_train(batch_size, repetitions, warmup, compute_dtype):
    import jax
    import jax.numpy as jnp

    from dpft_tpu.parallel import create_mesh
    from dpft_tpu.training.trainer import CentralizedTrainer
    from dpft_tpu.utils.profiling import \
        enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    config, model, batch, targets, variables = _flagship(
        batch_size, compute_dtype)

    trainer = CentralizedTrainer.from_config(config)
    tx = trainer.optimizer_factory(trainer.optimizer_factory.base_lr)
    mesh = create_mesh(data=1)
    state = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }
    train_step, _ = trainer._make_steps(model, tx, mesh)
    state = train_step.place_state(state)
    jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
    jtargets = jax.tree_util.tree_map(jnp.asarray, targets)
    rng = jax.random.PRNGKey(1)

    for _ in range(max(warmup, 2)):
        state, total, _, _ = train_step(state, jbatch, jtargets, rng)
    jax.block_until_ready(total)

    t0 = time.perf_counter()
    for _ in range(repetitions):
        state, total, _, _ = train_step(state, jbatch, jtargets, rng)
    jax.block_until_ready(total)
    sec_per_step = (time.perf_counter() - t0) / repetitions

    # FLOPs of the fwd+bwd+update program from XLA cost analysis (the
    # matcher program's cost is negligible and loop-dependent). Gated
    # behind BENCH_FLOPS=1: re-tracing the grad program just to count
    # FLOPs takes minutes at flagship shapes.
    from dpft_tpu.training.loss import Loss  # noqa: F401 (doc pointer)
    flops = 0.0
    try:
        if os.environ.get("BENCH_FLOPS", "0") != "1":
            raise RuntimeError("skipped (set BENCH_FLOPS=1 to measure)")
        loss_fn = trainer.loss_fn

        def grad_step(params, b, t, idx):
            def compute(p):
                out, _ = model.apply(
                    {"params": p, "batch_stats": state["batch_stats"]},
                    b, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                total, _ = loss_fn(out, t, indices=idx)
                return total
            return jax.grad(compute)(params)

        fwd_eval = jax.jit(lambda v, b: model.apply(v, b, train=False))
        idx = jax.jit(loss_fn.match)(
            fwd_eval({"params": state["params"],
                      "batch_stats": state["batch_stats"]}, jbatch),
            jtargets)
        # cost_analysis straight from the lowering: no second multi-minute
        # backend compile of the grad program just to count FLOPs.
        cost = jax.jit(grad_step).lower(
            state["params"], jbatch, jtargets, idx).cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception as e:
        import sys
        print(f"flops probe unavailable: {e}", file=sys.stderr)

    achieved = flops / sec_per_step if flops else 0.0
    return {
        "metric": "train_sec_per_step",
        "value": round(sec_per_step, 4),
        "unit": "s",
        "vs_baseline": round((REFERENCE_MS_PER_FRAME / 1e3 * batch_size)
                             / sec_per_step, 3),
        "baseline_source": (BASELINE_SOURCE
                            + "; train baseline unpublished, inference "
                            "estimate used as floor"),
        "batch": batch_size,
        "dtype": compute_dtype or "float32",
        "frames_per_sec": round(batch_size / sec_per_step, 2),
        "grad_step_flops": flops,
        "achieved_tflops": round(achieved / 1e12, 3),
        "mfu_vs_bf16_peak": round(achieved / PEAK_FLOPS_BF16, 5),
    }


def _require_device(timeout_s: float) -> None:
    """Fails fast (clear JSON on stdout, exit 1) when backend init hangs.

    The tunneled TPU runtime blocks indefinitely inside jax.devices()
    when the tunnel is down; a bounded probe in a daemon thread turns
    that into a diagnosable failure instead of a silent driver hang.
    """
    import threading

    found = []

    def probe():
        import jax
        found.append([str(d) for d in jax.devices()])

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not found:
        print(json.dumps({
            "metric": "inference_ms_per_frame", "value": None,
            "unit": "ms", "vs_baseline": None,
            "error": f"device backend did not initialize within "
                     f"{timeout_s:.0f}s (TPU tunnel down?)"}))
        raise SystemExit(1)


def main():
    _require_device(float(os.environ.get("BENCH_INIT_TIMEOUT", "300")))
    # Persistent on-disk compile cache for BOTH modes: the remote TPU
    # compiler slowed ~20x after a libtpu upgrade (2026-08-19), so a cold
    # flagship-forward compile alone can exceed a bench budget; warm runs
    # serve it from disk.
    from dpft_tpu.utils.profiling import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    batch_size = int(os.environ.get("BENCH_BATCH", "4"))
    repetitions = int(os.environ.get("BENCH_REPS", "100"))
    warmup = int(os.environ.get("BENCH_WARMUP", "10"))
    compute_dtype = os.environ.get("BENCH_DTYPE", "")  # e.g. 'bfloat16'
    mode = os.environ.get("BENCH_MODE", "inference")

    if mode == "train":
        repetitions = int(os.environ.get("BENCH_REPS", "20"))
        result = bench_train(batch_size, repetitions, warmup, compute_dtype)
    else:
        result = bench_inference(batch_size, repetitions, warmup,
                                 compute_dtype)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
