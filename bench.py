"""Benchmark: flagship-model inference latency per chip.

Prints ONE JSON line:
    {"metric": "inference_ms_per_frame", "value": ..., "unit": "ms",
     "vs_baseline": ...}

vs_baseline compares against the reference PyTorch implementation's
estimated per-frame GPU latency. The reference measures latency at eval
time but publishes no number (SURVEY.md section 6 / BASELINE.md); the DPFT
paper (arXiv:2404.03015) reports the model runs at about 90 ms/frame on the
authors' CUDA GPU setup, which we adopt as the baseline estimate. The
rebuild target is >= 3x that throughput (vs_baseline >= 3.0).

Run on the available accelerator (single chip). Batch size and compute
dtype can be overridden via env vars BENCH_BATCH / BENCH_DTYPE.
"""

import json
import os
import time

import numpy as np

REFERENCE_MS_PER_FRAME = 90.0  # documented estimate, see module docstring


def main():
    import jax

    from __graft_entry__ import _example_batch
    from dpft_tpu.models import build
    from dpft_tpu.utils.config import load_config

    # The reference latency benchmark times one batch drawn from the test
    # loader, which batches at config['train']['batch_size'] = 4
    # (reference evaluator.py:96-135, loader.py:40, config/kradar.json:34),
    # so batch 4 is the protocol-matched default; per-frame = batch / 4.
    batch_size = int(os.environ.get("BENCH_BATCH", "4"))
    repetitions = int(os.environ.get("BENCH_REPS", "100"))
    warmup = int(os.environ.get("BENCH_WARMUP", "10"))
    compute_dtype = os.environ.get("BENCH_DTYPE", "")  # e.g. 'bfloat16'

    config = load_config("config/kradar.json")
    if compute_dtype:
        config["computing"]["compute_dtype"] = compute_dtype
    model = build(config["model"]["name"], config)
    # Production input shapes: camera resized to shorter side 512
    # (1280x720 -> 512x910), radar planes at raster resolution.
    batch = _example_batch(config, B=batch_size, cam_hw=(512, 910),
                           bev_hw=(256, 107), front_hw=(37, 107))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
    for _ in range(warmup):
        jax.block_until_ready(fwd(variables, batch))

    timings = np.zeros(repetitions)
    for i in range(repetitions):
        start = time.perf_counter()
        jax.block_until_ready(fwd(variables, batch))
        timings[i] = (time.perf_counter() - start) * 1e3

    ms_per_frame = float(np.mean(timings)) / batch_size
    print(json.dumps({
        "metric": "inference_ms_per_frame",
        "value": round(ms_per_frame, 3),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_MS_PER_FRAME / ms_per_frame, 3),
    }))


if __name__ == "__main__":
    main()
