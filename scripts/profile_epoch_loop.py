"""Times the REAL trainer epoch loop against the bare jitted step.

The bare step (BENCH_MODE=train bench.py) excludes everything the epoch
loop adds: host batch staging (H2D through the tunnel), scalar readback,
prefetch, and logging. Round 1 measured 1.47 s/step through the loop vs
0.53 s/step bare on the tunneled chip; `_prefetch_to_device` plus the
deferred scalar flush (trainer._FLUSH_EVERY) are the two fixes. This
script measures the loop as users run it: trainer.train() over an
in-memory dataset at flagship shapes for a few steps.

Usage: python scripts/profile_epoch_loop.py  (needs the TPU tunnel; the
compiles are shared with bench/profile_train_step via the persistent
cache).  Env: EPOCH_STEPS (default 12), EPOCH_BATCH (default 4),
EPOCH_DTYPE.
"""
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import numpy as np

from bench import _flagship
from dpft_tpu.training.trainer import CentralizedTrainer
from dpft_tpu.utils.profiling import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
B = int(os.environ.get("EPOCH_BATCH", "4"))
N_STEPS = int(os.environ.get("EPOCH_STEPS", "12"))
config, model, batch, targets, variables = _flagship(
    B, os.environ.get("EPOCH_DTYPE", ""))


class _ArrayLoader:
    """Fixed batches, fresh numpy each epoch (mimics a real host loader)."""

    def __init__(self, n_steps):
        self.n_steps = n_steps

    def __len__(self):
        return self.n_steps

    def __iter__(self):
        for _ in range(self.n_steps):
            yield ({k: np.array(v) for k, v in batch.items()},
                   {k: np.array(v) for k, v in targets.items()})


trainer = CentralizedTrainer.from_config(config)
trainer.epochs = 2  # epoch 0 warms up compiles; epoch 1 is timed
trainer.logging = None


class _TimedLoader(_ArrayLoader):
    def __iter__(self):
        self.t0 = time.perf_counter()
        return super().__iter__()


loader = _TimedLoader(N_STEPS)
t_start = time.perf_counter()
result = trainer.train(model, loader, variables=variables)
# The second epoch's duration: from its first batch pull to the train()
# return minus the (empty) checkpoint/val work — good to ~1 step.
epoch1_s = time.perf_counter() - loader.t0
print(f"epoch loop: {epoch1_s / N_STEPS * 1e3:9.2f} ms/step "
      f"({N_STEPS} steps, B={B}, warm epoch), total {epoch1_s:.2f} s")
print(f"loss history: {[round(h, 4) for h in result['history']]}")
