"""Subprocess worker for the two-process multi-host trainer test.

Each process runs the SAME tiny training job over its host-local shard of
a deterministic synthetic dataset. The global batch is assembled across
processes by the trainer (dpft_tpu.parallel.make_global_batch); gradient
all-reduce rides the (Gloo-backed, on a TPU pod: ICI/DCN) collectives
GSPMD inserts. The final parameters are written to an .npz so the parent
test can assert both processes agree with a single-process baseline.

Usage: python tests/multihost_worker.py <process_id> <port> <out.npz>
"""

import os
import sys


def main(process_id: int, port: int, out_path: str) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from dpft_tpu.parallel import (maybe_initialize_distributed,
                                   shard_dataset_for_process)
    ran = maybe_initialize_distributed({"computing": {
        "multi_host": True,
        "coordinator_address": f"127.0.0.1:{port}",
        "num_processes": 2,
        "process_id": process_id,
    }})
    assert ran and jax.process_count() == 2 and jax.device_count() == 4

    import numpy as np

    from dpft_tpu.data.loader import DataLoader

    model, loss, dataset = build_job()
    sharded = shard_dataset_for_process(dataset)
    assert len(sharded) == 4  # 8 samples round-robin over 2 hosts
    loader = DataLoader(sharded, batch_size=2, shuffle=False)

    # Lockstep-even sharding of an ODD dataset: the short host gets a
    # wrap-around duplicate flagged real_mask=False, and a pad_last
    # loader weights it out via sample_mask.
    odd = shard_dataset_for_process(_Slice(dataset, 7))
    assert len(odd) == 4
    assert odd.real_mask.sum() == (4 if process_id == 0 else 3)
    val_loader = DataLoader(odd, batch_size=2, shuffle=False,
                            pad_last=True)
    masks = [t["sample_mask"] for _, t in val_loader]
    assert sum(int(m.sum()) for m in masks) == (4 if process_id == 0
                                                else 3)

    # All hosts must agree on the run timestamp (checkpoint paths are a
    # collective contract).
    from dpft_tpu.train import _agreed_timestamp
    timestamp = _agreed_timestamp()

    from dpft_tpu.training.optimizer import build_optimizer
    from dpft_tpu.training.trainer import CentralizedTrainer

    dst = os.path.join(os.path.dirname(out_path), "log")
    trainer = CentralizedTrainer(
        epochs=2, optimizer=build_optimizer("SGD", lr=0.05), loss=loss,
        scheduler=lambda epoch: 1.0, metric=None, config={})
    result = trainer.train(model, loader, val_loader=val_loader,
                           timestamp=timestamp, dst=dst,
                           rng=jax.random.PRNGKey(0))
    ckpt = os.path.join(dst, timestamp, "checkpoints",
                        f"{timestamp}_checkpoint_0001")
    assert os.path.isdir(ckpt), ckpt

    params = result["variables"]["params"]
    flat = {"/".join(map(str, path)): np.asarray(leaf)
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    flat["history"] = np.asarray(result["history"])
    flat["timestamp"] = np.frombuffer(timestamp.encode().ljust(32),
                                      np.uint8).copy()
    np.savez(out_path, **flat)


class _Slice:
    """First-n view of a map-style dataset."""

    def __init__(self, dataset, n):
        self.dataset, self.n = dataset, n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        assert i < self.n
        return self.dataset[i]


def build_job():
    """The shared job definition: a Dense toy model, a plain (no-assigner)
    L1 loss, and 8 deterministic synthetic samples."""
    import numpy as np
    from flax import linen as nn

    from dpft_tpu.training.loss import Loss

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, batch, train=False):
            return {"center": nn.Dense(3, use_bias=False)(batch["x"])}

    class SyntheticDataset:
        def __init__(self, n=8):
            rng = np.random.default_rng(7)
            self.samples = [
                ({"x": rng.normal(size=(5, 3)).astype(np.float32)},
                 {"gt_center": rng.normal(size=(5, 3)).astype(np.float32),
                  "gt_mask": np.ones((5,), bool)})
                for _ in range(n)
            ]

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            return self.samples[i]

    loss = Loss(loss_weights={"center": 1.0}, use_assigner=False,
                losses={"center": "L1Loss"},
                loss_inputs={"center": ["center"]})
    return Toy(), loss, SyntheticDataset()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
