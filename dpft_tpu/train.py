"""CLI: model training.

Parity: reference src/dprt/train.py:14-71 - builds train/val datasets and
loaders, builds (or restores) the model, snapshots the config next to the
logs, and runs the trainer. Resuming from a checkpoint recovers the epoch
and timestamp from the checkpoint name (reference train.py:47-48).
"""

import argparse
import datetime
import os.path as osp

from dpft_tpu.data import init as init_dataset
from dpft_tpu.data import load as load_dataset
from dpft_tpu.models import build as build_model
from dpft_tpu.models import registry as model_registry
from dpft_tpu.training import train as train_model
from dpft_tpu.utils.config import load_config, save_config
from dpft_tpu.utils.misc import set_seed


def _agreed_timestamp() -> str:
    """One run timestamp for ALL hosts.

    Each process's clock differs by microseconds, but the checkpoint path
    derives from the timestamp and the orbax save is a collective over
    ONE path — diverging timestamps would fork the run directory per host
    and stall the save barriers. Process 0's timestamp is broadcast
    (fixed-width, uint8-encoded) when running multi-host.
    """
    import jax

    timestamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S-%f")[:-3]
    if jax.process_count() > 1:
        import numpy as np
        from jax.experimental import multihost_utils
        arr = np.frombuffer(timestamp.encode().ljust(32), np.uint8)
        arr = np.asarray(multihost_utils.broadcast_one_to_all(arr))
        timestamp = bytes(arr).decode().strip()
    return timestamp


def main(src: str, cfg: str, dst: str, checkpoint: str = None) -> None:
    epoch = 0

    config = load_config(cfg)

    # Multi-host (DCN) data parallelism: no-op unless computing.multi_host.
    from dpft_tpu.parallel import maybe_initialize_distributed
    maybe_initialize_distributed(config)

    timestamp = _agreed_timestamp()

    rng = set_seed(config["computing"]["seed"])

    train_dataset = init_dataset(config["dataset"], src=src, split="train",
                                 config=config)
    # Multi-host: each process iterates its own (lockstep-even) shard of
    # the dataset; the per-host batches are assembled into the global
    # array by the trainer (parallel.make_global_batch). Identity when
    # single-process.
    from dpft_tpu.parallel import shard_dataset_for_process
    train_dataset = shard_dataset_for_process(train_dataset)
    # drop_last keeps the global batch constant (one jit signature, clean
    # sharding over the mesh 'data' axis); kept off only when the dataset
    # is smaller than one batch so tiny fixtures still train.
    batch_size = config.get("train", {}).get("batch_size", 1)
    train_loader = load_dataset(
        train_dataset, config=config,
        drop_last=len(train_dataset) >= batch_size)
    val_dataset = init_dataset(config["dataset"], src=src, split="val",
                               config=config)
    val_dataset = shard_dataset_for_process(val_dataset)
    # pad_last: short final val batch is padded with a sample_mask; the
    # loss/metric weight the padded rows out.
    val_loader = load_dataset(val_dataset, config=config, shuffle=False,
                              pad_last=True)

    variables = None
    if checkpoint is not None:
        model, variables, epoch, timestamp = model_registry.load(checkpoint)
        epoch += 1  # resume from the epoch after the checkpointed one
    else:
        model = build_model(config["model"]["name"], config)

    # The run directory is shared by all hosts (the orbax checkpoint save
    # is a collective over one path); only process 0 writes the snapshot.
    import jax
    if jax.process_index() == 0:
        save_config(config, osp.join(dst, timestamp, "config.json"))

    trainer = train_model(config)
    trainer(model, train_loader, val_loader, start_epoch=epoch,
            timestamp=timestamp, dst=dst, variables=variables, rng=rng)


if __name__ == "__main__":
    parser = argparse.ArgumentParser("DPFT training")
    parser.add_argument("--src", type=str, default="/data/kradar/processed",
                        help="Path to the processed dataset folder.")
    parser.add_argument("--cfg", type=str, default="config/kradar.json",
                        help="Path to the configuration file.")
    parser.add_argument("--dst", type=str, default="log",
                        help="Path to save the training log.")
    parser.add_argument("--checkpoint", type=str,
                        help="Checkpoint to resume training from.")
    args = parser.parse_args()
    main(src=args.src, cfg=args.cfg, dst=args.dst, checkpoint=args.checkpoint)
