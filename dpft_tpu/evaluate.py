"""CLI: model evaluation on the test split.

Parity: reference src/dprt/evaluate.py:10-46.
"""

import argparse

from dpft_tpu.data import init as init_dataset
from dpft_tpu.data import load as load_dataset
from dpft_tpu.evaluation import evaluate as build_evaluator
from dpft_tpu.utils.config import load_config
from dpft_tpu.utils.misc import set_seed


def main(src: str, cfg: str, checkpoint: str, dst: str) -> None:
    config = load_config(cfg)
    set_seed(config["computing"]["seed"])

    test_dataset = init_dataset(config["dataset"], src=src, split="test",
                                config=config)
    # pad_last: a short final batch is padded to batch_size with a
    # sample_mask so every batch has one jit signature and shards over the
    # mesh 'data' axis; metric/exporter ignore the padded rows.
    test_loader = load_dataset(test_dataset, config=config, shuffle=False,
                               pad_last=True)

    evaluator = build_evaluator(config)
    results = evaluator(checkpoint, test_loader, dst)
    # Delta vs reference (which only logs to TensorBoard): print the final
    # metrics so the CLI is usable without a writer attached.
    print(" ".join(f"{k}={float(v):.6g}" for k, v in results.items()))


if __name__ == "__main__":
    parser = argparse.ArgumentParser("DPFT evaluation")
    parser.add_argument("--src", type=str, default="/data/kradar/processed",
                        help="Path to the processed dataset folder.")
    parser.add_argument("--cfg", type=str, default="config/kradar.json",
                        help="Path to the configuration file.")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Path to the model checkpoint to evaluate.")
    parser.add_argument("--dst", type=str, default="log",
                        help="Path to save the evaluation log.")
    args = parser.parse_args()
    main(src=args.src, cfg=args.cfg, checkpoint=args.checkpoint,
         dst=args.dst)
