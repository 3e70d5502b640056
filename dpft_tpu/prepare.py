"""CLI: offline dataset preparation (raw K-Radar -> processed files).

Parity: reference src/dprt/prepare.py:8-37.
Usage: python -m dpft_tpu.prepare --src <raw> --cfg <config.json> --dst <out>
"""

import argparse

from dpft_tpu.data import prepare
from dpft_tpu.utils.config import load_config
from dpft_tpu.utils.misc import set_seed


def main(src: str, cfg: str, dst: str) -> None:
    config = load_config(cfg)
    set_seed(config["computing"]["seed"])
    preparator = prepare(config["dataset"], config)
    preparator.prepare(src, dst)


if __name__ == "__main__":
    parser = argparse.ArgumentParser("DPFT data preprocessing")
    parser.add_argument("--src", type=str, default="/data/kradar/raw",
                        help="Path to the raw dataset folder.")
    parser.add_argument("--cfg", type=str, default="config/kradar.json",
                        help="Path to the configuration file.")
    parser.add_argument("--dst", type=str, default="/data/kradar/processed",
                        help="Path to save the processed dataset.")
    args = parser.parse_args()
    main(src=args.src, cfg=args.cfg, dst=args.dst)
