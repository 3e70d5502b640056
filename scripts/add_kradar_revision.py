"""Copies refined (revision) label files into the raw dataset tree.

Parity: reference scripts/add_kradar_revision.py:6-26 - places the refined
labels (e.g. KRadar_refined_label_by_UWIPL) under
<dst>/<seq>/info_label_<revision>/ so the processor picks them up.
"""

import argparse
import os
import shutil


def main(src: str, dst: str, revision: str = "v2") -> None:
    for seq in os.listdir(src):
        target = os.path.join(dst, seq, f"info_label_{revision}")
        os.makedirs(target, exist_ok=True)
        for filename in os.listdir(os.path.join(src, seq)):
            shutil.copy2(os.path.join(src, seq, filename),
                         os.path.join(target, filename))


if __name__ == "__main__":
    parser = argparse.ArgumentParser("DPFT label revision import")
    parser.add_argument("--src", type=str, required=True,
                        help="Path to the refined label folder.")
    parser.add_argument("--dst", type=str, required=True,
                        help="Path to the raw dataset folder.")
    parser.add_argument("--revision", type=str, default="v2")
    args = parser.parse_args()
    main(src=args.src, dst=args.dst, revision=args.revision)
