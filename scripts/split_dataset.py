"""Dataset split optimizer: NSGA-II balancing of class / scene distributions.

Parity: reference scripts/split_dataset.py:24-317 - assigns every sample to
a split (train/val) such that the per-split distributions of object
classes, road structures, time zones and weather conditions match the
global distribution, via multi-objective NSGA-II with an equality
constraint on the split shares. Uses the self-contained optimizer in
dpft_tpu.ops.nsga2 (no pymoo dependency).

Usage:
    python scripts/split_dataset.py --src <raw> --cfg config/kradar.json \
        --dst <out-dir>
"""

import argparse
import json
import os
import os.path as osp
import sys
from typing import Callable, Dict, List, Tuple

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from dpft_tpu.data import prepare  # noqa: E402
from dpft_tpu.ops.nsga2 import nsga2_minimize  # noqa: E402
from dpft_tpu.utils.config import load_config  # noqa: E402
from dpft_tpu.utils.misc import set_seed  # noqa: E402


def discrete_dist_diff(inputs: np.ndarray, targets: np.ndarray) -> float:
    """Total absolute deviation between two discrete distributions."""
    count = np.sum(inputs, axis=0)
    total = np.sum(count)
    if total == 0:
        return float(np.sum(np.abs(targets / np.sum(targets))))
    return float(np.sum(np.abs(targets / np.sum(targets) - count / total)))


def get_kradar_elements(src: str, preparator) -> Dict[str, Tuple[np.ndarray, ...]]:
    """Per-sample property histograms (classes, road, time, weather)."""
    dataset_paths = preparator.get_dataset_paths(src)

    elements = {}
    for sequence_paths in dataset_paths.values():
        for seq_id, sequence in sequence_paths.items():
            for sample in sequence:
                sample_id = osp.splitext(osp.basename(sample))[0]
                box = preparator.get_boxes(sample)

                n_cat = len(preparator.categories)
                categories = np.zeros((box.shape[0], n_cat), int)
                if box.shape[0]:
                    categories[np.arange(box.shape[0]),
                               box[:, 7].astype(int)] = 1

                seq_path = osp.split(osp.dirname(sample))[0]
                description = preparator.get_description(
                    osp.join(seq_path, "description.txt"))

                def one_hot(table, key):
                    v = np.zeros((1, max(table.values()) + 1), int)
                    v[0, table[key]] = 1
                    return v

                elements[f"{seq_id}_{sample_id}"] = tuple(
                    np.sum(p, axis=0) for p in (
                        categories,
                        one_hot(preparator.road_structures, description[0]),
                        one_hot(preparator.time_zone, description[1]),
                        one_hot(preparator.weather_conditions,
                                description[2]),
                    ))
    return elements


def optimize_splits(elements: List[Tuple[np.ndarray, ...]],
                    splits: List[float],
                    objectives: List[Callable],
                    seed: int = 42,
                    pop_size: int = 100,
                    n_gen: int = 1000) -> np.ndarray:
    """Optimal split assignment indices (N,) in [0, len(splits))."""
    props = tuple(np.vstack(p) for p in zip(*elements))  # O x (N, C)
    targets = tuple(np.sum(p, axis=0) for p in props)
    shares = np.asarray(splits)

    def evaluate(x: np.ndarray):
        F = [
            objective(props[i][x == n], targets[i])
            for i, objective in enumerate(objectives)
            for n in range(len(splits))
        ]
        counts = np.bincount(x, minlength=len(splits)).astype(float)
        cv = float(np.sum(np.abs(counts / counts.sum() - shares)))
        return np.asarray(F), cv

    X, F = nsga2_minimize(evaluate, n_var=len(elements), xl=0,
                          xu=len(splits) - 1, pop_size=pop_size,
                          n_gen=n_gen, seed=seed, verbose=True)
    best = np.argmin(F.sum(axis=1))
    return X[best]


def save(dst: str, split_names: List[str], keys: List[str],
         indices: np.ndarray) -> None:
    splits = {
        name: [keys[i] for i in np.where(indices == n)[0]]
        for n, name in enumerate(split_names)
    }
    # The optimization upstream can run for hours; never lose its result
    # to a missing destination directory.
    os.makedirs(dst, exist_ok=True)
    with open(osp.join(dst, "splits.json"), "w") as f:
        json.dump(splits, f, indent=4)


def main(src: str, cfg: str, dst: str, n_gen: int = 1000) -> None:
    config = load_config(cfg)
    set_seed(config["computing"]["seed"])

    preparator = prepare(config["dataset"], config)
    elements = get_kradar_elements(src, preparator)

    splits = {"train": 0.8, "val": 0.2}
    objectives = [discrete_dist_diff] * 4

    indices = optimize_splits(list(elements.values()),
                              list(splits.values()), objectives,
                              seed=config["computing"]["seed"], n_gen=n_gen)
    save(dst, list(splits.keys()), list(elements.keys()), indices)


if __name__ == "__main__":
    parser = argparse.ArgumentParser("DPFT dataset split optimization")
    parser.add_argument("--src", type=str, required=True,
                        help="Path to the raw dataset folder.")
    parser.add_argument("--cfg", type=str, default="config/kradar.json")
    parser.add_argument("--dst", type=str, default=".")
    parser.add_argument("--generations", type=int, default=1000)
    args = parser.parse_args()
    main(src=args.src, cfg=args.cfg, dst=args.dst, n_gen=args.generations)
