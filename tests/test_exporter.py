"""K-Radar exporter golden-format tests (exact line strings and tree)."""

import os.path as osp

import numpy as np

from dpft_tpu.evaluation.exporters.kradar import KRadarExporter


def make_batch():
    """One sample: one in-FoV Sedan prediction + one out-of-FoV, one gt."""
    outputs = {
        "class": np.array([[[0.1, 0.9], [0.2, 0.8], [0.9, 0.1]]], np.float32),
        "center": np.array([[[60.71, -4.27, 2.62],
                             [100.0, 0.0, 0.0],     # x > 72: filtered
                             [30.0, 0.0, 0.0]]], np.float32),  # class 0
        "size": np.array([[[12.11, 2.8, 3.7], [4, 2, 1.5], [4, 2, 1.5]]],
                         np.float32),
        "angle": np.array([[[np.sin(-0.02), np.cos(-0.02)],
                            [0.0, 1.0], [0.0, 1.0]]], np.float32),
    }
    targets = {
        "gt_class": np.array([[[0.0, 1.0], [1.0, 0.0]]], np.float32),
        "gt_center": np.array([[[20.0, 1.0, 0.5], [0, 0, 0]]], np.float32),
        "gt_size": np.array([[[4.0, 2.0, 1.6], [0, 0, 0]]], np.float32),
        "gt_angle": np.array([[[0.0, 1.0], [0, 0]]], np.float32),
        "gt_mask": np.array([[True, False]]),
        "description": np.array([[1, 0, 3]], np.float32),  # highway day rain
    }
    return outputs, targets


def test_export_tree_and_line_format(tmp_path):
    outputs, targets = make_batch()
    exporter = KRadarExporter(conf_thrs=[0.0, 0.5])
    exporter.export(outputs, targets, step=7, dst=str(tmp_path))

    root = osp.join(str(tmp_path), "exports", "kradar")
    # Subsets: 'all' + day + highway + rain.
    for subset in ("all", "day", "highway", "rain"):
        base = osp.join(root, "0.0", subset)
        for sub in ("preds", "gts", "desc"):
            assert osp.exists(osp.join(base, sub, "000007.txt")), (subset, sub)
        assert osp.exists(osp.join(base, "val.txt"))

    with open(osp.join(root, "0.0", "all", "preds", "000007.txt")) as f:
        lines = f.read().splitlines()
    # Only the in-FoV Sedan (class 1 -> category 0) survives; the x=100
    # prediction is outside the eval FoV and class-0 is 'ignore'.
    assert len(lines) == 1
    fields = lines[0].split()
    # name trunc occl alpha bbox*4 h w l y z x theta
    assert fields[0] == "sed"
    assert fields[1:8] == ["0", "0", "0", "50", "50", "150", "150"]
    assert fields[8:11] == ["3.7", "2.8", "12.11"]   # h w l
    assert fields[11:14] == ["-4.27", "2.62", "60.71"]  # y z x
    assert abs(float(fields[14]) + 0.02) < 1e-6

    with open(osp.join(root, "0.0", "all", "gts", "000007.txt")) as f:
        gt_lines = f.read().splitlines()
    assert len(gt_lines) == 1 and gt_lines[0].startswith("sed")

    with open(osp.join(root, "0.0", "all", "desc", "000007.txt")) as f:
        desc = f.read().split()
    assert desc == ["day", "highway", "rain"]

    # High threshold: the Sedan logit max is 0.9 >= 0.5 -> still present.
    with open(osp.join(root, "0.5", "all", "preds", "000007.txt")) as f:
        assert len(f.read().splitlines()) == 1


def test_export_dummy_when_empty(tmp_path):
    outputs, targets = make_batch()
    # Threshold above every confidence -> dummy placeholder line.
    exporter = KRadarExporter(conf_thrs=[99.0])
    exporter.export(outputs, targets, step=0, dst=str(tmp_path))
    with open(osp.join(str(tmp_path), "exports", "kradar", "99.0", "all",
                       "preds", "000000.txt")) as f:
        line = f.read().strip()
    assert line == "dummy -1 -1 0 0 0 0 0 0 0 0 0 0 0 0 0"


def test_export_batched_step_offsets(tmp_path):
    outputs, targets = make_batch()
    outputs2 = {k: np.concatenate([v, v]) for k, v in outputs.items()}
    targets2 = {k: np.concatenate([v, v]) for k, v in targets.items()}
    exporter = KRadarExporter(conf_thrs=[0.0])
    exporter.export(outputs2, targets2, step=10, dst=str(tmp_path))
    base = osp.join(str(tmp_path), "exports", "kradar", "0.0", "all")
    assert osp.exists(osp.join(base, "preds", "000010.txt"))
    assert osp.exists(osp.join(base, "preds", "000011.txt"))
    with open(osp.join(base, "val.txt")) as f:
        assert f.read().split() == ["000010", "000011"]
