"""Synthetic mini K-Radar raw-dataset fixture for ETL/data tests.

Fabricates a tiny raw tree in the reference's on-disk layout (label txt,
calib txt, stereo PNG, tesseract .mat, Ouster PCDs, description.txt) using
real sample ids from the frozen split tables so the processor's split
filtering engages. Shapes are scaled down (tesseract (8, 32, 6, 10)) - the
pipeline is shape-agnostic.
"""

import os
import os.path as osp

import numpy as np

# Real ids from the frozen splits (sequence 10).
TRAIN_IDS = ["00027_00001", "00028_00002"]
VAL_IDS = ["00039_00013"]
TEST_IDS = ["00309_00283"]
SEQ = "10"

TESSERACT_SHAPE = (8, 32, 6, 10)  # (doppler, range, elevation, azimuth)
IMG_H, IMG_W = 64, 96  # stereo: (64, 192)


def make_raw_kradar(root: str, rng=None) -> str:
    import cv2
    from scipy.io import savemat

    from dpft_tpu.data.pcd import write_pcd

    rng = rng or np.random.default_rng(7)
    src = osp.join(root, "raw")
    base = osp.join(src, SEQ)
    for sub in ("info_label_v2", "info_calib", "cam-front",
                "radar_tesseract", "os1-128", "os2-64"):
        os.makedirs(osp.join(base, sub), exist_ok=True)

    with open(osp.join(base, "description.txt"), "w") as f:
        f.write("urban,day,normal")

    with open(osp.join(base, "info_calib", "calib_camera_lidar.txt"), "w") as f:
        f.write("header\n")
        p = [300.0, 0.0, 48.0, 0.0, 0.0, 300.0, 32.0, 0.0, 0.0, 0.0, 1.0, 0.0]
        f.write(",".join(str(v) for v in p))
    with open(osp.join(base, "info_calib", "calib_radar_lidar.txt"), "w") as f:
        f.write("header\n")
        f.write("0,2.54,0.3")  # frame diff, dx, dy

    for sid in TRAIN_IDS + VAL_IDS + TEST_IDS:
        idx = sid.split("_")[0]
        with open(osp.join(base, "info_label_v2", f"{sid}.txt"), "w") as f:
            f.write(f"timestamp={idx}_{idx}_{idx}_{idx}_{idx}\n")
            # 10-field format: *, obj_id, class, x, y, z, theta, l, w, h
            f.write("*, 0, Sedan, 20.0, 1.0, 0.5, 10.0, 2.0, 1.0, 0.8\n")
            f.write("*, 1, Sedan, 40.0, -2.0, 0.2, -5.0, 2.2, 0.9, 0.7\n")
            f.write("*, 2, Bus or Truck, 30.0, 3.0, 0.5, 0.0, 4.0, 1.5, 1.5\n")

        stereo = rng.integers(0, 255, size=(IMG_H, 2 * IMG_W, 3),
                              dtype=np.uint8)
        cv2.imwrite(osp.join(base, "cam-front", f"cam-front_{idx}.png"),
                    stereo)

        tess = rng.uniform(1e8, 1e12, size=TESSERACT_SHAPE).astype(np.float64)
        savemat(osp.join(base, "radar_tesseract", f"tesseract_{idx}.mat"),
                {"arrDREA": tess})

        n_pts = 120
        fields = {
            "x": rng.uniform(0.5, 60, n_pts).astype(np.float32),
            "y": rng.uniform(-10, 10, n_pts).astype(np.float32),
            "z": rng.uniform(-2, 4, n_pts).astype(np.float32),
            "intensity": rng.uniform(0, 255, n_pts).astype(np.float32),
            "t": rng.integers(0, 1_000_000, n_pts).astype(np.uint32),
            "reflectivity": rng.integers(0, 65535, n_pts).astype(np.uint16),
            "ring": rng.integers(0, 128, n_pts).astype(np.uint8),
            "ambient": rng.integers(0, 65535, n_pts).astype(np.uint16),
            "range": rng.integers(0, 200_000, n_pts).astype(np.uint32),
        }
        # A couple of missing returns (x ~ 0) to exercise filtering.
        fields["x"][:3] = 0.0
        write_pcd(osp.join(base, "os1-128", f"os1-128_{idx}.pcd"), fields)
        fields2 = dict(fields)
        fields2["x"] = fields["x"] + 0.05
        write_pcd(osp.join(base, "os2-64", f"os2-64_{idx}.pcd"), fields2)

    return src


def base_config(max_boxes=8):
    return {
        "dataset": "kradar",
        "computing": {"dtype": "float32", "seed": 0, "workers": 2,
                      "device": "cpu"},
        "data": {
            "revision": "v2",
            "image_size": 32,
            "num_classes": 2,
            "max_boxes": max_boxes,
            "categories": {
                "Sedan": 0, "Bus or Truck": -1, "Motorcycle": -1,
                "Bicycle": -1, "Bicycle Group": -1, "Pedestrian": -1,
                "Pedestrian Group": -1, "Background": -1,
            },
            "fov": {"x": [0.0, 72.0], "y": [-6.4, 6.4], "z": [-2.0, 6.0],
                    "azimuth": [-50, 50]},
        },
        "train": {"batch_size": 2, "shuffle": True, "epochs": 1,
                  "logging": None,
                  "optimizer": {"name": "AdamW", "lr": 1e-4},
                  "anassigner": "HungarianAnassigner",
                  "criterion": "SetCriterion",
                  "loss_weights": {"total_class": 1.0, "object_class": 0.0,
                                   "center": 1.0, "size": 1.0, "angle": 1.0},
                  "scheduler": {"name": "ConstantLR", "factor": 1.0}},
        "evaluate": {"logging": None,
                     "metrics": {"mAP": "mAP3D", "mGIoU": "mGIoU3D"},
                     "exporter": {"name": "kradar"}},
    }
