"""Visual exploration of a raw K-Radar sample.

Parity: reference scripts/explore.py:12-76 (and explore.ipynb) - loads the
first raw training sample with boxes, shows the front camera image, the
lidar cloud and an aggregated radar tesseract view with overlays. The
``# %%`` markers make this runnable cell-by-cell in any Jupyter-compatible
editor, standing in for the reference notebook.
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from dpft_tpu.data import prepare  # noqa: E402
from dpft_tpu.data.kradar import radar_info  # noqa: E402
from dpft_tpu.utils import visu  # noqa: E402
from dpft_tpu.utils.config import load_config  # noqa: E402
from dpft_tpu.utils.geometry import (  # noqa: E402
    get_transformation, transform_boxes, transform_points,
)


def main(src: str, cfg: str) -> None:
    config = load_config(cfg)
    preparator = prepare(config["dataset"], config)

    dataset_paths = preparator.get_dataset_paths(src)
    split = next(iter(dataset_paths))
    # Every sequence gets a (possibly empty) entry in every split; take
    # the first sequence that actually has samples in this split.
    sequence = next(s for s in dataset_paths[split].values() if s)
    sequence_paths = preparator.get_sequence_paths(sequence)
    sequence_paths.pop("description", None)

    # %% Find the first sample with multiple boxes
    sample = None
    boxes = None
    for cand in sequence_paths.values():
        boxes = preparator.get_boxes(cand["label"])
        sample = cand
        if boxes.shape[0] > 1:
            break

    # %% Camera view
    camera_front, _ = preparator.get_camera_data(sample["camera_front"])
    visu.visu_camera_data(camera_front[:, :, ::-1])

    # %% Lidar cloud with boxes
    point_cloud = preparator.get_lidar_data(sample["os2"])
    visu.visu_lidar_data(point_cloud, boxes, xlim=[-100, 100],
                         ylim=[-100, 100])

    # %% Radar tesseract BEV aggregation with overlays
    tesseract = preparator.get_radar_tesseract(sample["radar_tesseract"])
    raster = {
        "r": radar_info.range_raster,
        "e": radar_info.elevation_raster,
        "a": radar_info.azimuth_raster,
        "d": radar_info.doppler_raster,
    }
    # Shrunken fixtures carry reduced tesseracts; slice the rasters to the
    # actual bin counts (a no-op on real K-Radar data).
    for key, axis in zip("drea", range(4)):
        raster[key] = np.asarray(raster[key])[:tesseract.shape[axis]]

    # Radar frame: inverse of the radar->lidar translation.
    radar_to_lidar = preparator.get_translation(sample["calib_radar_lidar"])
    tm = get_transformation(radar_to_lidar[:3, 3], None, inverse=True)
    boxes_r = transform_boxes(boxes, tm)
    points_r = transform_points(point_cloud, tm)

    visu.visu_radar_tesseract(tesseract, dims="ra", raster=raster,
                              points=points_r, boxes=boxes_r, cart=True,
                              aggregation_func=np.max)

    import matplotlib.pyplot as plt
    plt.show()


if __name__ == "__main__":
    parser = argparse.ArgumentParser("DPFT raw-data exploration")
    parser.add_argument("--src", type=str, required=True,
                        help="Path to the raw dataset folder.")
    parser.add_argument("--cfg", type=str, default="config/kradar.json")
    args = parser.parse_args()
    main(src=args.src, cfg=args.cfg)
