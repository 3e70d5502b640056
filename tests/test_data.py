"""Data layer tests: ETL processor, dataset loading, loader batching."""

import os
import os.path as osp

import numpy as np
import pytest

from dpft_tpu.data import init as init_dataset
from dpft_tpu.data import load as load_dataset
from dpft_tpu.data import prepare as prepare_dataset
from dpft_tpu.data.kradar import radar_info, splits
from dpft_tpu.data.pcd import read_pcd, write_pcd
from dpft_tpu.ops.radar_reduce import reduce_tesseract, reduce_tesseract_np

from kradar_fixture import (TESSERACT_SHAPE, TRAIN_IDS, base_config,
                            make_raw_kradar)


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kradar"))
    src = make_raw_kradar(root)
    dst = osp.join(root, "processed")
    config = base_config()
    processor = prepare_dataset("kradar", config)
    processor.prepare(src, dst)
    return dst, config


def test_splits_tables_loaded():
    assert len(splits.get_split("train")) == 13967
    assert len(splits.get_split("full")) == 13967 + 3491 + 17536
    assert "10_00027_00001" in splits.get_split("train")
    with pytest.raises(ValueError):
        splits.get_split("nope")


def test_radar_info_constants():
    assert len(radar_info.azimuth_raster) == 107
    assert radar_info.azimuth_raster[0] == 53
    assert radar_info.azimuth_raster[-1] == -53
    assert len(radar_info.doppler_raster) == 64
    assert radar_info.doppler_raster[32] == 0.0
    assert len(radar_info.range_raster) == 256
    assert abs(radar_info.range_raster[1] - 0.46289062) < 1e-6


def test_pcd_roundtrip(tmp_path, rng):
    fields = {
        "x": rng.normal(size=10).astype(np.float32),
        "ring": rng.integers(0, 128, 10).astype(np.uint8),
    }
    path = str(tmp_path / "test.pcd")
    write_pcd(path, fields)
    out = read_pcd(path)
    np.testing.assert_array_equal(out["x"], fields["x"])
    np.testing.assert_array_equal(out["ring"], fields["ring"])


def test_radar_reduce_matches_numpy(rng):
    tess = rng.uniform(1e8, 1e12,
                       size=TESSERACT_SHAPE).astype(np.float32)
    ra_np, ea_np = reduce_tesseract_np(tess)
    ra_j, ea_j = reduce_tesseract(tess)
    np.testing.assert_allclose(np.asarray(ra_j), ra_np, rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ea_j), ea_np, rtol=2e-4, atol=2e-2)


def test_processor_prepare_device_cpu_matches_numpy(rng, tmp_path):
    """prepare_device='cpu' pins the ETL reduction to the host XLA backend
    (for tunneled/remote chips where the per-frame H2D dominates) and must
    produce the same planes as the NumPy reference path."""
    from scipy.io import savemat

    from dpft_tpu.data.kradar.processor import KRadarProcessor

    tess = rng.uniform(1e8, 1e12, size=TESSERACT_SHAPE).astype(np.float32)
    mat = str(tmp_path / "tess.mat")
    savemat(mat, {"arrDREA": tess})

    proc_cpu = KRadarProcessor(use_device=True, prepare_device="cpu")
    proc_np = KRadarProcessor(use_device=False)
    ra_c, ea_c = proc_cpu.get_radar_data(mat)
    ra_n, ea_n = proc_np.get_radar_data(mat)
    np.testing.assert_allclose(ra_c, ra_n, rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(ea_c, ea_n, rtol=2e-4, atol=2e-2)


def test_radar_reduce_batched(rng):
    tess = rng.uniform(1e8, 1e10, size=(2,) + TESSERACT_SHAPE).astype(np.float32)
    ra, ea = reduce_tesseract(tess)
    assert ra.shape == (2, TESSERACT_SHAPE[1], TESSERACT_SHAPE[3], 6)
    assert ea.shape == (2, TESSERACT_SHAPE[2], TESSERACT_SHAPE[3], 6)


def test_processor_output_tree(prepared):
    dst, _ = prepared
    sample_dir = osp.join(dst, "train", "10", TRAIN_IDS[0])
    expected = ["labels.npy", "description.npy", "mono.jpg", "mono_info.npy",
                "stereo.jpg", "stereo_info.npy", "ra.npy", "ra_info.npy",
                "ea.npy", "ea_info.npy", "os1.npy", "os2.npy"]
    for name in expected:
        assert osp.exists(osp.join(sample_dir, name)), name

    labels = np.load(osp.join(sample_dir, "labels.npy"))
    # 3 raw boxes, Bus or Truck dropped via category -1 -> 2 boxes.
    assert labels.shape == (2, 9)
    # Boxes were translated to the lidar frame (+2.54, +0.3).
    assert abs(labels[0, 0] - 22.54) < 1e-4
    assert abs(labels[0, 1] - 1.3) < 1e-4
    # theta in radians, l/w/h doubled.
    assert abs(labels[0, 3] - np.deg2rad(10.0)) < 1e-5
    assert abs(labels[0, 4] - 4.0) < 1e-5

    ra = np.load(osp.join(sample_dir, "ra.npy"))
    ea = np.load(osp.join(sample_dir, "ea.npy"))
    assert ra.shape == (TESSERACT_SHAPE[1], TESSERACT_SHAPE[3], 6)
    assert ea.shape == (TESSERACT_SHAPE[2], TESSERACT_SHAPE[3], 6)

    os1 = np.load(osp.join(sample_dir, "os1.npy"))
    assert os1.shape[1] == 9
    assert np.all(np.abs(os1[:, 0]) > 0.01)
    # os2 read from the os2 file (reference bug fixed): shifted x values.
    os2 = np.load(osp.join(sample_dir, "os2.npy"))
    assert os2.shape[1] == 9
    # Fixture os2 x-values are shifted +0.05, so its 3 near-zero points
    # survive the |x| > 0.01 filter: 120 points vs os1's 117.
    assert os2.shape[0] == os1.shape[0] + 3

    desc = np.load(osp.join(sample_dir, "description.npy"))
    np.testing.assert_array_equal(desc, [0, 0, 0])  # urban, day, normal


def test_processor_splits(prepared):
    dst, _ = prepared
    assert len(os.listdir(osp.join(dst, "train", "10"))) == 2
    assert len(os.listdir(osp.join(dst, "val", "10"))) == 1
    assert len(os.listdir(osp.join(dst, "test", "10"))) == 1



def test_dataset_sample_contract(prepared):
    dst, config = prepared
    ds = init_dataset("kradar", src=dst, split="train", config=config)
    assert len(ds) == 2
    sample, label = ds[0]

    # Inputs: camera + both radar planes + matrices + shapes.
    assert sample["camera_mono"].shape == (32, 48, 3)  # shorter side 32
    assert sample["radar_bev"].shape == (TESSERACT_SHAPE[1],
                                         TESSERACT_SHAPE[3], 6)
    assert sample["radar_front"].shape == (TESSERACT_SHAPE[2],
                                           TESSERACT_SHAPE[3], 6)
    assert sample["label_to_camera_mono_t"].shape == (4, 4)
    assert np.all(sample["label_to_camera_mono_t"] == 0)
    assert sample["label_to_camera_mono_p"].shape == (4, 4)
    assert sample["label_to_radar_bev_t"].shape == (4, 4)
    assert sample["label_to_radar_bev_p"].shape == (3, 4)
    # Shape recorded BEFORE resizing (reference order).
    np.testing.assert_array_equal(sample["camera_mono_shape"], [64, 96, 3])

    # Radar scaled into [0, 255].
    assert sample["radar_bev"].min() >= 0 and sample["radar_bev"].max() <= 255

    # Targets: padded to max_boxes with mask; class one-hot (Sedan -> 1).
    M = config["data"]["max_boxes"]
    assert label["gt_center"].shape == (M, 3)
    assert label["gt_mask"].sum() == 2
    np.testing.assert_array_equal(label["gt_class"][0], [0, 1])
    np.testing.assert_array_equal(label["gt_class"][-1], [1, 0])  # pad
    assert label["description"].shape == (3,)


def test_loader_batches(prepared):
    dst, config = prepared
    ds = init_dataset("kradar", src=dst, split="train", config=config)
    loader = load_dataset(ds, config)
    batches = list(loader)
    assert len(batches) == 1  # 2 samples, batch 2
    inputs, targets = batches[0]
    assert inputs["camera_mono"].shape == (2, 32, 48, 3)
    assert targets["gt_mask"].shape == (2, config["data"]["max_boxes"])
    # Iterating again (new epoch) still works.
    assert len(list(loader)) == 1


def test_loader_workers_and_drop_last(prepared):
    dst, config = prepared
    ds = init_dataset("kradar", src=dst, split="train", config=config)
    cfg = {**config, "train": {**config["train"], "batch_size": 1}}
    loader = load_dataset(ds, cfg)
    assert len(list(loader)) == 2
