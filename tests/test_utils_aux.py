"""Tests for aux utilities: geometry, project, data (de)collation, visu,
NSGA-II optimizer, and the split script objective."""

import os.path as osp
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from dpft_tpu.ops.nsga2 import (crowding_distance, fast_non_dominated_sort,
                                nsga2_minimize)
from dpft_tpu.utils import visu
from dpft_tpu.utils.data import collate_batch, decollate_batch
from dpft_tpu.utils.geometry import (get_box_corners, get_transformation,
                                     transform_boxes, transform_points)
from dpft_tpu.utils.project import cart2polar, cart2spher, polar2cart, spher2cart


def test_get_transformation_roundtrip():
    t = get_transformation([1.0, 2.0, 3.0], [0.1, 0.2, 0.3])
    t_inv = get_transformation([1.0, 2.0, 3.0], [0.1, 0.2, 0.3],
                               inverse=True)
    np.testing.assert_allclose(t @ t_inv, np.eye(4), atol=1e-6)


def test_transform_points_and_boxes():
    tm = get_transformation([1.0, 0.0, 0.0], None)
    pts = np.array([[0.0, 0.0, 0.0, 9.0]])
    out = transform_points(pts, tm)
    np.testing.assert_allclose(out[0, :3], [1, 0, 0], atol=1e-6)
    assert out[0, 3] == 9.0  # extra columns untouched
    boxes = np.array([[0.0, 0, 0, 0.5, 2, 1, 1, 0, 0]])
    out = transform_boxes(boxes, tm)
    np.testing.assert_allclose(out[0, :3], [1, 0, 0], atol=1e-6)
    assert out[0, 3] == 0.5  # heading untouched (reference TODO)


def test_host_box_corners_ground_anchored():
    corners = get_box_corners(np.array([[0, 0, 1.0, 0.0, 2, 2, 2]]))
    # Bottom face at z = 1, top at z + h/2 = 2 (reference convention).
    assert np.allclose(corners[0, :4, 2], 1.0)
    assert np.allclose(corners[0, 4:, 2], 2.0)


def test_project_roundtrip():
    x, y = polar2cart(np.array([2.0]), np.array([45.0]), degrees=True)
    r, phi = cart2polar(x, y, degrees=True)
    assert abs(r[0] - 2.0) < 1e-6 and abs(phi[0] - 45.0) < 1e-5
    x, y, z = spher2cart(np.array([2.0]), np.array([30.0]),
                         np.array([10.0]), degrees=True)
    r, phi, roh = cart2spher(x, y, z, degrees=True)
    assert abs(r[0] - 2.0) < 1e-6
    assert abs(phi[0] - 30.0) < 1e-4 and abs(roh[0] - 10.0) < 1e-4


def test_decollate_strips_padding():
    batch = {
        "gt_center": np.zeros((2, 4, 3)),
        "gt_mask": np.array([[1, 1, 0, 0], [1, 0, 0, 0]], bool),
        "class": np.zeros((2, 5, 2)),
    }
    samples = decollate_batch(batch, strip_padding=True)
    assert samples[0]["gt_center"].shape == (2, 3)
    assert samples[1]["gt_center"].shape == (1, 3)
    assert samples[0]["class"].shape == (5, 2)  # predictions untouched
    rebuilt = collate_batch(decollate_batch(batch))
    np.testing.assert_array_equal(rebuilt["class"], batch["class"])


def test_visu_smoke(tmp_path):
    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3),
                                            dtype=np.uint8)
    boxes = np.array([[5.0, 0, 0, 0.3, 2, 1, 1]])
    proj = np.eye(4)[:3]
    fig, _ = visu.visu_camera_data(img, boxes, proj, show=False)
    fig.savefig(tmp_path / "cam.png")

    pts = np.random.default_rng(0).normal(size=(100, 4)) * 10
    fig, _ = visu.visu_lidar_data(pts, boxes, show=False)
    fig.savefig(tmp_path / "lidar.png")

    tess = np.random.default_rng(0).uniform(1e8, 1e10, (4, 8, 3, 5))
    raster = {"d": np.arange(4), "r": np.linspace(0, 10, 8),
              "e": np.arange(3), "a": np.linspace(-26, 26, 5)}
    fig, _ = visu.visu_radar_tesseract(tess, "ra", raster, cart=True,
                                       show=False)
    fig.savefig(tmp_path / "radar.png")
    fig, _ = visu.visu_radar_tesseract(tess, "ea", raster, show=False)
    fig.savefig(tmp_path / "radar_ea.png")

    # Caller-supplied axis: the 2D view must draw onto it, not a fresh
    # hidden figure (regression: ax was swallowed by **kwargs).
    import matplotlib.pyplot as plt
    fig, axs = plt.subplots(1, 2)
    _, used_ax = visu.visu_radar_tesseract(tess, "ra", raster, ax=axs[0],
                                           show=False)
    assert used_ax is axs[0]
    assert len(axs[0].collections) > 0  # pcolormesh landed on the subplot
    plt.close(fig)


def test_visu_full_surface(tmp_path):
    """Reference visu.py:14-552 parity surface: colormaps, scalar2rgba,
    3D cube view, 2D grids polar+cartesian with box/point overlays, and
    dst= save semantics on every entry point."""
    rng = np.random.default_rng(1)

    rgba = visu.scalar2rgba(rng.normal(size=7))
    assert rgba.shape == (7, 4)
    assert np.all((rgba >= 0) & (rgba <= 1))
    accent = visu.get_tum_accent_cm()
    assert accent.N == 4

    tess = rng.uniform(1e8, 1e10, (4, 8, 3, 5))
    raster = {"d": np.arange(4), "r": np.linspace(1, 10, 8),
              "e": np.linspace(-10, 10, 3), "a": np.linspace(-26, 26, 5)}
    boxes = np.array([[5.0, 0, 0, 0.3, 2, 1, 1, 1, 0]])  # class at -2
    pts = np.column_stack([rng.uniform(1, 9, 50), rng.uniform(-3, 3, 50),
                           rng.uniform(-1, 1, 50), rng.uniform(0, 1, 50)])

    # 3D cube view (dst saves instead of showing).
    out = tmp_path / "cube.png"
    visu.visu_radar_tesseract(tess, "rae", raster, dst=str(out))
    assert out.exists()
    visu.visu_radar_tesseract(tess, "rae", raster, cart=True,
                              dst=str(tmp_path / "cube_cart.png"))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        visu.visu_3d_radar_data(tess[0], "rea", cart=True, show=False)

    # 2D views: polar + cartesian, flipped dims, overlays everywhere.
    for dims in ("ra", "ar", "ea", "ae"):
        out = tmp_path / f"grid_{dims}.png"
        visu.visu_radar_tesseract(tess, dims, raster, boxes=boxes,
                                  points=pts, cart=True, dst=str(out))
        assert out.exists()
    visu.visu_radar_tesseract(tess, "dr", raster,
                              dst=str(tmp_path / "grid_dr.png"))
    with _pytest.raises(ValueError):
        visu.visu_radar_tesseract(tess, "dr", raster, cart=True,
                                  show=False)

    # dst semantics on camera / lidar entry points.
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    visu.visu_camera_data(img, dst=str(tmp_path / "cam2.png"))
    assert (tmp_path / "cam2.png").exists()
    visu.visu_lidar_data(pts, boxes, dst=str(tmp_path / "lidar2.png"))
    assert (tmp_path / "lidar2.png").exists()


def test_nsga2_sorting():
    F = np.array([[0.0, 0.0], [1.0, 1.0], [0.0, 1.0], [2.0, 2.0]])
    fronts = fast_non_dominated_sort(F)
    assert 0 in fronts[0]
    assert 3 in fronts[-1]
    cd = crowding_distance(F[fronts[0]])
    assert np.all(cd >= 0)


def test_nsga2_minimize_balances_split():
    # Toy problem: assign 30 elements with binary property to 2 splits of
    # equal share such that each split sees the property half the time.
    rng = np.random.default_rng(0)
    props = rng.integers(0, 2, 30).astype(float)
    target = props.mean()

    def evaluate(x):
        f = []
        for n in range(2):
            sel = props[x == n]
            f.append(abs(sel.mean() - target) if len(sel) else 1.0)
        counts = np.bincount(x, minlength=2)
        cv = abs(counts[0] - counts[1]) / 30
        return np.array(f), max(0.0, cv - 1 / 30)

    X, F = nsga2_minimize(evaluate, n_var=30, xl=0, xu=1, pop_size=24,
                          n_gen=40, seed=0)
    assert F.sum(axis=1).min() < 0.15


def test_explore_notebook_in_sync():
    """scripts/explore.ipynb is generated from scripts/explore.py (the
    reference ships both, scripts/explore.{py,ipynb}); the committed
    notebook must match a fresh regeneration and its code cells must
    parse."""
    import ast
    import json
    import subprocess
    import sys

    root = osp.join(osp.dirname(__file__), "..")
    proc = subprocess.run(
        [sys.executable, osp.join(root, "scripts", "make_explore_notebook.py"),
         "--check"], capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    nb = json.load(open(osp.join(root, "scripts", "explore.ipynb")))
    assert nb["nbformat"] == 4
    code = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert code, "notebook has no code cells"
    for cell in code:
        ast.parse("".join(cell["source"]))
