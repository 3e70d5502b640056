"""Visualization utilities (matplotlib; no open3d dependency).

Functional equivalents of the reference visualization surface
(src/dprt/utils/visu.py:57-552): camera images with projected boxes, lidar
point clouds (matplotlib 3D instead of open3d), and 2D aggregations of the
4D radar tesseract in polar or cartesian layout with optional point-cloud
and bounding-box overlays.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from dpft_tpu.utils.geometry import get_box_corners

# Edges of the ground-anchored corner convention (utils/geometry.py).
_BOX_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def _get_ax(ax=None, subplot_kw=None):
    import matplotlib.pyplot as plt

    if ax is not None:
        return ax.figure, ax
    return plt.subplots(subplot_kw=subplot_kw or {})


def visu_camera_data(image: np.ndarray, boxes: Optional[np.ndarray] = None,
                     projection: Optional[np.ndarray] = None, ax=None,
                     show: bool = True):
    """Shows a camera image, optionally with projected 3D boxes.

    image: (H, W, 3) RGB or BGR uint8/float; boxes: (M, >=7) raw-format
    boxes [x, y, z, theta, l, w, h, ...]; projection: (3|4, 4) camera
    matrix mapping box-frame points to pixels.
    """
    fig, ax = _get_ax(ax)
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    ax.imshow(img)
    ax.set_axis_off()

    if boxes is not None and projection is not None and len(boxes):
        corners = get_box_corners(boxes)  # (M, 8, 3)
        homo = np.concatenate(
            [corners, np.ones((*corners.shape[:2], 1))], axis=-1)
        proj = np.einsum("ij,mkj->mki", projection[:3, :4], homo)
        w = np.where(proj[..., 2] == 0, 1.0, proj[..., 2])
        u, v = proj[..., 0] / w, proj[..., 1] / w
        for m in range(corners.shape[0]):
            if np.any(proj[m, :, 2] <= 0):
                continue
            for a, b in _BOX_EDGES:
                ax.plot([u[m, a], u[m, b]], [v[m, a], v[m, b]],
                        color="lime", linewidth=1)
    if show:
        fig.show()
    return fig, ax


def visu_lidar_data(points: np.ndarray, boxes: Optional[np.ndarray] = None,
                    xlim: Sequence[float] = (-100, 100),
                    ylim: Sequence[float] = (-100, 100), ax=None,
                    show: bool = True):
    """3D scatter of a lidar cloud (N, >=3), intensity-colored, with boxes."""
    fig, ax = _get_ax(ax, subplot_kw={"projection": "3d"})
    pts = np.asarray(points)
    keep = ((pts[:, 0] > xlim[0]) & (pts[:, 0] < xlim[1])
            & (pts[:, 1] > ylim[0]) & (pts[:, 1] < ylim[1]))
    pts = pts[keep]
    color = pts[:, 3] if pts.shape[1] > 3 else pts[:, 2]
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=color, s=0.5,
               cmap="viridis")

    if boxes is not None and len(boxes):
        corners = get_box_corners(boxes)
        for m in range(corners.shape[0]):
            for a, b in _BOX_EDGES:
                ax.plot(*zip(corners[m, a], corners[m, b]), color="red",
                        linewidth=1)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    if show:
        fig.show()
    return fig, ax


def visu_radar_data(plane: np.ndarray, channel: int = 0, ax=None,
                    show: bool = True):
    """Shows one channel of a processed RA/EA radar plane (H, W, C)."""
    fig, ax = _get_ax(ax)
    im = ax.imshow(np.asarray(plane)[..., channel], origin="lower",
                   aspect="auto", cmap="viridis")
    fig.colorbar(im, ax=ax)
    if show:
        fig.show()
    return fig, ax


def visu_radar_tesseract(tesseract: np.ndarray, dims: str,
                         raster: Dict[str, np.ndarray],
                         points: Optional[np.ndarray] = None,
                         boxes: Optional[np.ndarray] = None,
                         roi: bool = False, cart: bool = False,
                         aggregation_func=np.max, ax=None,
                         show: bool = True):
    """2D aggregation of the (doppler, range, elevation, azimuth) tesseract.

    dims selects the kept axes as a 2-char combination of
    {'d': doppler, 'r': range, 'e': elevation, 'a': azimuth}, e.g. 'ra' or
    'ea'; the remaining axes are reduced with aggregation_func. With
    cart=True an (r, a) view is resampled into cartesian x/y.
    """
    order = "drea"
    assert len(dims) == 2 and all(d in order for d in dims)
    t = 10.0 * np.log10(np.asarray(tesseract))

    reduce_axes = tuple(sorted(order.index(d) for d in order
                               if d not in dims))
    img = aggregation_func(t, axis=reduce_axes)
    # Arrange as (dims[0], dims[1])
    kept = [d for d in order if d in dims]
    if kept != list(dims):
        img = img.T

    fig, ax = _get_ax(ax)
    x_raster = np.asarray(raster[dims[1]])
    y_raster = np.asarray(raster[dims[0]])

    if cart and set(dims) == {"r", "a"}:
        r_idx = dims.index("r")
        r_axis = np.asarray(raster["r"])
        a_axis = np.deg2rad(np.asarray(raster["a"]))
        rr, aa = np.meshgrid(r_axis, a_axis, indexing="ij")
        vals = img if r_idx == 0 else img.T
        x = rr * np.cos(aa)
        y = rr * np.sin(aa)
        sc = ax.scatter(x.ravel(), y.ravel(), c=vals.ravel(), s=2,
                        cmap="viridis")
        fig.colorbar(sc, ax=ax)
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
    else:
        im = ax.pcolormesh(x_raster, y_raster, img, cmap="viridis",
                           shading="auto")
        fig.colorbar(im, ax=ax)
        ax.set_xlabel(dims[1])
        ax.set_ylabel(dims[0])

    if points is not None and cart and len(points):
        ax.scatter(points[:, 0], points[:, 1], c="white", s=0.5)
    if boxes is not None and cart and len(boxes):
        corners = get_box_corners(boxes)
        for m in range(corners.shape[0]):
            quad = corners[m, :4, :2]
            loop = np.vstack([quad, quad[:1]])
            ax.plot(loop[:, 0], loop[:, 1], color="red", linewidth=1)

    if show:
        fig.show()
    return fig, ax
