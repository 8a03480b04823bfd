"""Point cloud utilities.

Behavioral reference: ``latentfusion/pointcloud.py``. PLY I/O reuses
``meshutils``; outlier filters use sklearn; the reference's PCL plane
segmentation (pointcloud.py:99-130) is replaced by an in-repo RANSAC plane
fit (PCL is not in the image).
"""
from __future__ import annotations

import logging

import numpy as np

import jax.numpy as jnp

from . import three

logger = logging.getLogger(__name__)


def load_ply(path):
    """(reference: pointcloud.py:18-20)"""
    from .meshutils import load_ply as _load

    return jnp.asarray(_load(path)["vertices"])


def save_ply(path, points, colors=None):
    """ASCII PLY writer (reference: pointcloud.py:23-54)."""
    points = np.asarray(points)
    lines = ["ply", "format ascii 1.0", f"element vertex {len(points)}",
             "property float x", "property float y", "property float z"]
    if colors is not None:
        colors = (np.asarray(colors) * 255.0).astype(np.uint8)
        lines += ["property uchar red", "property uchar green",
                  "property uchar blue"]
    lines.append("end_header")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
        for i, p in enumerate(points):
            row = f"{p[0]} {p[1]} {p[2]}"
            if colors is not None:
                row += f" {colors[i, 0]} {colors[i, 1]} {colors[i, 2]}"
            f.write(row + "\n")


def project_pointcloud(camera, points):
    """Project object-space points to integer pixel coords
    (reference: pointcloud.py:57-60)."""
    image_points = jnp.swapaxes(
        camera.obj_to_image @ jnp.swapaxes(three.homogenize(points), 1, 2),
        1, 2)
    return three.dehomogenize(image_points).astype(jnp.int32)


def compute_point_mask(camera, mask, points):
    """Keep points that project inside the foreground mask
    (reference: pointcloud.py:63-79; vectorized, no Python loop)."""
    mask = (jnp.asarray(mask).reshape(len(camera), camera.height,
                                      camera.width) > 0.5)
    height, width = camera.height, camera.width
    image_points = project_pointcloud(camera, points)
    x = image_points[..., 0]
    y = image_points[..., 1]
    in_bounds = (x >= 0) & (x < width) & (y >= 0) & (y < height)
    xc = jnp.clip(x, 0, width - 1)
    yc = jnp.clip(y, 0, height - 1)
    fg = jnp.take_along_axis(
        mask.reshape(len(camera), -1), yc * width + xc, axis=1)
    return in_bounds & fg


def filter_outliers(points, n_estimators=100, contamination=0.05,
                    type="isolation_forest"):
    """sklearn outlier mask (reference: pointcloud.py:82-97)."""
    pts = np.asarray(points)
    if type == "elliptic":
        from sklearn.covariance import EllipticEnvelope

        clf = EllipticEnvelope(contamination=contamination)
    elif type == "isolation_forest":
        from sklearn.ensemble import IsolationForest

        clf = IsolationForest(n_estimators=n_estimators,
                              contamination=contamination)
    else:
        raise ValueError("Unknown outlier filter type")
    y = clf.fit_predict(pts)
    logger.info("filtered points: %d filtered, %d valid",
                int((y <= 0).sum()), int((y > 0).sum()))
    return jnp.asarray(y > 0)


def segment_plane(points, distance_threshold=0.01, num_iterations=256,
                  seed=0):
    """RANSAC plane segmentation; returns (inlier_or_below_mask, plane abcd)
    matching the reference's PCL behavior (pointcloud.py:99-130): the mask
    marks plane inliers and everything below the plane."""
    pts = np.asarray(points, dtype=np.float64)
    rng = np.random.RandomState(seed)
    n = len(pts)
    best_inliers = 0
    best_plane = None
    for _ in range(num_iterations):
        idx = rng.choice(n, 3, replace=False)
        p0, p1, p2 = pts[idx]
        normal = np.cross(p1 - p0, p2 - p0)
        norm = np.linalg.norm(normal)
        if norm < 1e-12:
            continue
        normal = normal / norm
        d = -normal.dot(p0)
        dist = np.abs(pts @ normal + d)
        count = int((dist < distance_threshold).sum())
        if count > best_inliers:
            best_inliers = count
            best_plane = (*normal, d)
    if best_plane is None:
        raise RuntimeError("plane segmentation failed")

    a, b, c, d = best_plane
    normal = np.asarray((a, b, c))
    normal /= np.linalg.norm(normal)
    point_on_plane = np.asarray((0.0, 0.0, -d / c)) if abs(c) > 1e-9 else \
        -d * normal
    sign = np.sign(point_on_plane.dot(normal))
    below_plane = sign * (pts @ normal) <= 0
    inlier = np.abs(pts @ normal + d) < distance_threshold
    return jnp.asarray(inlier | below_plane), np.asarray(best_plane)
