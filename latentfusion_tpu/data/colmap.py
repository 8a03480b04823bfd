"""COLMAP reconstruction loader.

Behavioral reference: ``latentfusion/datasets/colmap.py``. Parses COLMAP text
exports (images.txt / cameras.txt / points3D.txt), filters the sparse cloud,
auto-scales, and serves masked RGB frames with normalized extrinsics.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

import jax.numpy as jnp

from .. import three
from ..pointcloud import filter_outliers
from ..three import quaternion as quat


def parse_image_meta(path):
    """(reference: colmap.py:12-30)"""
    with open(path) as f:
        lines = [l.strip() for l in f if not l.startswith("#")]
    lines = lines[::2]  # skip the POINTS2D lines
    out = []
    for line in lines:
        (image_id, qw, qx, qy, qz, tx, ty, tz, camera_id,
         name) = line.split(" ")
        out.append({
            "id": int(image_id),
            "name": name,
            "camera_id": int(camera_id),
            "rotation": np.asarray([qw, qx, qy, qz], dtype=np.float32),
            "translation": np.asarray([tx, ty, tz], dtype=np.float32),
        })
    return out


def parse_points(path, max_error=2.0):
    """(reference: colmap.py:33-44)"""
    with open(path) as f:
        lines = [l.strip() for l in f if not l.startswith("#")]
    points = []
    for line in lines:
        vals = line.split(" ")[:8]
        if float(vals[7]) <= max_error:
            points.append([float(v) for v in vals[1:4]])
    return np.asarray(points, dtype=np.float32)


def parse_cameras(path):
    """(reference: colmap.py:47-72; PINHOLE model only)"""
    with open(path) as f:
        lines = [l.strip() for l in f if not l.startswith("#")]
    cameras = {}
    for line in lines:
        parts = line.split(" ")
        camera_id, model, width, height = parts[:4]
        if model != "PINHOLE":
            raise ValueError(f"Camera model {model!r} is not supported yet.")
        fx, fy, cx, cy = (float(v) for v in parts[4:8])
        cameras[int(camera_id)] = {
            "id": int(camera_id),
            "width": int(width),
            "height": int(height),
            "model": model,
            "intrinsic": np.asarray(
                [[fx, 0.0, cx, 0.0], [0.0, fy, cy, 0.0],
                 [0.0, 0.0, 1.0, 0.0]], dtype=np.float32),
        }
    return cameras


class ColmapDataset:
    """(reference: colmap.py:83-147)"""

    def __init__(self, path, image_scale=0.2, object_scale="auto",
                 mask_mode="grabcut"):
        self.path = Path(path)
        self.image_dir = self.path / "color"
        self.mask_dir = self.path / "mask"

        points = parse_points(self.path / "points3D.txt")
        keep = np.asarray(filter_outliers(points, contamination=0.1))
        self.points = points[keep]
        self.image_dicts = parse_image_meta(self.path / "images.txt")
        self.cameras = parse_cameras(self.path / "cameras.txt")
        self.centroid = np.asarray(
            three.points_centroid(jnp.asarray(self.points)))

        if object_scale == "auto":
            object_scale = 1.0 / float(
                three.points_bounding_size(jnp.asarray(self.points)))
        self.image_scale = image_scale
        self.object_scale = object_scale
        self.mask_mode = mask_mode

    def __len__(self):
        return len(self.image_dicts)

    def _load(self, path, as_bool=False):
        import cv2
        import imageio.v2 as imageio

        image = np.asarray(imageio.imread(path))
        h, w = image.shape[:2]
        image = cv2.resize(image, (int(w * self.image_scale),
                                   int(h * self.image_scale)),
                           interpolation=cv2.INTER_NEAREST)
        return image.astype(bool) if as_bool else image

    def __getitem__(self, idx):
        meta = self.image_dicts[idx]
        image = self._load(self.image_dir / meta["name"])
        mask = self._load(self.mask_dir / f"{meta['name']}.png", as_bool=True)
        if mask.ndim > 2:
            mask = mask[..., 0]
        camera = self.cameras[meta["camera_id"]]

        extrinsic = np.asarray(three.to_extrinsic_matrix(
            jnp.asarray(meta["translation"])[None],
            jnp.asarray(meta["rotation"])[None]))[0]
        extrinsic = np.asarray(three.translate_matrix(
            jnp.asarray(extrinsic), -jnp.asarray(self.centroid)))
        extrinsic[:3, 3] *= self.object_scale
        intrinsic = camera["intrinsic"].copy()
        intrinsic[:2, :] *= self.image_scale

        return {
            "color": image.astype(np.float32).transpose(2, 0, 1) / 255.0,
            "mask": mask,
            "extrinsic": extrinsic,
            "intrinsic": intrinsic,
        }
