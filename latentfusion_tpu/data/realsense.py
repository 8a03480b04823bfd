"""MOPED / Realsense capture loader.

Behavioral reference: ``latentfusion/datasets/realsense.py``. Loads open3d or
kinectfusion trajectories, applies optional manual registration, filters the
integrated point cloud with an isolation forest, auto-computes object scale,
and serves image_scale-resized RGB-D frames in the normalized object frame.
"""
from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from .. import three
from ..meshutils import load_ply as _load_ply_mesh
from ..pointcloud import filter_outliers

logger = logging.getLogger(__name__)


def _invert_rigid(trans: np.ndarray) -> np.ndarray:
    rot = trans[:3, :3].T
    t = -rot @ trans[:3, 3]
    out = np.zeros((4, 4), dtype=np.float32)
    out[3, 3] = 1
    out[:3, :3] = rot
    out[:3, 3] = t
    return out


def read_open3d_trajectory(filename):
    """Open3D .log trajectory -> stacked extrinsics
    (reference: realsense.py:30-42)."""
    traj = []
    with open(filename, "r") as f:
        meta = f.readline()
        while meta:
            mat = np.stack([np.fromstring(f.readline(), dtype=np.float64,
                                          sep=" \t") for _ in range(4)])
            traj.append(_invert_rigid(mat.astype(np.float32)))
            meta = f.readline()
    return np.stack(traj)


def _parse_kinectfusion_poses(poses_path):
    """(reference: realsense.py:45-64)"""
    with open(poses_path, "r") as f:
        lines = f.read().split("\n")
    num_cameras = len(lines) // 4
    poses = []
    for i in range(num_cameras):
        cam_lines = lines[i * 4 + 1:i * 4 + 4]
        pose = np.asarray([[float(v) for v in line.split(" ")]
                           for line in cam_lines], dtype=np.float32)
        bottom = np.asarray([[0.0, 0.0, 0.0, 1.0]], dtype=np.float32)
        poses.append(np.concatenate([pose, bottom], axis=0))
    return np.stack(poses)


def read_kinectfusion_trajectory(poses_path):
    """Relative -> absolute pose chain (reference: realsense.py:67-76)."""
    rel_poses = _parse_kinectfusion_poses(poses_path)
    canon = rel_poses[0]
    abs_poses = [rel_poses[0]]
    for rel in rel_poses[1:]:
        abs_poses.append(rel @ canon)
    return np.stack(abs_poses)


def _resize(image, scale):
    import cv2

    if scale == 1.0:
        return image
    h, w = image.shape[:2]
    return cv2.resize(image, (int(w * scale), int(h * scale)),
                      interpolation=cv2.INTER_NEAREST)


class RealsenseDataset:
    """(reference: realsense.py:91-316)"""

    def __init__(self, scene_paths, image_scale=0.2, object_scale="auto",
                 center_object=True, odometry_type="open3d",
                 use_registration=True, mask_type="default", ref_points=None):
        if isinstance(scene_paths, (str, Path)):
            scene_paths = [scene_paths]
        self.scene_paths = [Path(p) for p in scene_paths]
        self.odometry_type = odometry_type
        self.use_registration = use_registration
        self.center_object = center_object

        mask_folder = "mask-plane" if mask_type == "plane" else "mask"

        self.mask_paths, self.depth_paths, self.color_paths = [], [], []
        self.intrinsics, extrinsics_list, points_list = [], [], []

        for path in self.scene_paths:
            intrinsic = self.load_intrinsics(path)
            mask_dir = path / mask_folder
            if not mask_dir.exists():
                raise ValueError(f"Mask directory {mask_dir!s} does not exist.")
            mask_paths = sorted(mask_dir.glob("*.png"))
            valid_ids = [int(p.stem) for p in mask_paths]
            self.mask_paths.extend(mask_paths)
            self.depth_paths.extend(path / "depth" / p.name
                                    for p in mask_paths)
            self.color_paths.extend(path / "color" / p.with_suffix(".jpg").name
                                    for p in mask_paths)
            self.intrinsics.extend([intrinsic] * len(valid_ids))

            if odometry_type is not None:
                extrinsics = self.load_extrinsics(path)[valid_ids]
                extrinsics_list.append(extrinsics)
                points_list.append(self.load_points(path))

        self.intrinsics = np.stack(self.intrinsics)

        if odometry_type is not None:
            self.extrinsics = np.concatenate(extrinsics_list)
            self.quaternions = three.extrinsic_to_quat(
                jnp.asarray(self.extrinsics))
            points = np.concatenate(points_list)
            keep = np.asarray(filter_outliers(points, contamination=0.1))
            self.points = points[keep]
            self.centroid = np.asarray(
                three.points_centroid(jnp.asarray(self.points)))
        elif object_scale == "auto":
            raise ValueError(
                "object_scale cannot be auto if odometry is not given.")

        if ref_points is not None:
            self.points = np.asarray(ref_points)
            self.centroid = np.asarray(
                three.points_centroid(jnp.asarray(self.points)))

        if object_scale == "auto":
            object_scale = 1.2 / float(
                three.points_bounding_size(jnp.asarray(self.points)))

        self.image_scale = image_scale
        self.object_scale = object_scale

    # ------------------------------------------------------------------- io
    def load_intrinsics(self, path):
        """Open3D intrinsics JSON (column-major!; reference: realsense.py:170-176)."""
        with open(path / "intrinsics.json") as f:
            data = json.load(f)
        k = np.asarray(data["intrinsic_matrix"],
                       dtype=np.float32).reshape(3, 3).T
        return np.concatenate([k, np.zeros((3, 1), np.float32)], axis=1)

    def load_extrinsics(self, path):
        """(reference: realsense.py:178-196)"""
        if self.odometry_type == "open3d":
            extrinsics = read_open3d_trajectory(path / "scene" / "trajectory.log")
        elif self.odometry_type == "kinectfusion":
            extrinsics = read_kinectfusion_trajectory(
                path / "scene_kf" / "poses.txt")
        else:
            raise ValueError(f"Unknown odometry_type {self.odometry_type!r}")
        if self.use_registration:
            transform = self.load_registration(path)
            inv = np.asarray(three.inverse_transform(jnp.asarray(transform)))
            extrinsics = extrinsics @ inv[None]
        return extrinsics

    def load_points(self, path):
        """(reference: realsense.py:198-212)"""
        if self.odometry_type == "open3d":
            ply = path / "scene" / "integrated_cropped.ply"
        else:
            ply = path / "scene_kf" / "integrated_cropped.ply"
        points = _load_ply_mesh(ply)["vertices"]
        if self.use_registration:
            transform = self.load_registration(path)
            points = np.asarray(three.transform_coords(
                jnp.asarray(points)[None], jnp.asarray(transform)[None]))[0]
        return points

    def load_registration(self, path):
        """(reference: realsense.py:214-229)"""
        if not self.use_registration:
            return np.eye(4, dtype=np.float32)
        reg_path = path / "registration" / "manual.json"
        if not reg_path.exists():
            reg_path = path / "registration" / "registration.json"
        if not reg_path.exists():
            return np.eye(4, dtype=np.float32)
        with open(reg_path) as f:
            logger.info("using registration %s", reg_path)
            return np.asarray(json.load(f)["transform"], dtype=np.float32)

    # ------------------------------------------------------- normalization
    def normalize_points(self, points):
        return jnp.asarray(points) * self.object_scale

    def normalize_extrinsic(self, extrinsic):
        extrinsic = jnp.asarray(extrinsic)
        if self.center_object:
            extrinsic = three.translate_matrix(extrinsic,
                                               -jnp.asarray(self.centroid))
        return extrinsic.at[..., :3, 3].multiply(self.object_scale)

    def denormalize_extrinsic(self, extrinsic):
        extrinsic = jnp.asarray(extrinsic)
        extrinsic = extrinsic.at[..., :3, 3].divide(self.object_scale)
        if self.center_object:
            extrinsic = three.translate_matrix(extrinsic,
                                               jnp.asarray(self.centroid))
        return extrinsic

    def normalize_intrinsic(self, intrinsic):
        return jnp.asarray(intrinsic).at[..., :2, :].multiply(self.image_scale)

    def denormalize_intrinsic(self, intrinsic):
        return jnp.asarray(intrinsic).at[..., :2, :].divide(self.image_scale)

    def sample_evenly(self, n):
        positions = three.extrinsic_to_position(jnp.asarray(self.extrinsics))

        def dist(a, b):
            return jnp.linalg.norm(a - b, axis=-1)

        _, inds = three.utils.farthest_points(positions, n_clusters=n,
                                              dist_func=dist,
                                              return_center_indexes=True)
        return inds

    # ------------------------------------------------------------- item API
    def __len__(self):
        return len(self.color_paths)

    def get_ids(self):
        return [p.stem for p in self.mask_paths]

    def __getitem__(self, idx):
        import imageio.v2 as imageio

        color = _resize(np.asarray(imageio.imread(self.color_paths[idx])),
                        self.image_scale)
        color = color.astype(np.float32).transpose(2, 0, 1) / 255.0
        mask = _resize(np.asarray(imageio.imread(self.mask_paths[idx])),
                       self.image_scale)
        if mask.ndim > 2:
            mask = mask[..., 0]
        mask = mask.astype(bool)
        depth = _resize(np.asarray(imageio.imread(self.depth_paths[idx])),
                        self.image_scale)
        depth = depth.astype(np.float32) / 1000.0 * self.object_scale

        intrinsic = np.asarray(self.normalize_intrinsic(self.intrinsics[idx]))
        if self.odometry_type is not None:
            extrinsic = np.asarray(
                self.normalize_extrinsic(self.extrinsics[idx]))
        else:
            extrinsic = np.eye(4, dtype=np.float32)

        return {"color": color, "mask": mask, "depth": depth,
                "extrinsic": extrinsic, "intrinsic": intrinsic}
