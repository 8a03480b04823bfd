"""BOP-format dataset loader (LINEMOD / LM-O / T-LESS).

Behavioral reference: ``latentfusion/datasets/bop.py``. Loads per-frame
intrinsics + GT extrinsics from BOP JSON, visib masks, depth with per-frame
depth scale, and applies the unit-diameter object_scale normalization
convention. Host-side numpy; tensors convert at the device boundary.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from .. import meshutils, three
from ..three import quaternion as quat

LINEMOD_ID_TO_NAME = {
    "000001": "ape", "000002": "benchvise", "000003": "bowl",
    "000004": "camera", "000005": "can", "000006": "cat",
    "000007": "mug", "000008": "driller", "000009": "duck",
    "000010": "eggbox", "000011": "glue", "000012": "holepuncher",
    "000013": "iron", "000014": "lamp", "000015": "phone",
}
LINEMOD_NAME_TO_ID = {v: k for k, v in LINEMOD_ID_TO_NAME.items()}


def _imread(path) -> np.ndarray:
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(path))


class BOPDataset:
    """(reference: datasets/bop.py:49-236)

    Items: dict of color (3,H,W) float [0,1], mask (H,W) bool, depth (H,W)
    in meters * object_scale, extrinsic (4,4) normalized, intrinsic (3,4).
    """

    def __init__(self, dataset_path, scene_path, object_id,
                 center_object: bool = False, object_scale=None):
        self.dataset_path = Path(dataset_path)
        self.scene_path = Path(scene_path)
        self.object_id = object_id

        name = self.dataset_path.name
        if name in ("lm", "lmo"):
            base_obj_scale = 1.0
            self.models_path = self.dataset_path / "models"
        elif name == "tless":
            base_obj_scale = 0.60
            self.models_path = self.dataset_path / "models_reconst"
        else:
            raise ValueError(f"Unknown dataset type {name}")

        self.model_path = self.models_path / f"obj_{object_id:06d}.ply"
        self.pointcloud_path = (self.dataset_path / "models_eval"
                                / f"obj_{object_id:06d}.ply")

        with open(self.dataset_path / "models_eval" / "models_info.json") as f:
            self.model_info = json.load(f)[str(object_id)]

        self.center_object = center_object
        if object_scale is None:
            # Normalize to (base) unit diameter — the global object_scale
            # convention (reference: bop.py:77-80).
            self.object_scale = base_obj_scale / self.model_info["diameter"]
        else:
            self.object_scale = object_scale

        self.image_scale = 1.0
        mi = self.model_info
        self.bounds = np.asarray([
            (mi["min_x"], mi["min_x"] + mi["size_x"]),
            (mi["min_y"], mi["min_y"] + mi["size_y"]),
            (mi["min_z"], mi["min_z"] + mi["size_z"]),
        ], dtype=np.float32)
        self.centroid = self.bounds.mean(axis=1)

        self.depth_dir = self.scene_path / "depth"
        self.mask_dir = self.scene_path / "mask_visib"
        self.color_dir = self.scene_path / "rgb"

        self.intrinsics, self.depth_scales = self._load_intrinsics(
            self.scene_path / "scene_camera.json")
        self.extrinsics, self.scene_object_inds = self._load_extrinsics(
            self.scene_path / "scene_gt.json")
        self.extrinsics = np.stack(self.extrinsics)

        rotation, _ = three.decompose(jnp.asarray(self.extrinsics))
        self.quaternions = quat.mat_to_quat(rotation[:, :3, :3])

        self.depth_paths = sorted(self.depth_dir / f"{i:06d}.png"
                                  for i in self.scene_object_inds)
        self.mask_paths = [self.mask_dir / f"{i:06d}_{o:06d}.png"
                           for i, o in self.scene_object_inds.items()]
        self.color_paths = sorted(self.color_dir / f"{i:06d}.png"
                                  for i in self.scene_object_inds)
        assert len(self.depth_paths) == len(self.mask_paths)
        assert len(self.depth_paths) == len(self.color_paths)

    # ------------------------------------------------------------------- io
    @classmethod
    def _load_intrinsics(cls, path):
        """(reference: bop.py:125-139; also pose/bop.py:6-18)"""
        intrinsics, depth_scales = [], []
        with open(path) as f:
            data = json.load(f)
        for key in sorted(int(k) for k in data):
            value = data[str(key)]
            k33 = np.asarray(value["cam_K"], dtype=np.float32).reshape(3, 3)
            intrinsics.append(np.concatenate(
                [k33, np.zeros((3, 1), np.float32)], axis=1))
            depth_scales.append(value["depth_scale"])
        return intrinsics, depth_scales

    def _load_extrinsics(self, path):
        """(reference: bop.py:141-157)"""
        extrinsics = []
        scene_object_inds = {}
        with open(path) as f:
            data = json.load(f)
        for frame_ind in sorted(int(k) for k in data):
            for obj_ind, cam_d in enumerate(data[str(frame_ind)]):
                if cam_d["obj_id"] == self.object_id:
                    R = np.asarray(cam_d["cam_R_m2c"],
                                   dtype=np.float32).reshape(3, 3)
                    t = np.asarray(cam_d["cam_t_m2c"], dtype=np.float32)
                    E = np.eye(4, dtype=np.float32)
                    E[:3, :3] = R
                    E[:3, 3] = t
                    extrinsics.append(E)
                    scene_object_inds[frame_ind] = obj_ind
        return extrinsics, scene_object_inds

    def load_pointcloud(self):
        obj = meshutils.Object3D(self.pointcloud_path)
        return jnp.asarray(obj.vertices * self.object_scale)

    # -------------------------------------------------------- normalization
    def normalize_extrinsic(self, extrinsic):
        """(reference: bop.py:186-192)"""
        extrinsic = jnp.asarray(extrinsic)
        if self.center_object:
            extrinsic = three.translate_matrix(
                extrinsic, -jnp.asarray(self.centroid))
        return extrinsic.at[..., :3, 3].multiply(self.object_scale)

    def denormalize_extrinsic(self, extrinsic):
        extrinsic = jnp.asarray(extrinsic)
        extrinsic = extrinsic.at[..., :3, 3].divide(self.object_scale)
        if self.center_object:
            extrinsic = three.translate_matrix(extrinsic,
                                               jnp.asarray(self.centroid))
        return extrinsic

    def normalize_intrinsic(self, intrinsic):
        intrinsic = jnp.asarray(intrinsic)
        return intrinsic.at[..., :2, :].multiply(self.image_scale)

    def denormalize_intrinsic(self, intrinsic):
        intrinsic = jnp.asarray(intrinsic)
        return intrinsic.at[..., :2, :].divide(self.image_scale)

    # -------------------------------------------------------------- sampling
    def sample_evenly(self, n):
        """Farthest-point sampling over camera positions
        (reference: bop.py:215-221)."""
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
        return [p.stem for p in self.color_paths]

    def __getitem__(self, idx):
        color = _imread(self.color_paths[idx]).astype(np.float32) / 255.0
        color = color.transpose(2, 0, 1)
        mask = _imread(self.mask_paths[idx]).astype(bool)
        if mask.ndim > 2:
            mask = mask[..., 0]
        depth = (_imread(self.depth_paths[idx]).astype(np.float32)
                 * self.object_scale * self.depth_scales[idx])
        intrinsic = np.asarray(self.normalize_intrinsic(self.intrinsics[idx]))
        extrinsic = np.asarray(self.normalize_extrinsic(self.extrinsics[idx]))
        return {
            "color": color,
            "mask": mask,
            "depth": depth,
            "extrinsic": extrinsic,
            "intrinsic": intrinsic,
        }
