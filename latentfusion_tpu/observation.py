"""RGB-D observation container.

Behavioral reference: ``latentfusion/observation.py``. An Observation bundles
color (B,3,H,W), depth (B,1,H,W in meters * object_scale), mask (B,1,H,W),
a Camera, and meta flags ``is_zoomed / is_prepared / is_normalized`` that gate
the preprocessing pipeline. Registered as a pytree so observations flow
through jit/vmap/shard boundaries.
"""
from __future__ import annotations

import copy
import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from .augment import gan_denormalize, gan_normalize
from .camera import Camera


def render_observation(renderer, scene) -> "Observation":
    """Render the scene into an Observation
    (reference: observation.py:20-29)."""
    color, depth, mask = renderer.render(scene)
    camera = Camera(scene.intrinsic, scene.extrinsic,
                    width=renderer.width, height=renderer.height)
    return Observation(jnp.moveaxis(color, -1, 0)[None], depth[None, None],
                       mask[None, None], camera,
                       object_scale=scene.obj.scale)


def render_random_observations(renderer, scene, n, x_bound=(0.0, 0.0),
                               y_bound=(0.0, 0.0), z_bound=(0.5, 0.5),
                               disk_sample_quats=True, frame="default",
                               key=None) -> "Observation":
    """Synthetic-evaluation generator: n observations at random poses
    (reference: observation.py:32-49)."""
    from . import three
    from .three import quaternion as quat_mod

    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    translations = three.random_translation(k1, n, x_bound, y_bound, z_bound)
    if disk_sample_quats:
        quaternions = three.orientation.evenly_distributed_quats(n, key=k2)
    else:
        quaternions = quat_mod.random(k2, n)
    observations = []
    for trans, quat in zip(translations, quaternions):
        scene.set_pose(trans, quat, frame=frame)
        observations.append(render_observation(renderer, scene))
    return Observation.collate(observations)


def sample_eval_observations(renderer, scene, x_bound=(0, 0), y_bound=(0, 0),
                             z_bound=(0.5, 0.5), rot_std_rad=None,
                             trans_std_m=(0.01, 0.01, 0.05), key=None):
    """Reference/target pair with a bounded pose perturbation — the
    reference's integration-test rig (reference: observation.py:52-68)."""
    import math

    from . import three
    from .three import quaternion as quat_mod

    if rot_std_rad is None:
        rot_std_rad = math.pi / 12
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ref_trans = three.random_translation(k1, 1, x_bound, y_bound, z_bound)[0]
    ref_quat = quat_mod.random(k2, 1)[0]
    scene.set_pose(ref_trans, ref_quat)
    ref_obs = render_observation(renderer, scene)

    tar_quat = quat_mod.perturb(k3, ref_quat, rot_std_rad)
    # Resample while angle > 45 deg (bounded retries).
    for i in range(16):
        d = quat_mod.angular_distance(tar_quat[None], ref_quat[None])[0, 0]
        if float(d) < math.pi / 4:
            break
        k3, sub = jax.random.split(k3)
        tar_quat = quat_mod.perturb(sub, ref_quat, rot_std_rad)
    tar_trans = ref_trans + jax.random.normal(k4, (3,)) * jnp.asarray(
        trans_std_m)
    scene.set_pose(tar_trans, tar_quat)
    tar_obs = render_observation(renderer, scene)
    return ref_obs, tar_obs


@jax.tree_util.register_pytree_node_class
class Observation:
    """(reference: observation.py:71-110)"""

    def __init__(self, color, depth, mask, camera: Camera, **kwargs):
        color = jnp.asarray(color, dtype=jnp.float32)
        depth = jnp.asarray(depth, dtype=jnp.float32)
        mask = jnp.asarray(mask, dtype=jnp.float32)
        if color.ndim == 3:
            color = color[None]
        if depth.ndim == 3:
            depth = depth[None]
        if mask.ndim == 3:
            mask = mask[None]
        self.color = color
        self.depth = depth
        self.mask = mask
        self.camera = camera
        self.meta = {
            "object_scale": kwargs.get("object_scale", 1.0),
            "is_zoomed": kwargs.get("is_zoomed", False),
            "is_normalized": kwargs.get("is_normalized", False),
            "is_prepared": kwargs.get("is_prepared", False),
        }

    # ------------------------------------------------------------------ pytree
    def tree_flatten(self):
        return (self.color, self.depth, self.mask, self.camera), tuple(
            sorted(self.meta.items()))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.color, obj.depth, obj.mask, obj.camera = children
        obj.meta = dict(aux)
        return obj

    # ------------------------------------------------------------ constructors
    @classmethod
    def from_dataset(cls, dataset, inds=None):
        """Load + collate items from a map-style dataset
        (reference: observation.py:73-79)."""
        from .data.loader import collate

        if inds is None:
            inds = range(len(dataset))
        return cls.from_dict(collate([dataset[int(i)] for i in inds]))

    @classmethod
    def from_dict(cls, d):
        """(reference: observation.py:81-88)"""
        height, width = d["color"].shape[-2:]
        camera = Camera(d["intrinsic"], d["extrinsic"], width=width, height=height)
        depth = jnp.asarray(d["depth"], dtype=jnp.float32)
        mask = jnp.asarray(d["mask"], dtype=jnp.float32)
        return cls(d["color"], depth[..., None, :, :], mask[..., None, :, :],
                   camera)

    @classmethod
    def collate(cls, observations):
        """(reference: observation.py:136-142)"""
        color = jnp.concatenate([o.color for o in observations], axis=0)
        depth = jnp.concatenate([o.depth for o in observations], axis=0)
        mask = jnp.concatenate([o.mask for o in observations], axis=0)
        camera = Camera.cat([o.camera for o in observations])
        return cls(color, depth, mask, camera, **observations[0].meta)

    # ----------------------------------------------------------------- basics
    def __len__(self):
        return len(self.camera)

    def __getitem__(self, item):
        if isinstance(item, int):
            item = slice(item, item + 1)
        return Observation(self.color[item], self.depth[item], self.mask[item],
                           self.camera[item], **self.meta)

    def clone(self):
        return Observation(self.color, self.depth, self.mask,
                           self.camera.clone(), **self.meta)

    def to_list(self):
        return [self[i] for i in range(len(self))]

    def to(self, device=None):
        return self

    def expand(self, n: int):
        """(reference: observation.py:153-162)"""
        if len(self) > 1:
            raise ValueError(f"Must be single but has batch size {len(self)}.")
        return Observation(
            jnp.broadcast_to(self.color, (n, *self.color.shape[1:])),
            jnp.broadcast_to(self.depth, (n, *self.depth.shape[1:])),
            jnp.broadcast_to(self.mask, (n, *self.mask.shape[1:])),
            self.camera.repeat(n), **self.meta)

    # --------------------------------------------------------------- disk I/O
    def save(self, path):
        """PNG + cameras.json round trip (reference: observation.py:164-186)."""
        import imageio.v2 as imageio

        path = Path(path)
        path.mkdir(exist_ok=True, parents=True)
        camera_json = {
            k: (np.asarray(v).tolist() if isinstance(v, jnp.ndarray) else v)
            for k, v in self.camera.to_kwargs().items()
        }
        camera_json["meta"] = self.meta
        with open(path / "cameras.json", "w") as f:
            json.dump(camera_json, f, indent=2)

        for i in range(len(self)):
            color_im = (255.0 * np.asarray(self.color[i]).transpose(1, 2, 0)
                        ).astype(np.uint8)
            depth_im = (1000.0 * np.asarray(self.depth[i][0])).astype(np.uint16)
            mask_im = (np.asarray(self.mask[i][0]) > 0.5).astype(np.uint8) * 255
            imageio.imsave(path / f"{i:04d}.color.png", color_im)
            imageio.imsave(path / f"{i:04d}.depth.png", depth_im)
            imageio.imsave(path / f"{i:04d}.mask.png", mask_im)

    @classmethod
    def load(cls, path, frames=None) -> "Observation":
        """(reference: observation.py:188-223)"""
        import imageio.v2 as imageio

        path = Path(path)
        with open(path / "cameras.json", "r") as f:
            camera_json = json.load(f)
        meta = camera_json.pop("meta", {})
        cameras = Camera(**{
            k: jnp.asarray(v, dtype=jnp.float32) if isinstance(v, list) else v
            for k, v in camera_json.items()
        })
        if frames is None:
            inds = list(range(len(cameras)))
        elif isinstance(frames, int):
            inds = [frames]
        else:
            inds = list(frames)
        cameras = Camera.cat([cameras[i] for i in inds])

        colors, depths, masks = [], [], []
        for i in inds:
            colors.append(np.asarray(
                imageio.imread(path / f"{i:04d}.color.png"),
                dtype=np.float32) / 255.0)
            depths.append(np.asarray(
                imageio.imread(path / f"{i:04d}.depth.png"),
                dtype=np.float32) / 1000.0)
            masks.append(np.asarray(
                imageio.imread(path / f"{i:04d}.mask.png")) > 0)
        color = jnp.asarray(np.stack(colors).transpose(0, 3, 1, 2))
        depth = jnp.asarray(np.stack(depths))[:, None]
        mask = jnp.asarray(np.stack(masks).astype(np.float32))[:, None]
        return cls(color, depth, mask, cameras, **meta)

    # ----------------------------------------------------------- preprocessing
    def zoom(self, target_dist, target_size, camera: Camera = None):
        """(reference: observation.py:225-236)"""
        if camera is None:
            camera = self.camera
        color, new_camera = camera.zoom(self.color, target_size, target_dist,
                                        scale_mode="bilinear")
        depth, _ = camera.zoom(self.depth, target_size, target_dist,
                               scale_mode="nearest")
        mask, _ = camera.zoom(self.mask, target_size, target_dist,
                              scale_mode="nearest")
        kwargs = copy.deepcopy(self.meta)
        kwargs["is_zoomed"] = True
        return Observation(color, depth, mask, new_camera, **kwargs)

    def uncrop(self, camera: Camera = None):
        """(reference: observation.py:238-249)"""
        if camera is None:
            camera = self.camera
        color, new_camera = camera.uncrop(self.color, scale_mode="bilinear")
        depth, _ = camera.uncrop(self.depth, scale_mode="nearest")
        mask, _ = camera.uncrop(self.mask, scale_mode="nearest")
        kwargs = copy.deepcopy(self.meta)
        kwargs["is_zoomed"] = False
        return Observation(color, depth, mask, new_camera, **kwargs)

    def prepare(self, crop_color: bool = True, crop_depth: bool = True):
        """Mask out background (reference: observation.py:251-264)."""
        if crop_color:
            color = gan_denormalize(gan_normalize(self.color) * self.mask)
        else:
            color = self.color
        depth = self.depth * self.mask if crop_depth else self.depth
        kwargs = copy.deepcopy(self.meta)
        kwargs["is_prepared"] = True
        return Observation(color, depth, self.mask, self.camera.clone(), **kwargs)

    def normalize(self):
        """(reference: observation.py:266-273)"""
        color = gan_normalize(self.color)
        depth = self.camera.normalize_depth(self.depth)
        kwargs = copy.deepcopy(self.meta)
        kwargs["is_normalized"] = True
        return Observation(color, depth, self.mask, self.camera.clone(), **kwargs)

    def denormalize(self):
        """(reference: observation.py:275-282)"""
        color = gan_denormalize(self.color)
        depth = self.camera.denormalize_depth(self.depth)
        kwargs = copy.deepcopy(self.meta)
        kwargs["is_normalized"] = False
        return Observation(color, depth, self.mask, self.camera.clone(), **kwargs)

    # ------------------------------------------------------------- geometry
    def estimate_camera(self) -> Camera:
        """Translation-only init (reference: observation.py:284-287)."""
        from .pose.initialization import estimate_initial_pose

        return estimate_initial_pose(self.depth, self.mask,
                                     self.camera.intrinsic,
                                     self.camera.width, self.camera.height)

    def zoom_estimate(self, target_dist, target_size):
        return self.zoom(target_dist, target_size, camera=self.estimate_camera())

    def pointcloud(self, frame: str = "object", return_colors: bool = False,
                   segment: bool = True):
        """Backproject to a point cloud. With ``segment=True`` returns
        (points, valid_mask) of fixed shape (jit-friendly; the reference
        returns ragged arrays, observation.py:292-316)."""
        if frame == "object":
            points = jnp.stack(
                self.camera.depth_object_coords(self.depth), axis=-1)
        else:
            points = jnp.stack(
                self.camera.depth_camera_coords(self.depth), axis=-1)
        points = points.reshape(len(self), -1, 3)
        valid = (self.mask > 0.5).reshape(len(self), -1)
        valid = valid & (self.depth.reshape(len(self), -1) > 0)
        if return_colors:
            colors = self.color.transpose(0, 2, 3, 1).reshape(len(self), -1, 3)
            if segment:
                return points, colors, valid
            return points, colors
        if segment:
            return points, valid
        return points

    def dilate(self, kernel_size: int = 5):
        """Mask dilation with mean-color padding (reference: observation.py:318-329)."""
        from . import imutils

        pad_color = imutils.mean_color(self.color, self.mask).mean(axis=0)
        pad_color = jnp.broadcast_to(pad_color.reshape(1, 3, 1, 1),
                                     self.color.shape)
        fg_mask = self.mask
        dilated_mask = imutils.dilate(self.mask, 1, kernel_size)
        pad_mask = dilated_mask - fg_mask
        bg_mask = jnp.clip(1.0 - dilated_mask, 0, None)
        color = fg_mask * self.color + bg_mask * self.color + pad_mask * pad_color
        out = self.clone()
        out.color = color
        out.mask = dilated_mask
        return out
