"""Reconstruction utilities (behavioral reference: ``latentfusion/recon/utils.py``)."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..augment import gan_normalize
from ..camera import Camera
from ..three import quaternion
from ..three.batchview import b2bv, bv2b


def optimal_camera_dist(focal_length, size, radius, slack=1.5):
    """Auto camera distance so the object fits the view
    (reference: recon/utils.py:13-25)."""
    theta = math.atan2(size / 2.0, focal_length)
    r = radius
    h = radius * math.cos(theta)
    x = h / math.sin(theta)
    d = math.sqrt(x ** 2 + r ** 2 - 2 * x * r * math.cos(math.pi / 2.0 - theta))
    return d + slack


def get_normalized_voxel_coords(tensor):
    """(B, C, D, H, W) -> (B, 3, D, H, W) coords in [-1, 1], stacked (z, y, x)
    (reference: recon/utils.py:38-46)."""
    depth, height, width = tensor.shape[-3:]
    z, y, x = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, depth),
        jnp.linspace(-1.0, 1.0, height),
        jnp.linspace(-1.0, 1.0, width),
        indexing="ij",
    )
    coords = jnp.stack((z, y, x), axis=0)
    return jnp.broadcast_to(coords[None], (tensor.shape[0], 3, depth, height, width))


def get_normalized_pixel_coords(tensor):
    """(B, C, H, W) -> (B, 2, H, W) coords in [-1, 1], stacked (y, x)
    (reference: recon/utils.py:49-56)."""
    height, width = tensor.shape[-2:]
    y, x = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, height),
        jnp.linspace(-1.0, 1.0, width),
        indexing="ij",
    )
    coords = jnp.stack((y, x), axis=0)
    return jnp.broadcast_to(coords[None], (tensor.shape[0], 2, height, width))


def get_normalized_voxel_depth(tensor):
    """(B, C, D, H, W) -> (B, 1, D, H, W) z coordinate in [-1, 1]
    (reference: recon/utils.py:59-64). Under the channels-last layout
    policy: (B, D, H, W, C) -> (B, D, H, W, 1)."""
    from ..layout import channels_last

    if channels_last():
        b, d, h, w, _ = tensor.shape
        z = jnp.linspace(-1.0, 1.0, d).reshape(1, d, 1, 1, 1)
        return jnp.broadcast_to(z, (b, d, h, w, 1))
    b, _, d, h, w = tensor.shape
    z = jnp.linspace(-1.0, 1.0, d).reshape(1, 1, d, 1, 1)
    return jnp.broadcast_to(z, (b, 1, d, h, w))


def mask_normalized_depth(depth, mask):
    """(reference: recon/utils.py:67-68)"""
    return ((depth / 2.0 + 0.5) * mask) * 2.0 - 1.0


def _process_group(group, rotation, cube_size, camera_dist, input_size, is_gt):
    """(reference: recon/utils.py:71-107 ``_process_batch``)"""
    batch_size = group["mask"].shape[0]
    extrinsic = bv2b(jnp.asarray(group["extrinsic"]))
    intrinsic = bv2b(jnp.asarray(group["intrinsic"]))
    mask = bv2b(jnp.asarray(group["mask"])[:, :, None].astype(jnp.float32))
    image = bv2b(gan_normalize(jnp.asarray(group["render"])))
    depth = None
    if "depth" in group:
        depth = bv2b(jnp.asarray(group["depth"])[:, :, None])

    camera = Camera(intrinsic, extrinsic, z_span=cube_size / 2.0,
                    height=image.shape[2], width=image.shape[3])
    if rotation is not None:
        camera = camera.rotate(jnp.broadcast_to(rotation, (camera.length, 4)))

    out = {}
    out["image"], zoom_camera = camera.zoom(image, input_size, camera_dist,
                                            scale_mode="bilinear")
    out["camera"] = zoom_camera
    out["mask"] = camera.zoom(mask, input_size, camera_dist,
                              scale_mode="nearest")[0]
    if depth is not None:
        d = camera.zoom(depth, input_size, camera_dist, scale_mode="nearest")[0]
        out["depth"] = zoom_camera.normalize_depth(d)

    if is_gt:
        out["image"] = out["image"] * out["mask"]
        out["depth"] = mask_normalized_depth(out["depth"], out["mask"])

    for k in ("image", "depth", "mask"):
        if k in out:
            out[k] = b2bv(out[k], batch_size=batch_size)
    return out


def process_batch(batch, cube_size, camera_dist, input_size,
                  random_orientation=True, key=None):
    """Zoom a training batch to the canonical camera, optionally applying one
    shared random orientation (reference: recon/utils.py:110-127)."""
    rand_rot = None
    if random_orientation:
        if key is None:
            raise ValueError("key required for random_orientation")
        rand_rot = quaternion.random(key, 1)
    out = {}
    for k, v in batch.items():
        out[k] = _process_group(v, rand_rot, cube_size, camera_dist,
                                input_size, is_gt="gt" in k)
    return out
