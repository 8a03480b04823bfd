"""Multi-view volume fusers.

Behavioral reference: ``latentfusion/recon/fusion.py``. Fusers merge per-view
object-space volumes (B, V, C, D, H, W) -> (B, 1, C, D, H, W).

Pool/concat fusers are parameter-free; Blend/GRU/LSTM carry flax params. All
expose ``__call__(z_obj, z_cam_mid, z_obj_mid, camera) -> (z_fused, extra)``.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..camera import Camera
from ..functional import absolute_max_pool
from ..modules.gru import ConvGRUCell
from ..modules.lstm import ConvLSTMCell
from ..modules.unet import BaseUNet
from ..three.batchview import b2bv, bv2b
from ..transforms import camera_to_object
from . import utils


def pool_tensor(tensor, pool_type: str, axis: int = 0):
    """(reference: fusion.py:45-57)"""
    if pool_type == "max":
        return tensor.max(axis=axis, keepdims=True)
    elif pool_type == "abs_max":
        return absolute_max_pool(tensor, axis=axis)
    elif pool_type == "mean":
        return tensor.mean(axis=axis, keepdims=True)
    elif pool_type == "median":
        return jnp.median(tensor, axis=axis, keepdims=True)
    raise ValueError(f"Unknown pool_type value {pool_type}")


class PoolFuser(nn.Module):
    """(reference: fusion.py:60-66)"""

    pool_type: str = "mean"

    def __call__(self, z_obj, z_cam_mid, z_obj_mid, camera):
        return pool_tensor(z_obj, self.pool_type, axis=1), {}


class ConcatFuser(nn.Module):
    """Views -> channels (reference: fusion.py:87-92)."""

    def __call__(self, z_obj, z_cam_mid, z_obj_mid, camera):
        n, v, c, d, h, w = z_obj.shape
        return z_obj.reshape(n, 1, v * c, d, h, w), {}


class BlendFuser(nn.Module):
    """3D U-Net predicts per-view voxel blend weights, softmaxed over views
    after transforming to object space (reference: fusion.py:95-149)."""

    block_config: Any
    in_channels: int
    cube_size: float = 1.0

    def setup(self):
        self.unet = BaseUNet(self.in_channels + 1, 1, self.block_config, ndim=3)

    def compute_blend_weights(self, z_cam, camera: Camera):
        num_views = z_cam.shape[1]
        z_cam = bv2b(z_cam)
        coords = utils.get_normalized_voxel_depth(z_cam)
        w = jnp.concatenate((z_cam, coords), axis=1)
        w = self.unet(w)
        w = camera_to_object(w, camera, self.cube_size)
        w = b2bv(w, num_views)
        return jax.nn.softmax(w, axis=1)

    def __call__(self, z_obj, z_cam_mid, z_obj_mid, camera):
        blend_weights = self.compute_blend_weights(z_cam_mid[-1], camera)
        extra = {"blend_weights": blend_weights.squeeze(2)}
        z_fused = jnp.sum(z_obj * blend_weights, axis=1, keepdims=True)
        return z_fused, extra


class GRUFuser(nn.Module):
    """Recurrent fold over views; hidden state initialized to view 0, input =
    view feature ⊕ normalized voxel coords (reference: fusion.py:152-206).
    The default trained fuser (train.sh).

    ``scan_views`` folds the views with ``nn.scan`` (one traced cell)
    instead of unrolling V-1 cell calls. Measured on TPU v5e at flagship
    shapes (tools/bench_fuser.py): identical fold time (22.7 vs 22.8 ms at
    24 views) with V-independent compile (~10 s vs up to 56 s unrolled), so
    scan is the default; see docs/ARCHITECTURE.md (VERDICT r1 item #8).
    """

    in_channels: int
    cube_size: float = 1.0
    ndim: int = 3
    scan_views: bool = True

    def setup(self):
        num_coord_channels = 2 if self.ndim == 2 else 3
        self.gru = ConvGRUCell(self.in_channels + num_coord_channels,
                               self.in_channels, kernel_size=3, ndim=self.ndim)

    def __call__(self, z_obj, z_cam_mid, z_obj_mid, camera):
        num_views = z_obj.shape[1]
        h = z_obj[:, 0]
        if self.ndim == 2:
            coords = utils.get_normalized_pixel_coords(h)
        else:
            coords = utils.get_normalized_voxel_coords(h)

        if self.scan_views and num_views > 1:
            xs = jnp.moveaxis(z_obj[:, 1:], 1, 0)  # (V-1, B, C, ...)

            def step(cell, carry, x):
                xi = jnp.concatenate((x, coords), axis=1)
                return cell(xi, carry), None

            scan = nn.scan(step, variable_broadcast="params",
                           split_rngs={"params": False})
            h, _ = scan(self.gru, h, xs)
            return h[:, None], {}

        # V is static; the unrolled loop matches the reference's Python loop
        # and lets XLA pipeline the (shared-weight) conv chain.
        for i in range(1, num_views):
            x = jnp.concatenate((z_obj[:, i], coords), axis=1)
            h = self.gru(x, h)
        return h[:, None], {}


class LSTMFuser(nn.Module):
    """(reference: fusion.py:209-246). ``scan_views`` as in GRUFuser."""

    in_channels: int
    cube_size: float = 1.0
    scan_views: bool = True

    def setup(self):
        self.lstm = ConvLSTMCell(self.in_channels + 3, self.in_channels,
                                 kernel_size=3, ndim=3)

    def __call__(self, z_obj, z_cam_mid, z_obj_mid, camera):
        num_views = z_obj.shape[1]
        h = z_obj[:, 0]
        c = jnp.zeros_like(h)
        coords = utils.get_normalized_voxel_coords(h)

        if self.scan_views and num_views > 1:
            xs = jnp.moveaxis(z_obj[:, 1:], 1, 0)

            def step(cell, carry, x):
                xi = jnp.concatenate((x, coords), axis=1)
                return cell(xi, carry), None

            scan = nn.scan(step, variable_broadcast="params",
                           split_rngs={"params": False})
            (h, c), _ = scan(self.lstm, (h, c), xs)
            return h[:, None], {}

        for i in range(1, num_views):
            x = jnp.concatenate((z_obj[:, i], coords), axis=1)
            h, c = self.lstm(x, (h, c))
        return h[:, None], {}


def get_fuser(fuser_type: str, in_channels: int, cube_size: float,
              block_config=None) -> nn.Module:
    """Factory (reference: fusion.py:17-38)."""
    if fuser_type.startswith("pool:"):
        _, pool_type = fuser_type.split(":")
        return PoolFuser(pool_type)
    elif fuser_type == "concat":
        return ConcatFuser()
    elif fuser_type == "blend":
        return BlendFuser(block_config=block_config, in_channels=in_channels,
                          cube_size=cube_size)
    elif fuser_type == "gru":
        return GRUFuser(in_channels=in_channels, cube_size=cube_size)
    elif fuser_type == "lstm":
        return LSTMFuser(in_channels=in_channels, cube_size=cube_size)
    raise ValueError(f"Unknown fuser type {fuser_type!r}")


_FUSER_TYPES = {
    "PoolFuser": PoolFuser,
    "ConcatFuser": ConcatFuser,
    "BlendFuser": BlendFuser,
    "GRUFuser": GRUFuser,
    "LSTMFuser": LSTMFuser,
}


def fuser_from_checkpoint_args(type_name: str, args: Optional[dict]) -> nn.Module:
    """Reconstruct a fuser from its checkpoint ``type`` + ``args``
    (reference: fusion.py:41-42, 62-69)."""
    cls = _FUSER_TYPES[type_name]
    args = dict(args or {})
    args.pop("conv_module", None)
    return cls(**args)
