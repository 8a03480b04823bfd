"""Volume <-> camera-frustum resampling transforms.

Behavioral reference: ``latentfusion/modules/geometry.py:593-690``
(``CameraToObjectTransform`` / ``ObjectToCameraTransform``). These have no
parameters, so they are plain functions here; they sit inside every
encoder/decoder forward and every pose-refinement step (the hot loop).

Conventions replicated exactly from the reference (trained checkpoints
depend on them):

- the object cube spans ``[-cube_size/2, cube_size/2]`` with meshgrid order
  (z, y, x) stacked as (x, y, z);
- camera->object: grid z coordinate is ``(z - znear) / (zfar - znear)``
  (range [0, 1], NOT [-1, 1]) — geometry.py:652;
- object->camera: frustum voxel z spans ``[znear, znear + z_span]``
  (half the window) via ``Camera.camera_coords`` — geometry.py:491.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from .camera import Camera
from .ops.gather_matmul import MAX_MATMUL_VOXELS, grid_sample_3d_matmul
from .ops.grid_sample import grid_sample_3d


_VOLUME_SAMPLE_BACKEND = "auto"  # "auto" | "gather" | "matmul" | "pallas"


def get_volume_sample_backend() -> str:
    return _VOLUME_SAMPLE_BACKEND


def set_volume_sample_backend(name: str) -> None:
    """Select the 3D warp backend. 'auto' = fused Pallas sampler on TPU for
    qualifying shapes (tap tiles built in VMEM, never materialized in HBM —
    ops/pallas_fused_sample.py), one-hot MXU matmul otherwise for small
    volumes, tiled Pallas kernel for larger ones on TPU (gather elsewhere —
    the Pallas interpret path is slow off-TPU). 'taps' = channels-last
    8-corner vector gather (border padding; d/dvol is a scatter — use for
    refinement-style d/dgrid-only workloads)."""
    global _VOLUME_SAMPLE_BACKEND
    if name not in ("auto", "gather", "matmul", "pallas", "taps", "fused"):
        raise ValueError(name)
    _VOLUME_SAMPLE_BACKEND = name


def _volume_sample(volume, grid, padding_mode):
    """Dispatch between the MXU formulations (see ops/gather_matmul.py and
    ops/pallas_volume.py for why gathers lose on TPU).

    ``volume`` follows the active activation layout (layout.py): torch
    (N, C, D, H, W), or (N, D, H, W, C) channels-last. The matmul backend
    contracts natively in either layout; gather/pallas transpose at the
    boundary (they only run for volumes too large for the matmul path).
    """
    import jax

    from .layout import channels_last, from_channels_last, to_channels_last

    cl = channels_last()
    spatial = volume.shape[1:4] if cl else volume.shape[-3:]
    n_grid = grid.shape[0]
    backend = _VOLUME_SAMPLE_BACKEND
    if backend == "auto":
        from .ops.pallas_fused_sample import fused_qualifies

        n_channels = volume.shape[-1] if cl else volume.shape[1]
        k = math.prod(grid.shape[1:4])
        if (jax.default_backend() == "tpu"
                and fused_qualifies(spatial, n_channels, k)):
            backend = "fused"
        elif math.prod(spatial) <= MAX_MATMUL_VOXELS:
            backend = "matmul"
        elif jax.default_backend() == "tpu":
            backend = "pallas"
        else:
            backend = "gather"
    if backend == "fused":
        from .ops.pallas_fused_sample import grid_sample_3d_fused

        from .dtypes import get_compute_dtype as _cd

        # Keeps a shared (NV, ...) volume un-broadcast (NV | N): the kernel
        # reads each object's single block for all of its hypotheses, and
        # stores straight in the compute dtype — every consumer here is a
        # conv/GRU that would round to it anyway, so this skips a full
        # f32 round-trip through HBM (~0.8 GB/iter at the CEM shape).
        return grid_sample_3d_fused(volume, grid, padding_mode=padding_mode,
                                    channels_last=cl, out_dtype=_cd())
    if volume.shape[0] != n_grid:
        if volume.shape[0] == 1:
            volume = jnp.broadcast_to(volume, (n_grid, *volume.shape[1:]))
        else:
            # B objects sharing contiguous hypothesis blocks (object-major).
            volume = jnp.repeat(volume, n_grid // volume.shape[0], axis=0)
    if backend == "matmul":
        return grid_sample_3d_matmul(volume, grid, padding_mode=padding_mode,
                                     channels_last=cl)
    if backend == "taps":
        from .ops.gather_matmul import grid_sample_3d_taps

        vol_cl = volume if cl else to_channels_last(volume)
        out = grid_sample_3d_taps(vol_cl, grid, padding_mode=padding_mode)
        return out if cl else from_channels_last(out)
    if cl:
        volume = from_channels_last(volume)
    if backend == "pallas":
        from .ops.pallas_volume import grid_sample_3d_pallas

        out = grid_sample_3d_pallas(volume, grid, padding_mode=padding_mode)
    else:
        out = grid_sample_3d(volume, grid, padding_mode=padding_mode)
    return to_channels_last(out) if cl else out


def get_obj_coords(cube_size: float, size: int) -> jnp.ndarray:
    """Homogeneous object-cube voxel coordinates, (size^3, 4)
    (reference: geometry.py:599-611)."""
    lin = jnp.linspace(-cube_size / 2, cube_size / 2, size)
    z, y, x = jnp.meshgrid(lin, lin, lin, indexing="ij")
    ones = jnp.ones_like(x)
    return jnp.stack((x, y, z, ones), axis=-1).reshape(-1, 4)


def camera_to_object(cam_volume: jnp.ndarray, camera: Camera,
                     cube_size: float = 1.0,
                     padding_mode: str = "border") -> jnp.ndarray:
    """Unproject a camera-frustum volume onto the canonical object cube
    (reference: geometry.py:614-657).

    Args:
        cam_volume: (B, C, D, H, W) camera-space features (D == H == W);
            (B, D, H, W, C) under the channels-last layout policy.
        camera: batch-B Camera.
    Returns:
        (B, C, S, S, S) object-space volume, S = cam_volume spatial size
        (same layout as the input).
    """
    from .layout import channels_last

    size = cam_volume.shape[1 if channels_last() else -1]
    b = cam_volume.shape[0]
    obj_coords = get_obj_coords(cube_size, size)  # (S^3, 4)
    obj_coords = jnp.broadcast_to(obj_coords.T[None], (b, 4, obj_coords.shape[0]))
    cam_coords = camera.obj_to_cam @ obj_coords

    # Project onto the camera volume: x,y are pixel coords (perspective
    # divided), z remains the undivided camera depth.
    pixel_coords = camera.intrinsic @ cam_coords
    xy = pixel_coords[:, :2] / pixel_coords[:, 2:3]
    z = pixel_coords[:, 2]

    znear = camera.znear[:, None]
    zfar = camera.zfar[:, None]

    grid_coords = jnp.stack(
        (
            (xy[:, 0] - camera.viewport[:, 0, None]) / camera.viewport_width[:, None] * 2 - 1,
            (xy[:, 1] - camera.viewport[:, 1, None]) / camera.viewport_height[:, None] * 2 - 1,
            (z - znear) / (zfar - znear),
        ),
        axis=-1,
    )
    grid = grid_coords.reshape(-1, size, size, size, 3)
    return _volume_sample(cam_volume, grid, padding_mode)


def object_to_camera(obj_volume: jnp.ndarray, camera: Camera,
                     cube_size: float = 1.0,
                     padding_mode: str = "border") -> jnp.ndarray:
    """Sample the object cube at camera-frustum voxel centers
    (reference: geometry.py:660-690).

    Args:
        obj_volume: (B or 1, C, S, S, S) object-space features (channels
            last under the layout policy); broadcast to the camera batch if
            B == 1.
    Returns:
        (len(camera), C, S, S, S) camera-space volume (same layout).
    """
    from .layout import channels_last

    size = obj_volume.shape[1 if channels_last() else -1]
    x_cam, y_cam, z_cam = camera.camera_coords(size)
    cam_coords = jnp.stack(
        (x_cam, y_cam, z_cam, jnp.ones_like(x_cam)), axis=-1
    ).reshape(camera.length, -1, 4)
    obj_coords = camera.cam_to_obj @ jnp.swapaxes(cam_coords, 2, 1)
    obj_coords = jnp.swapaxes(obj_coords[:, :3, :], 1, 2)
    grid_coords = obj_coords / (cube_size / 2)
    grid = grid_coords.reshape(-1, size, size, size, 3)

    # The per-hypothesis broadcast of a shared latent is deferred to
    # _volume_sample: the fused Pallas backend reads the single volume
    # block directly (no N-way HBM materialization); the XLA backends
    # broadcast lazily (fused into their consumers).
    return _volume_sample(obj_volume, grid, padding_mode)
