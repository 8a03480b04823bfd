"""Initial pose from depth + mask (translation only).

Behavioral reference: ``latentfusion/pose/initialization.py``. The reference
uses skimage CPU erosion and ragged nonzero()/median() calls; here everything
is fixed-shape jnp (nan-masked medians, where-based bbox extraction) so the
whole initializer jits and runs on-device.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import imutils, three
from ..camera import Camera
from ..three import quaternion


def masks_to_viewports(masks, pad: float = 10.0):
    """Mask bbox (xmin, ymin, xmax, ymax) + padding
    (reference: initialization.py:8-24)."""
    m = masks.reshape(masks.shape[0], *masks.shape[-2:]) > 0
    height, width = m.shape[-2:]
    yy, xx = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    big = jnp.float32(1e9)
    xmin = jnp.where(m, xx[None], big).min(axis=(-2, -1))
    ymin = jnp.where(m, yy[None], big).min(axis=(-2, -1))
    xmax = jnp.where(m, xx[None], -big).max(axis=(-2, -1))
    ymax = jnp.where(m, yy[None], -big).max(axis=(-2, -1))
    viewports = jnp.stack([xmin, ymin, xmax, ymax], axis=-1)
    padding = jnp.asarray([-pad, -pad, pad, pad], dtype=jnp.float32)
    return viewports + padding


def masks_to_centroids(masks):
    """(reference: initialization.py:27-33)"""
    viewports = masks_to_viewports(masks, 0.0)
    cu = (viewports[:, 2] + viewports[:, 0]) / 2.0
    cv = (viewports[:, 3] + viewports[:, 1]) / 2.0
    return jnp.stack((cu, cv), axis=-1)


def _reject_outliers_mad_bounds(values, valid, m: float = 3.0):
    """Min/max of MAD-inliers among ``valid`` entries (fixed-shape; reference:
    initialization.py:55-60, 63-76 returns ragged arrays)."""
    nanvals = jnp.where(valid, values, jnp.nan)
    median = jnp.nanmedian(nanvals)
    mad = jnp.nanmedian(jnp.abs(nanvals - median))
    inlier = valid & (jnp.abs(values - median) / jnp.maximum(mad, 1e-12) < m)
    inl = jnp.where(inlier, values, jnp.nan)
    return jnp.nanmin(inl), jnp.nanmax(inl)


def estimate_camera_dist(depth, mask):
    """Depth of the object = midpoint of robust depth range inside the eroded
    mask (reference: initialization.py:63-76)."""
    num_batch = depth.shape[0]
    m = mask.reshape(num_batch, *mask.shape[-2:]) > 0
    d = depth.reshape(num_batch, *depth.shape[-2:])
    eroded = imutils.erode_disk(m.astype(jnp.float32), 3) > 0.5
    # Fall back to the raw mask if erosion wiped it out.
    use = jnp.where(eroded.sum(axis=(-2, -1), keepdims=True) >= 10, eroded, m)
    valid = use & (d > 0.0)

    zs = []
    for i in range(num_batch):
        lo, hi = _reject_outliers_mad_bounds(d[i].reshape(-1),
                                             valid[i].reshape(-1))
        zs.append((lo + hi) / 2.0)
    return jnp.stack(zs)


def estimate_translation(depth, mask, intrinsic):
    """(reference: initialization.py:79-90)"""
    z_cam = estimate_camera_dist(depth, mask)
    centroid_uv = masks_to_centroids(mask)
    u0 = intrinsic[..., 0, 2]
    v0 = intrinsic[..., 1, 2]
    fu = intrinsic[..., 0, 0]
    fv = intrinsic[..., 1, 1]
    x_cam = (centroid_uv[:, 0] - u0) / fu * z_cam
    y_cam = (centroid_uv[:, 1] - v0) / fv * z_cam
    return x_cam, y_cam, z_cam


def estimate_initial_pose(depth, mask, intrinsic, width, height) -> Camera:
    """(reference: initialization.py:93-101)"""
    translation = jnp.stack(estimate_translation(depth, mask, intrinsic),
                            axis=-1)
    rotation = quaternion.identity(intrinsic.shape[0])
    extrinsic = three.to_extrinsic_matrix(translation, rotation)
    return Camera(intrinsic, extrinsic, height=height, width=width)
