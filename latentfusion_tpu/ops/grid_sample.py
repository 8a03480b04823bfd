"""Differentiable grid sampling (2D bilinear / 3D trilinear / nearest).

This is the framework's hot kernel: the reference leans on
``F.grid_sample`` for image zoom/uncrop (2D) and for the camera<->object
volume transforms (3D) inside every forward/backward of both reconstruction
and pose refinement (reference: latentfusion/modules/geometry.py:16-17,
625-657, 669-690).

Semantics replicate torch's defaults exactly (``align_corners=False``):

- unnormalize: ``ix = ((x + 1) * W - 1) / 2``
- ``padding_mode='zeros'``: out-of-bounds taps contribute zero
- ``padding_mode='border'``: coordinates are clamped into bounds first
- ``mode='nearest'``: round-half-to-even (torch uses std::nearbyint)

The implementation here is XLA gather based (one flattened gather per corner
tap, fused weighting) — the correctness reference. The production 3D volume
warps dispatch through ``transforms._volume_sample`` to the faster MXU
formulations instead: ``ops/gather_matmul.py`` (one-hot matmul, small
volumes) and ``ops/pallas_volume.py`` (tiled Pallas kernel, large volumes);
select explicitly with ``transforms.set_volume_sample_backend``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["grid_sample_2d", "grid_sample_3d", "grid_sample"]


def _unnormalize(coord, size):
    """Map [-1, 1] grid coords to pixel coords (align_corners=False)."""
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gs2d_one(image, grid, mode, padding_mode):
    """image (C, H, W); grid (Ho, Wo, 2) with (x, y) in [-1, 1]."""
    C, H, W = image.shape
    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    flat = image.reshape(C, H * W)

    def tap(ix, iy, w):
        """Gather at integer (iy, ix) with zero outside; weight w."""
        inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=1).reshape(C, *idx.shape)
        return vals * (w * inb.astype(image.dtype))[None]

    if mode == "nearest":
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        return tap(ix, iy, jnp.ones_like(x))

    # bilinear
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    out = (
        tap(x0, y0, (1 - wx) * (1 - wy))
        + tap(x0 + 1, y0, wx * (1 - wy))
        + tap(x0, y0 + 1, (1 - wx) * wy)
        + tap(x0 + 1, y0 + 1, wx * wy)
    )
    return out


def _gs3d_one(volume, grid, mode, padding_mode):
    """volume (C, D, H, W); grid (Do, Ho, Wo, 3) with (x, y, z) in [-1, 1]."""
    C, D, H, W = volume.shape
    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)
    z = _unnormalize(grid[..., 2], D)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
        z = jnp.clip(z, 0.0, D - 1)

    flat = volume.reshape(C, D * H * W)

    def tap(ix, iy, iz, w):
        inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) & (iz >= 0) & (iz < D)
        idx = (jnp.clip(iz, 0, D - 1) * H + jnp.clip(iy, 0, H - 1)) * W + jnp.clip(
            ix, 0, W - 1
        )
        vals = jnp.take(flat, idx.reshape(-1), axis=1).reshape(C, *idx.shape)
        return vals * (w * inb.astype(volume.dtype))[None]

    if mode == "nearest":
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        iz = jnp.round(z).astype(jnp.int32)
        return tap(ix, iy, iz, jnp.ones_like(x))

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx = x - x0
    wy = y - y0
    wz = z - z0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)
    out = (
        tap(x0, y0, z0, (1 - wx) * (1 - wy) * (1 - wz))
        + tap(x0 + 1, y0, z0, wx * (1 - wy) * (1 - wz))
        + tap(x0, y0 + 1, z0, (1 - wx) * wy * (1 - wz))
        + tap(x0 + 1, y0 + 1, z0, wx * wy * (1 - wz))
        + tap(x0, y0, z0 + 1, (1 - wx) * (1 - wy) * wz)
        + tap(x0 + 1, y0, z0 + 1, wx * (1 - wy) * wz)
        + tap(x0, y0 + 1, z0 + 1, (1 - wx) * wy * wz)
        + tap(x0 + 1, y0 + 1, z0 + 1, wx * wy * wz)
    )
    return out


@functools.partial(jax.jit, static_argnames=("mode", "padding_mode"))
def grid_sample_2d(input, grid, mode: str = "bilinear", padding_mode: str = "zeros"):
    """Batched 2D grid sample.

    Args:
        input: (N, C, H, W)
        grid: (N, Ho, Wo, 2), last dim (x, y) in [-1, 1]
        mode: 'bilinear' | 'nearest'
        padding_mode: 'zeros' | 'border'

    Returns:
        (N, C, Ho, Wo)
    """
    input = input.astype(jnp.float32)
    grid = grid.astype(jnp.float32)
    return jax.vmap(lambda im, g: _gs2d_one(im, g, mode, padding_mode))(input, grid)


@functools.partial(jax.jit, static_argnames=("mode", "padding_mode"))
def grid_sample_3d(input, grid, mode: str = "bilinear", padding_mode: str = "zeros"):
    """Batched 3D grid sample.

    Args:
        input: (N, C, D, H, W)
        grid: (N, Do, Ho, Wo, 3), last dim (x, y, z) in [-1, 1]
        mode: 'bilinear' (trilinear) | 'nearest'
        padding_mode: 'zeros' | 'border'

    Returns:
        (N, C, Do, Ho, Wo)
    """
    input = input.astype(jnp.float32)
    grid = grid.astype(jnp.float32)
    return jax.vmap(lambda vol, g: _gs3d_one(vol, g, mode, padding_mode))(input, grid)


def grid_sample(input, grid, mode: str = "bilinear", padding_mode: str = "zeros"):
    """Dimension-dispatching grid sample mirroring ``F.grid_sample``
    (reference: geometry.py:16-17 forces float32; we do the same)."""
    if input.ndim == 4:
        return grid_sample_2d(input, grid, mode, padding_mode)
    elif input.ndim == 5:
        return grid_sample_3d(input, grid, mode, padding_mode)
    raise ValueError(f"Unsupported input rank {input.ndim}")
