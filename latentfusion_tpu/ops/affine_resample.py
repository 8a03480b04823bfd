"""Separable (axis-aligned) resampling as dense matmuls.

The framework's 2D resampling hot paths — ``Camera.zoom``, ``Camera.uncrop``,
``crop_to_viewport`` — all sample along axis-aligned, per-camera affine grids
(reference: geometry.py:20-43, 261-292, 294-354). A generic 2D grid_sample
gather is memory-bound scatter/gather work; because these grids are
separable, the same result is two small per-axis interpolation matmuls that
run on the TPU MXU instead. Semantics (corner taps, zeros/border padding,
round-half-even nearest) match ``grid_sample_2d`` exactly — equivalence is
tested against it (and transitively against torch).

Weights are built from *traced* source coordinates, so pose gradients flow
through bilinear weights exactly as they do through grid_sample.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["axis_weights", "separable_resample_2d"]


def axis_weights(src, in_size: int, mode: str = "bilinear",
                 padding_mode: str = "zeros") -> jnp.ndarray:
    """Interpolation matrix W with ``out[o] = sum_j W[o, j] * in[j]``.

    src: (N, Out) fractional source pixel coordinates.
    Returns (N, Out, In).
    """
    if padding_mode == "border":
        src = jnp.clip(src, 0.0, in_size - 1)
    j = jnp.arange(in_size, dtype=jnp.float32)[None, None, :]

    if mode == "nearest":
        idx = jnp.round(src)[..., None]
        # Out-of-range indices match no column => zeros padding for free.
        return (j == idx).astype(jnp.float32)

    x0 = jnp.floor(src)
    w1 = (src - x0)[..., None]
    x0 = x0[..., None]
    return ((j == x0) * (1.0 - w1) + (j == x0 + 1) * w1).astype(jnp.float32)


def separable_resample_2d(image, src_y, src_x, mode: str = "bilinear",
                          padding_mode: str = "zeros"):
    """Resample (N, C, H, W) at the outer product of per-axis source coords.

    src_y: (N, H_out), src_x: (N, W_out) in input pixel units.
    Equivalent to grid_sample_2d with grid[n, i, k] =
    (unnormalize(src_x[n,k]), unnormalize(src_y[n,i])).
    """
    image = image.astype(jnp.float32)
    wy = axis_weights(src_y, image.shape[-2], mode, padding_mode)  # (N,Ho,H)
    wx = axis_weights(src_x, image.shape[-1], mode, padding_mode)  # (N,Wo,W)
    out = jnp.einsum("noh,nchw->ncow", wy, image,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("nkw,ncow->ncok", wx, out,
                      preferred_element_type=jnp.float32)


def bbox_source_coords(boxes, out_size: int, truncate_corners: bool = True):
    """Per-axis source pixel coords for a bbox grid (matches
    ``bbox_to_grid`` + grid_sample unnormalization; reference:
    geometry.py:20-33).

    ``truncate_corners`` reproduces the reference's deployed behavior
    exactly: ``bbox_to_grid`` is ``@torch.jit.script``, and TorchScript
    coerces the float corner ``.item()``s to integers (truncation toward
    zero) in the ``corner / in_size`` division — verified against torch 2.13
    (tests/test_reference_parity.py). Trained reference checkpoints saw
    integer-truncated crop boxes, so parity requires it. The corners are
    detached by ``.item()`` in the reference, so the zero gradient of trunc
    matches too. Pass ``False`` for exact sub-pixel boxes.

    boxes: (N, 4) as (xmin, ymin, xmax, ymax). Returns (src_y (N, out),
    src_x (N, out)).
    """
    if truncate_corners:
        boxes = jnp.trunc(boxes)
    k = jnp.arange(out_size, dtype=jnp.float32)[None]
    denom = max(out_size - 1, 1)
    src_x = boxes[:, 0:1] + k * (boxes[:, 2:3] - boxes[:, 0:1]) / denom - 0.5
    src_y = boxes[:, 1:2] + k * (boxes[:, 3:4] - boxes[:, 1:2]) / denom - 0.5
    return src_y, src_x
