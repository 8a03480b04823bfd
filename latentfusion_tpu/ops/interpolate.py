"""Resize ops with exact torch ``F.interpolate`` semantics.

The reference uses ``F.interpolate`` inside every up/down-scaling block
(``Interpolate`` module, reference: latentfusion/modules/__init__.py:18-36)
with ``align_corners=False`` for (bi/tri)linear and the legacy index
convention for nearest. Checkpoint parity requires matching these exactly —
``jax.image.resize`` uses different conventions, so we implement our own:

- nearest: ``src = floor(dst * in/out)`` (torch's legacy nearest)
- linear (align_corners=False): ``src = max((dst + 0.5) * in/out - 0.5, 0)``,
  upper tap clamped to the edge.

Linear resampling along an axis is expressed as a small dense matmul with a
static weight matrix (built with numpy at trace time) — this maps onto the
TPU MXU instead of scatter/gather, and XLA fuses the per-axis contractions.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["interpolate", "resize_nearest", "Interpolate"]


@functools.lru_cache(maxsize=None)
def _linear_weight_matrix(in_size: int, out_size: int):
    """(out_size, in_size) interpolation matrix, torch align_corners=False."""
    scale = in_size / out_size
    w = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        src = max((i + 0.5) * scale - 0.5, 0.0)
        i0 = int(np.floor(src))
        i0 = min(i0, in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        lam = src - i0
        w[i, i0] += 1.0 - lam
        w[i, i1] += lam
    return w


@functools.lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int):
    """(out_size,) source indices, torch legacy nearest."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size) * scale).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def _resize_axis_linear(x, axis: int, out_size: int):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    w = jnp.asarray(_linear_weight_matrix(in_size, out_size))
    x = jnp.moveaxis(x, axis, -1)
    x = x @ w.T
    return jnp.moveaxis(x, -1, axis)


def _resize_axis_nearest(x, axis: int, out_size: int):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    axis = axis % x.ndim
    if out_size % in_size == 0:
        # Integer upsample: torch legacy nearest picks src=floor(i*in/out)
        # = i // k, i.e. exactly a repeat -> broadcast+reshape instead of a
        # gather (XLA handles repeats without index math or u16 masks).
        return jnp.repeat(x, out_size // in_size, axis=axis)
    if in_size % out_size == 0:
        # Integer downsample: src = floor(i*k) = i*k -> strided slice.
        k = in_size // out_size
        return jax.lax.slice_in_dim(x, 0, in_size, stride=k, axis=axis)
    idx = jnp.asarray(_nearest_index(in_size, out_size))
    return jnp.take(x, idx, axis=axis)


def _out_size(in_size: int, scale_factor: float) -> int:
    # torch: int(floor(in * scale))
    return int(np.floor(in_size * scale_factor))


def interpolate(x, scale_factor=None, size=None, mode: str = "nearest"):
    """Mirror of ``F.interpolate`` for (N, C, *spatial) inputs (or
    (N, *spatial, C) under the channels-last layout policy).

    Supports mode in {'nearest', 'bilinear', 'trilinear', 'linear'};
    (bi/tri)linear uses align_corners=False.
    """
    from ..layout import channels_last

    first = 1 if channels_last() else 2
    spatial = x.shape[first:x.ndim - 1] if channels_last() else x.shape[2:]
    ndim = len(spatial)
    if size is None:
        if scale_factor is None:
            raise ValueError("one of size or scale_factor required")
        size = tuple(_out_size(s, scale_factor) for s in spatial)
    elif isinstance(size, int):
        size = (size,) * ndim
    size = tuple(size)

    if mode == "nearest":
        for d in range(ndim):
            x = _resize_axis_nearest(x, first + d, size[d])
        return x
    elif mode in ("linear", "bilinear", "trilinear"):
        for d in range(ndim):
            x = _resize_axis_linear(x, first + d, size[d])
        return x
    raise ValueError(f"Unsupported mode {mode!r}")


def resize_nearest(x, size):
    """``F.interpolate(x, size)`` default-mode shorthand
    (used by the occlusion module, reference: recon/models.py:385)."""
    return interpolate(x, size=size, mode="nearest")


class Interpolate:
    """Functional stand-in for the reference's ``Interpolate`` module
    (reference: modules/__init__.py:18-36)."""

    def __init__(self, scale_factor, mode: str = "nearest"):
        self.scale_factor = scale_factor
        self.mode = mode

    def __call__(self, x):
        return interpolate(x, scale_factor=self.scale_factor, mode=self.mode)
