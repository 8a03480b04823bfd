"""2D<->3D feature projections.

Behavioral reference: ``latentfusion/modules/geometry.py:693-749``. These lift
2D image features into the camera-frustum volume (tile along depth, or
reshape C*D channels) and collapse back.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .equalized import EqualizedConv


class TileProjection2d3d(nn.Module):
    """conv1x1 -> lrelu -> pixelnorm -> tile along depth
    (reference: geometry.py:693-708)."""

    in_channels: int
    out_channels: int
    out_size: int
    relu_slope: float = 0.2

    def setup(self):
        self.conv = EqualizedConv(self.in_channels, self.out_channels, 1,
                                  ndim=2, padding=0)

    def __call__(self, x):
        from . import pixel_norm
        from ..layout import channels_last

        x = self.conv(x)
        x = jax.nn.leaky_relu(x, self.relu_slope)
        x = pixel_norm(x)
        if channels_last():  # (N, H, W, C) -> (N, D, H, W, C)
            return jnp.broadcast_to(
                x[:, None], (x.shape[0], self.out_size, *x.shape[1:]))
        return jnp.broadcast_to(
            x[:, :, None],
            (x.shape[0], x.shape[1], self.out_size, *x.shape[2:]))


class FactorProjection2d3d(nn.Module):
    """conv1x1 to C*D channels -> reshape into a depth axis
    (reference: geometry.py:711-728)."""

    in_channels: int
    out_channels: int
    out_size: int
    relu_slope: float = 0.2

    def setup(self):
        self.conv = EqualizedConv(self.in_channels,
                                  self.out_channels * self.out_size, 1,
                                  ndim=2, padding=0)

    def __call__(self, x):
        from . import pixel_norm
        from ..layout import channels_last

        x = self.conv(x)
        x = jax.nn.leaky_relu(x, self.relu_slope)
        x = pixel_norm(x)
        if channels_last():
            # (N, H, W, C*D): flat channel index is c*D + d (the reference's
            # torch-layout reshape ordering) -> (N, D, H, W, C).
            n, h, w, _ = x.shape
            x = x.reshape(n, h, w, self.out_channels, -1)
            return x.transpose(0, 4, 1, 2, 3)
        return x.reshape(x.shape[0], self.out_channels, -1,
                         x.shape[-2], x.shape[-1])


class FactorProjection3d2d(nn.Module):
    """Collapse the depth axis into channels then conv1x1
    (reference: geometry.py:731-749)."""

    in_channels: int
    out_channels: int
    out_size: int
    relu_slope: float = 0.2

    def setup(self):
        self.conv = EqualizedConv(self.in_channels * self.out_size,
                                  self.out_channels, 1, ndim=2, padding=0)

    def __call__(self, x):
        from . import pixel_norm
        from ..layout import channels_last

        if channels_last():
            # Hand the 5-D (N, D, H, W, C) volume straight to the 1x1
            # conv: EqualizedConv contracts (d, c) against the kernel
            # viewed as (O, C, D) — the same matmul as transpose+reshape
            # +conv1x1, minus the physical relayout copies that pattern
            # costs fwd+bwd (round-3 refinement profile).
            pass
        else:
            x = x.reshape(x.shape[0], x.shape[1] * x.shape[2],
                          x.shape[3], x.shape[4])
        x = self.conv(x)
        x = jax.nn.leaky_relu(x, self.relu_slope)
        x = pixel_norm(x)
        return x
