"""Block-config DSL and conv blocks.

Behavioral reference: ``latentfusion/modules/blocks.py``. Configs are lists
like ``[64, 'D', 128, ...]`` (parsed from strings such as ``'64,D,128:...'``;
these strings are persisted in checkpoints and are the source of truth on
resume). ``create_block_defs`` reproduces ``create_blocks``'s channel
accounting exactly — including skip-connection widening, the ``in_views``
multiplier on the first block, and the "scale marker applies to the *next*
conv block" rule.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax

from ..ops.interpolate import interpolate
from .equalized import EqualizedConv


def count_blocks(config) -> int:
    """(reference: blocks.py:6-7)"""
    return sum(1 for b in config if isinstance(b, int)) - 1


def create_block_defs(config, ndim: int, scale_factor: float,
                      scale_mode: str = "bilinear", kernel_size: int = 3,
                      skip_connections: bool = False,
                      skip_connect_start: int = 1,
                      skip_connect_end: Optional[int] = None,
                      in_views: int = 1,
                      skip_connection_views: Optional[int] = None
                      ) -> List[Dict[str, Any]]:
    """Returns constructor kwargs for a list of ``Block``s
    (reference: blocks.py:10-75)."""
    if ndim == 3 and scale_mode == "bilinear":
        scale_mode = "trilinear"
    if skip_connection_views is None:
        skip_connection_views = in_views

    num_blocks = count_blocks(config)
    if skip_connect_end is None:
        skip_connect_end = num_blocks
    skip_connect_end = min(num_blocks, skip_connect_end)

    defs = []
    num_conv_blocks = 0
    scale_next_block = 1.0
    block_in = config[0]
    for block_out in config[1:]:
        if isinstance(block_out, int) or (isinstance(block_out, str)
                                          and block_out.isdigit()):
            skip_in = 0
            if skip_connections and (
                    skip_connect_start <= num_conv_blocks < skip_connect_end):
                skip_in = block_in * skip_connection_views
            if num_conv_blocks == 0:
                block_in *= in_views
            defs.append(dict(
                in_channels=block_in + skip_in,
                out_channels=int(block_out),
                kernel_size=kernel_size,
                ndim=ndim,
                scale_mode=scale_mode,
                scale_factor=scale_next_block,
            ))
            block_in = int(block_out)
            num_conv_blocks += 1
            if scale_next_block != 1.0:
                scale_next_block = 1.0
        elif block_out == "I":
            scale_next_block = scale_factor
        elif block_out == "U":
            scale_next_block = 2.0
        elif block_out == "D":
            scale_next_block = 0.5
        else:
            raise ValueError(f"Unknown block type {block_out!r}")
    return defs


class InputBlock(nn.Module):
    """1x1 conv input head (reference: blocks.py:78-96).

    Note: the reference passes ``kernel_size`` positionally into the conv's
    ``stride`` slot, so stride == kernel_size; we reproduce that.
    """

    in_channels: int
    out_channels: int
    ndim: int = 2
    kernel_size: int = 1
    relu_slope: float = 0.2
    padding: int = 0

    def setup(self):
        self.conv = EqualizedConv(
            self.in_channels, self.out_channels, self.kernel_size,
            ndim=self.ndim, stride=self.kernel_size, padding=self.padding)

    def __call__(self, x):
        x = self.conv(x)
        return jax.nn.leaky_relu(x, self.relu_slope)


class OutputBlock(nn.Module):
    """1x1 conv output head (reference: blocks.py:107-133)."""

    in_channels: int
    out_channels: int
    ndim: int = 2
    kernel_size: int = 1
    padding: int = 0
    activation: Optional[str] = None

    def setup(self):
        self.conv = EqualizedConv(
            self.in_channels, self.out_channels, self.kernel_size,
            ndim=self.ndim, padding=self.padding)

    def __call__(self, x):
        x = self.conv(x)
        if self.activation == "lrelu":
            x = jax.nn.leaky_relu(x, 0.2)
        elif self.activation == "relu":
            x = jax.nn.relu(x)
        elif self.activation == "tanh":
            x = jax.numpy.tanh(x)
        elif self.activation not in (None, "none"):
            raise ValueError(f"Unknown activation type {self.activation}")
        return x


class Block(nn.Module):
    """conv -> lrelu(0.2) -> pixelnorm, twice, then optional interpolate
    (reference: blocks.py:136-164)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    padding: int = 1
    relu_slope: float = 0.2
    ndim: int = 3
    scale_factor: float = 1.0
    scale_mode: str = "bilinear"

    def setup(self):
        self.conv1 = EqualizedConv(self.in_channels, self.out_channels,
                                   self.kernel_size, ndim=self.ndim,
                                   padding=self.padding)
        self.conv2 = EqualizedConv(self.out_channels, self.out_channels,
                                   self.kernel_size, ndim=self.ndim,
                                   padding=self.padding)

    def __call__(self, x, skip_scale: bool = False):
        from . import lrelu_pixel_norm
        from ..layout import channel_axis

        # Fused lrelu+pixelnorm: one custom VJP saving (x, inv) instead of
        # letting AD checkpoint the leaky_relu pred tensor — perf-neutral
        # on v5e (measured, docs/ARCHITECTURE.md) but halves the residual
        # footprint, which matters at the 512-wide coarse-search batch.
        x = self.conv1(x)
        x = lrelu_pixel_norm(x, self.relu_slope, 1e-8, channel_axis())

        x = self.conv2(x)
        x = lrelu_pixel_norm(x, self.relu_slope, 1e-8, channel_axis())

        if (not skip_scale and self.scale_factor != 1.0
                and self.scale_factor is not None):
            x = interpolate(x, scale_factor=self.scale_factor,
                            mode=self.scale_mode)
        return x


class PreActivationBasicBlock(nn.Module):
    """Pre-activation residual block (reference: blocks.py:167-194; unused by
    the shipped pipeline, ported for completeness)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    relu_slope: float = 0.2
    scale_mode: str = "bilinear"
    ndim: int = 2

    def setup(self):
        self.conv1 = EqualizedConv(self.in_channels, self.out_channels,
                                   self.kernel_size, ndim=self.ndim,
                                   stride=self.stride, padding=1)
        self.conv2 = EqualizedConv(self.out_channels, self.out_channels,
                                   self.kernel_size, ndim=self.ndim, padding=1)
        self.shortcut = EqualizedConv(self.in_channels, self.out_channels,
                                      1, ndim=self.ndim, stride=1)

    def __call__(self, x):
        shortcut = self.shortcut(
            interpolate(x, scale_factor=0.5, mode=self.scale_mode))
        x = jax.nn.leaky_relu(x, self.relu_slope)
        x = self.conv1(x)
        x = jax.nn.leaky_relu(x, self.relu_slope)
        x = self.conv2(x)
        x = interpolate(x, scale_factor=0.5, mode=self.scale_mode)
        return x + shortcut

