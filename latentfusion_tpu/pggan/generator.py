"""PGGAN encoder/decoder with style-vector injection and progressive
intermediate I/O.

Behavioral reference: ``latentfusion/pggan/generator.py`` (defined but not
used by the shipped pipeline; ported for completeness, SURVEY.md §2.9).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..modules import pixel_norm
from ..modules.equalized import EqualizedConv
from ..ops.interpolate import interpolate

DEFAULT_BLOCK_CONFIG = (32, 64, 128, 256, 512, 512)


class _InputBlock(nn.Module):
    in_channels: int
    out_channels: int
    relu_slope: float = 0.2

    def setup(self):
        self.conv = EqualizedConv(self.in_channels, self.out_channels, 1,
                                  ndim=2)

    def __call__(self, x):
        return jax.nn.leaky_relu(self.conv(x), self.relu_slope)


class _OutputBlock(nn.Module):
    in_channels: int
    out_channels: int

    def setup(self):
        self.conv = EqualizedConv(self.in_channels, self.out_channels, 1,
                                  ndim=2)

    def __call__(self, x):
        return self.conv(x)


class _Block(nn.Module):
    """interpolate -> (conv -> lrelu -> pixelnorm) x2
    (reference: generator.py:37-61; note: interpolation BEFORE the convs,
    unlike modules.blocks.Block)."""

    in_channels: int
    out_channels: int
    scale_factor: float
    scale_mode: str = "nearest"
    relu_slope: float = 0.2

    def setup(self):
        self.conv1 = EqualizedConv(self.in_channels, self.out_channels, 3,
                                   ndim=2, padding=1)
        self.conv2 = EqualizedConv(self.out_channels, self.out_channels, 3,
                                   ndim=2, padding=1)

    def __call__(self, x):
        x = interpolate(x, scale_factor=self.scale_factor,
                        mode=self.scale_mode)
        x = pixel_norm(jax.nn.leaky_relu(self.conv1(x), self.relu_slope))
        x = pixel_norm(jax.nn.leaky_relu(self.conv2(x), self.relu_slope))
        return x


class Encoder(nn.Module):
    """(reference: generator.py:64-101)"""

    in_channels: int
    block_config: Sequence[int]
    intermediate_inputs: bool = False
    scale_mode: str = "nearest"
    input_level: int = 0

    def setup(self):
        cfg = tuple(self.block_config)
        input_blocks, encoder_blocks = [], []
        for block_id, (cin, cout) in enumerate(zip(cfg[:-1], cfg[1:])):
            if self.intermediate_inputs or block_id == 0:
                input_blocks.append(_InputBlock(self.in_channels, cin))
            encoder_blocks.append(_Block(cin, cout, 0.5, self.scale_mode))
        self.input_blocks = input_blocks
        self.encoder_blocks = encoder_blocks

    def __call__(self, x):
        input_block = self.input_blocks[self.input_level]
        if self.input_level > 0:
            x = interpolate(x, scale_factor=2 ** (-self.input_level),
                            mode="nearest")
        z = input_block(x)
        z_intermediates = []
        for block in self.encoder_blocks:
            z = block(z)
            z_intermediates.append(z)
        return z, z_intermediates


class Decoder(nn.Module):
    """(reference: generator.py:104-172)"""

    out_channels: int
    block_config: Sequence[int]
    intermediate_outputs: bool = False
    style_size: int = 8
    skip_connections: bool = True
    scale_mode: str = "nearest"
    output_activation: Optional[str] = None
    output_level: int = 0

    def setup(self):
        cfg = list(reversed(tuple(self.block_config)))
        cfg[0] += self.style_size
        self._cfg = tuple(cfg)
        num_blocks = len(cfg) - 1
        decoder_blocks, output_blocks = [], []
        for block_id, (cin, cout) in enumerate(zip(cfg[:-1], cfg[1:])):
            if self.skip_connections and block_id >= 1:
                cin *= 2
            decoder_blocks.append(_Block(cin, cout, 2.0, self.scale_mode))
            if self.intermediate_outputs or block_id == num_blocks - 1:
                output_blocks.append(_OutputBlock(cout, self.out_channels))
        self.decoder_blocks = decoder_blocks
        self.output_blocks = output_blocks

    def __call__(self, z_content, z_content_intermediates=None, z_style=None):
        if z_style is None and self.style_size > 0:
            raise ValueError("z_style required when style_size > 0")
        if z_content_intermediates is None and self.skip_connections:
            raise ValueError("intermediates required for skip connections")

        if z_style is not None:
            z_style = jnp.broadcast_to(
                z_style.reshape(*z_style.shape, 1, 1),
                (*z_style.shape, *z_content.shape[2:]))
            z = jnp.concatenate((z_content, z_style), axis=1)
        else:
            z = z_content

        for block_id, block in enumerate(self.decoder_blocks):
            if self.skip_connections and block_id >= 1:
                z = jnp.concatenate(
                    (z, z_content_intermediates[-block_id - 1]), axis=1)
            z = block(z)

        y = self.output_blocks[-self.output_level - 1](z)
        if self.output_activation == "tanh":
            y = jnp.tanh(y)
        elif self.output_activation == "clamp":
            y = jnp.clip(y, -1, 1)
        elif self.output_activation is not None:
            raise ValueError(
                f"Unknown output activation {self.output_activation}")
        return y


class EncoderDecoder(nn.Module):
    """(reference: generator.py:175-229)"""

    in_channels: int
    out_channels: int
    block_config: Any = None
    intermediate_inputs: bool = False
    style_size: int = 8
    skip_connections: bool = True
    scale_mode: str = "bilinear"
    output_activation: Optional[str] = None

    def setup(self):
        cfg = tuple(self.block_config or DEFAULT_BLOCK_CONFIG)
        self.encoder = Encoder(self.in_channels, cfg,
                               self.intermediate_inputs,
                               scale_mode=self.scale_mode)
        self.decoder = Decoder(self.out_channels, cfg,
                               self.intermediate_inputs,
                               style_size=self.style_size,
                               skip_connections=self.skip_connections,
                               scale_mode=self.scale_mode,
                               output_activation=self.output_activation)

    def __call__(self, x, z_style=None):
        z_content, z_intermediates = self.encoder(x)
        if not self.skip_connections:
            z_intermediates = None
        y = self.decoder(z_content, z_intermediates, z_style)
        return y, z_content
