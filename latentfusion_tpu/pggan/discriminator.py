"""PatchGAN discriminators with minibatch-stddev.

Behavioral reference: ``latentfusion/pggan/discriminator.py``. Stride-2
equalized conv stack, InstanceNorm, minibatch-stddev concat on the last
block, PatchGAN 4x4 head; MultiScale = 3 copies at 1x/0.5x/0.25x.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..modules.equalized import EqualizedConv
from ..ops.interpolate import interpolate


def minibatch_mean_variance(x, eps: float = 1e-8):
    """(reference: discriminator.py:9-13)"""
    mean = jnp.mean(x, axis=0, keepdims=True)
    vals = jnp.sqrt(jnp.mean((x - mean) ** 2, axis=0) + eps)
    return jnp.mean(vals)


def instance_norm_2d(x, eps: float = 1e-5):
    """torch nn.InstanceNorm2d default semantics (no affine, no running
    stats): per-(sample, channel) spatial normalization."""
    mean = x.mean(axis=(-2, -1), keepdims=True)
    var = ((x - mean) ** 2).mean(axis=(-2, -1), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class DiscriminatorBlock(nn.Module):
    """(reference: discriminator.py:31-59)"""

    in_channels: int
    out_channels: int
    kernel_size: int = 4
    stride: int = 2
    use_norm: bool = False
    minibatch_stats: bool = False
    relu_slope: float = 0.2
    padding: int = 0

    def setup(self):
        in_ch = self.in_channels + (1 if self.minibatch_stats else 0)
        self.conv = EqualizedConv(in_ch, self.out_channels, self.kernel_size,
                                  ndim=2, stride=self.stride,
                                  padding=self.padding)

    def __call__(self, x):
        if self.minibatch_stats:
            mv = minibatch_mean_variance(x)
            mv = jnp.broadcast_to(mv.reshape(1, 1, 1, 1),
                                  (x.shape[0], 1, x.shape[2], x.shape[3]))
            x = jnp.concatenate((x, mv), axis=1)
        x = self.conv(x)
        if self.use_norm:
            x = instance_norm_2d(x)
        return jax.nn.leaky_relu(x, self.relu_slope)


class Discriminator(nn.Module):
    """(reference: discriminator.py:62-100)"""

    in_channels: int
    block_config: Optional[Sequence[int]] = None

    @property
    def _config(self):
        return tuple(self.block_config or (64, 128, 256, 512))

    def setup(self):
        cfg = self._config
        blocks = [DiscriminatorBlock(self.in_channels, cfg[0], kernel_size=4,
                                     stride=2, padding=1)]
        for block_id, (cin, cout) in enumerate(zip(cfg[:-1], cfg[1:])):
            is_last = block_id == len(cfg) - 2
            blocks.append(DiscriminatorBlock(
                cin, cout, kernel_size=4, stride=1 if is_last else 2,
                use_norm=True, minibatch_stats=is_last, padding=1))
        self.blocks = blocks
        self.output_block = EqualizedConv(cfg[-1], 1, 4, ndim=2, stride=1,
                                          padding=1)

    def __call__(self, x, mask=None):
        if mask is not None:
            if mask.ndim == 3:
                mask = mask[:, None]
            x = mask * x
        for block in self.blocks:
            x = block(x)
        return self.output_block(x)


class MultiScaleDiscriminator(nn.Module):
    """3 discriminators at 1x / 0.5x / 0.25x (reference: discriminator.py:103-144)."""

    in_channels: int
    block_config: Any = None
    num_scales: int = 3

    def checkpoint_args(self) -> dict:
        return {
            "in_channels": self.in_channels,
            "block_config": self.block_config,
            "num_scales": self.num_scales,
        }

    def setup(self):
        self.discriminators = [
            Discriminator(self.in_channels, self.block_config)
            for _ in range(self.num_scales)
        ]

    def __call__(self, x, mask=None):
        if mask is not None and mask.ndim == 3:
            mask = mask[:, None]
        responses = []
        for scale, discriminator in enumerate(self.discriminators):
            responses.append(discriminator(x, mask))
            if scale != self.num_scales - 1:
                x = interpolate(x, scale_factor=0.5, mode="bilinear")
                if mask is not None:
                    mask = interpolate(mask, scale_factor=0.5, mode="nearest")
        return responses
