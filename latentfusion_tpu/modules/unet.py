"""U-Net from block configs.

Behavioral reference: ``latentfusion/modules/unet.py:8-139``. Skip
concatenations are inserted at up-block i >= 1 from the reversed list of
down-block intermediates; optional ``z_inject`` broadcast-concat at the
bottleneck; output may be a single head or a list of per-channel-group heads.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from .blocks import Block, InputBlock, OutputBlock, count_blocks, create_block_defs


class BaseUNet(nn.Module):
    in_channels: Optional[int]
    out_channels: Union[None, int, Sequence[int]]
    block_config: Any  # (down_config, up_config)
    ndim: int = 2

    @property
    def down_block_config(self):
        return self.block_config[0]

    @property
    def up_block_config(self):
        return self.block_config[1]

    @property
    def unet_in_channels(self):
        if self.in_channels is not None:
            return self.in_channels
        return self.down_block_config[0]

    @property
    def unet_out_channels(self):
        if self.out_channels is not None:
            if isinstance(self.out_channels, int):
                return self.out_channels
            return sum(self.out_channels)
        return self.up_block_config[-1]

    def bottleneck_size(self, in_size: int) -> int:
        num_down = (self.down_block_config.count("I")
                    + self.down_block_config.count("D"))
        return in_size // (2 ** num_down)

    def output_size(self, in_size: int) -> int:
        bottleneck = self.bottleneck_size(in_size)
        num_up = (self.up_block_config.count("I")
                  + self.up_block_config.count("U"))
        return bottleneck * (2 ** num_up)

    def setup(self):
        if self.in_channels is not None:
            self.input_block = InputBlock(
                self.in_channels, self.down_block_config[0], ndim=self.ndim)
        self.down_blocks = [
            Block(**kw)
            for kw in create_block_defs(self.down_block_config, self.ndim, 0.5)
        ]
        self.up_blocks = [
            Block(**kw)
            for kw in create_block_defs(
                self.up_block_config, self.ndim, 2.0,
                skip_connections=True,
                skip_connect_end=min(count_blocks(self.down_block_config),
                                     count_blocks(self.up_block_config)))
        ]
        if self.out_channels is None:
            pass
        elif isinstance(self.out_channels, int):
            self.output_block = OutputBlock(
                self.up_block_config[-1], self.out_channels, ndim=self.ndim)
        else:
            self.output_block = [
                OutputBlock(self.up_block_config[-1], c, ndim=self.ndim)
                for c in self.out_channels
            ]

    @property
    def final_scale(self):
        """(scale_factor, scale_mode) of the last up-block's trailing
        upsample, or None. Callers that apply their own 1x1 no-activation
        heads (e.g. the Photographer) can pass ``skip_final_scale=True``,
        run the heads at the pre-upsample resolution, and apply this
        scale to the few-channel head output — the same exact linear
        commute ``_defer_final_scale`` performs for in-module heads."""
        block = self.up_blocks[-1]
        if block.scale_factor in (None, 1.0):
            return None
        return (block.scale_factor, block.scale_mode)

    def _defer_final_scale(self, block) -> bool:
        """True when the last up-block's trailing upsample can run after
        the output heads (exact linear commute)."""
        if self.out_channels is None:
            return False
        if block.scale_factor in (None, 1.0):
            return False
        heads = (self.output_block if isinstance(self.out_channels, int)
                 else list(self.output_block))
        heads = heads if isinstance(heads, list) else [heads]
        return all(h.kernel_size == 1 and h.activation is None
                   for h in heads)

    def __call__(self, z, z_inject=None, return_intermediate: bool = False,
                 skip_final_scale: bool = False):
        from ..layout import channel_axis, channels_last

        ch = channel_axis()
        if self.in_channels is not None:
            z = self.input_block(z)

        x_intermediate = []
        for block in self.down_blocks:
            z = block(z)
            x_intermediate.insert(0, z)

        if z_inject is not None:
            assert z_inject.shape[0] == z.shape[0]
            nsp = z.ndim - 2
            if channels_last():
                z_inject = jnp.broadcast_to(
                    z_inject.reshape(z_inject.shape[0], *([1] * nsp),
                                     z_inject.shape[1]),
                    (z_inject.shape[0], *z.shape[1:-1], z_inject.shape[1]))
            else:
                z_inject = jnp.broadcast_to(
                    z_inject.reshape(*z_inject.shape, *([1] * nsp)),
                    (*z_inject.shape, *z.shape[2:]))
            z = jnp.concatenate((z, z_inject), axis=ch)

        deferred_scale = None
        for block_id, block in enumerate(self.up_blocks):
            if 1 <= block_id < len(x_intermediate):
                z = jnp.concatenate((z, x_intermediate[block_id]), axis=ch)
            if (block_id == len(self.up_blocks) - 1 and skip_final_scale
                    and self.final_scale is not None):
                # Caller-managed deferral: the caller applies its own 1x1
                # heads and then self.final_scale (see Photographer).
                z = block(z, skip_scale=True)
            elif (block_id == len(self.up_blocks) - 1
                    and self._defer_final_scale(block)):
                # The trailing upsample and the 1x1 no-activation output
                # heads are both linear maps on disjoint axes (spatial vs
                # channel), so they commute exactly. Running the heads at
                # the pre-upsample resolution and resizing their few output
                # channels cuts the resize work by C_block/C_heads and
                # keeps the wide-channel tensor off the post-resize layout
                # boundary (profiled ~2 ms/iter of head matmuls + relayout
                # copies at the flagship refinement shape).
                z = block(z, skip_scale=True)
                deferred_scale = (block.scale_factor, block.scale_mode)
            else:
                z = block(z)

        if self.out_channels is None:
            pass
        elif isinstance(self.out_channels, int):
            z = self.output_block(z)
        else:
            outputs = [ob(z) for ob in self.output_block]
            z = jnp.concatenate(outputs, axis=ch)
        if deferred_scale is not None:
            from ..ops.interpolate import interpolate

            z = interpolate(z, scale_factor=deferred_scale[0],
                            mode=deferred_scale[1])

        if return_intermediate:
            return z, x_intermediate
        return z


class UNet2d(BaseUNet):
    ndim: int = 2


class UNet3d(BaseUNet):
    ndim: int = 3
