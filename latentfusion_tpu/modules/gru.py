"""3D conv GRU cell — the default trained fuser's recurrence.

Behavioral reference: ``latentfusion/modules/gru.py:7-46``.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .equalized import EqualizedConv


class ConvGRUCell(nn.Module):
    in_channels: int
    hidden_channels: int
    kernel_size: int = 3
    ndim: int = 3

    def setup(self):
        pad = self.kernel_size // 2
        self.update_gate = EqualizedConv(
            self.in_channels + self.hidden_channels, self.hidden_channels,
            self.kernel_size, ndim=self.ndim, padding=pad)
        self.reset_gate = EqualizedConv(
            self.in_channels + self.hidden_channels, self.hidden_channels,
            self.kernel_size, ndim=self.ndim, padding=pad)
        self.out_gate = EqualizedConv(
            self.in_channels + self.hidden_channels, self.hidden_channels,
            self.kernel_size, ndim=self.ndim, padding=pad)

    def __call__(self, x, h_cur):
        x_in = jnp.concatenate([x, h_cur], axis=1)
        update = jax.nn.sigmoid(self.update_gate(x_in))
        reset = jax.nn.sigmoid(self.reset_gate(x_in))
        x_out = self.out_gate(jnp.concatenate([x, h_cur * reset], axis=1))
        h_new = h_cur * (1 - update) + x_out * update
        return h_new
