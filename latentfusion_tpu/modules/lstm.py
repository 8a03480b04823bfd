"""3D conv LSTM cell (behavioral reference: ``latentfusion/modules/lstm.py``)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .equalized import EqualizedConv


class ConvLSTMCell(nn.Module):
    in_channels: int
    hidden_channels: int
    kernel_size: int = 3
    ndim: int = 3

    def setup(self):
        pad = self.kernel_size // 2
        self.conv = EqualizedConv(
            self.in_channels + self.hidden_channels, 4 * self.hidden_channels,
            self.kernel_size, ndim=self.ndim, padding=pad)

    def __call__(self, x, state):
        h_cur, c_cur = state
        combined = jnp.concatenate([x, h_cur], axis=1)
        cc = self.conv(combined)
        cc_i, cc_f, cc_o, cc_g = jnp.split(cc, 4, axis=1)
        i = jax.nn.sigmoid(cc_i)
        f = jax.nn.sigmoid(cc_f)
        o = jax.nn.sigmoid(cc_o)
        g = jnp.tanh(cc_g)
        c_next = f * c_cur + i * g
        h_next = o * jnp.tanh(c_next)
        return h_next, c_next
