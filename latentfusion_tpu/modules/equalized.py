"""PGGAN-style equalized-learning-rate convolutions.

Behavioral reference: ``latentfusion/modules/equalized.py:35-99``. A bias-free
conv whose weights are initialized N(0, 1)/lr_scale, with the output scaled at
runtime by the He constant sqrt(2 / fan_in) * lr_scale, then a separate bias
add. Checkpoint parity requires this exact formulation (the scale is folded at
runtime, not into the stored weights).

Weights are stored in torch layout (O, I, *K) so that converting a torch
state_dict is a pure key rename; ``lax.conv_general_dilated`` consumes the
layout directly via dimension_numbers and XLA picks the optimal internal
layout on TPU.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

_DIMENSION_NUMBERS = {
    1: ("NCH", "OIH", "NCH"),
    2: ("NCHW", "OIHW", "NCHW"),
    3: ("NCDHW", "OIDHW", "NCDHW"),
}

# Channels-last activations (layout.py policy); weights stay torch-layout
# (the rhs spec is independent of the lhs/out specs).
_DIMENSION_NUMBERS_CL = {
    1: ("NHC", "OIH", "NHC"),
    2: ("NHWC", "OIHW", "NHWC"),
    3: ("NDHWC", "OIDHW", "NDHWC"),
}


class EqualizedConv(nn.Module):
    """N-dimensional equalized conv (reference: equalized.py:35-99)."""

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    ndim: int = 2
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    equalized: bool = True
    lr_scale: float = 1.0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None  # None -> global policy (dtypes.py)

    def _tuple(self, v):
        if isinstance(v, int):
            return (v,) * self.ndim
        return tuple(v)

    @nn.compact
    def __call__(self, x):
        from ..dtypes import get_compute_dtype
        from ..layout import channels_last

        compute_dtype = self.dtype or get_compute_dtype()
        cl = channels_last()
        ks = self._tuple(self.kernel_size)
        stride = self._tuple(self.stride)
        padding = self._tuple(self.padding)
        pad = [(p, p) for p in padding]

        def weight_init(key, shape, dtype):
            w = jnp.asarray(
                nn.initializers.normal(stddev=1.0)(key, shape, jnp.float32))
            return (w / self.lr_scale).astype(dtype)

        weight = self.param(
            "weight", weight_init, (self.out_channels, self.in_channels, *ks),
            jnp.float32)

        if cl and self.ndim == 2 and x.ndim == 5 and ks == (1, 1):
            # Fused depth-collapse (FactorProjection3d2d): x is a 5-D
            # (N, D, H, W, C) volume with declared in_channels == C*D
            # (torch flat index c*D + d). Reshaping to (N, H, W, C*D)
            # before a 1x1 conv forces physical relayout copies on both
            # sides, fwd AND bwd (profiled ~0.9 ms/iter at the flagship
            # refinement shape); contracting (d, c) directly against the
            # kernel viewed as (O, C, D) is the identical matmul without
            # ever materializing the collapsed tensor.
            n, d, h, w_sp, c = x.shape
            w3 = weight.reshape(self.out_channels, c, d)
            y = lax.dot_general(
                x.astype(compute_dtype), w3.astype(compute_dtype),
                (((1, 4), (2, 1)), ((), ())))  # -> (N, H, W, O)
        else:
            y = lax.conv_general_dilated(
                x.astype(compute_dtype),
                weight.astype(compute_dtype),
                window_strides=stride,
                padding=pad,
                dimension_numbers=(_DIMENSION_NUMBERS_CL if cl
                                   else _DIMENSION_NUMBERS)[self.ndim],
            )
        if self.equalized:
            fan_in = self.in_channels * math.prod(ks)
            he = math.sqrt(2.0 / fan_in)
            y = y * jnp.asarray(he * self.lr_scale, dtype=y.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.out_channels,), jnp.float32)
            if cl:
                y = y + bias.astype(y.dtype)
            else:
                y = y + bias.astype(y.dtype).reshape(
                    (1, -1) + (1,) * self.ndim)
        return y


class EqualizedConv2d(EqualizedConv):
    ndim: int = 2


class EqualizedConv3d(EqualizedConv):
    ndim: int = 3


class EqualizedLinear(nn.Module):
    """(reference: equalized.py:97-99 via Equalized(nn.Linear))"""

    in_channels: int
    out_channels: int
    equalized: bool = True
    lr_scale: float = 1.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        def weight_init(key, shape, dtype):
            w = jnp.asarray(
                nn.initializers.normal(stddev=1.0)(key, shape, jnp.float32))
            return (w / self.lr_scale).astype(dtype)

        weight = self.param("weight", weight_init,
                            (self.out_channels, self.in_channels), jnp.float32)
        y = x @ weight.T
        if self.equalized:
            he = math.sqrt(2.0 / self.in_channels)
            y = y * (he * self.lr_scale)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.out_channels,), jnp.float32)
            y = y + bias
        return y
