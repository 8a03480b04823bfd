"""L2 NN building blocks (flax.linen)."""
from functools import partial

import jax
import jax.numpy as jnp

from .equalized import (  # noqa: F401
    EqualizedConv,
    EqualizedConv2d,
    EqualizedConv3d,
    EqualizedLinear,
)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pixel_norm_cl(x, eps):
    """PixelNorm with the channel dim trailing, reductions on the MXU.

    Under the channels-last layout the channel dim is the lane (minor)
    dim; ``jnp.mean(x**2, -1)`` lowers to cross-lane VPU shuffles that
    cost ~0.7 ms/iter on the flagship camera volumes (traced on v5e).
    Contracting against a ones vector instead puts both the forward
    sum(x^2) and the backward sum(g*x) on the MXU, with f32 accumulation
    (a strict numerics upgrade over a bf16 tree-reduce)."""
    y, _ = _pixel_norm_cl_fwd(x, eps)
    return y


def _channel_dot(a, b):
    """sum over the trailing (lane) dim via dot_general, f32 accumulate."""
    ones = jnp.ones((a.shape[-1],), a.dtype)
    prod = (a * b).reshape(-1, a.shape[-1])
    ss = jax.lax.dot_general(prod, ones, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return ss.reshape(*a.shape[:-1], 1)


def _pixel_norm_cl_fwd(x, eps):
    c = x.shape[-1]
    m = _channel_dot(x, x) / c
    inv = jax.lax.rsqrt(m + eps).astype(x.dtype)
    return x * inv, (x, inv)


def _pixel_norm_cl_bwd(eps, res, g):
    x, inv = res
    c = x.shape[-1]
    # y = x * inv, inv = (mean(x^2)+eps)^-1/2
    # dx = g*inv - x * inv^3 * sum(g*x)/C
    t = (_channel_dot(g, x) / c).astype(x.dtype)
    dx = g * inv - x * (inv * inv * inv) * t
    return (dx,)


_pixel_norm_cl.defvjp(_pixel_norm_cl_fwd, _pixel_norm_cl_bwd)


def pixel_norm(x, eps: float = 1e-8):
    """PixelNorm over the channel dim (dim 1, or the trailing dim under the
    channels-last layout policy) (reference: modules/__init__.py:8-15)."""
    from ..layout import channel_axis

    if channel_axis() == -1:
        return _pixel_norm_cl(x, eps)
    return x / jnp.sqrt(
        jnp.mean(x ** 2, axis=channel_axis(), keepdims=True) + eps)


from .blocks import (  # noqa: F401,E402
    Block,
    InputBlock,
    OutputBlock,
    count_blocks,
    create_block_defs,
)
from .unet import BaseUNet, UNet2d, UNet3d  # noqa: F401,E402
from .gru import ConvGRUCell  # noqa: F401,E402
from .lstm import ConvLSTMCell  # noqa: F401,E402
