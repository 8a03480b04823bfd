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
    """sum over the trailing (lane) dim via dot_general, f32 accumulate.

    Left as a dot-with-ones-VECTOR deliberately: XLA strength-reduces it
    to a lane reduce it can fuse into neighboring elementwise work. A
    rank-2 ones operand does survive simplification onto the MXU, but it
    lowers as a convolution whose (a*b) operand must be materialized to
    HBM — measured 2658 -> 2258 hyp/s (-15%) on the CEM coarse search.
    The one-pass Pallas kernel (ops/pallas_lrelu_pnorm.py) is the real
    fix for the lane-reduce cost where it matters."""
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


def _channel_sumsq(a, b, axis):
    """sum(a*b) over ``axis``; f32 accumulation, keepdims, f32 result."""
    if axis == -1:
        return _channel_dot(a, b)
    prod = (a * b).astype(jnp.float32)
    return jnp.sum(prod, axis=axis, keepdims=True)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _lrelu_pixel_norm_jnp(x, slope, eps, axis):
    """Fused ``pixel_norm(leaky_relu(x, slope))`` with a residual-lean VJP.

    Why fused: plain AD of ``jnp.where`` in leaky_relu saves the pred
    tensor for the backward, and the VJP residual set balloons. This VJP
    saves only ``(x, inv)`` and recomputes the sign in the backward; XLA
    is free to re-fuse the cheap elementwise recompute into the adjacent
    convs. (Measured neutral on the 8-hyp refinement wall-clock - XLA was
    already hiding its u16-packed pred behind the conv MXU time - but it
    halves the op's residual footprint, which matters at the 512-wide
    coarse-search batch.)
    """
    y, _ = _lrelu_pixel_norm_fwd(x, slope, eps, axis)
    return y


def _lrelu_pixel_norm_fwd(x, slope, eps, axis):
    u = jnp.where(x >= 0, x, slope * x)
    c = u.shape[axis]
    m = _channel_sumsq(u, u, axis).astype(jnp.float32) / c
    inv = jax.lax.rsqrt(m + eps).astype(x.dtype)
    return u * inv, (x, inv)


def _lrelu_pixel_norm_bwd(slope, eps, axis, res, g):
    x, inv = res
    u = jnp.where(x >= 0, x, slope * x)
    c = u.shape[axis]
    # y = u * inv; du = g*inv - u * inv^3 * sum(g*u)/C; dx = lrelu'(x) * du
    t = (_channel_sumsq(g, u, axis) / c).astype(x.dtype)
    du = g * inv - u * (inv * inv * inv) * t
    dx = jnp.where(x >= 0, du, slope * du)
    return (dx,)


_lrelu_pixel_norm_jnp.defvjp(_lrelu_pixel_norm_fwd, _lrelu_pixel_norm_bwd)


_LRELU_PNORM_BACKEND = "xla"  # 'xla' | 'pallas' | 'unfused'


def set_lrelu_pnorm_backend(mode: str) -> None:
    """Select the fused lrelu+pixelnorm implementation: 'xla' (default;
    jnp custom-VJP, lets XLA fuse into neighbors), 'pallas' (one-pass
    kernel per direction, trailing-channel layouts only), or 'unfused'
    (plain ``pixel_norm(leaky_relu(x))`` composition under AD, the
    pre-fusion behavior). A/B via ``bench.py --lrelu-pnorm-backend``."""
    global _LRELU_PNORM_BACKEND
    if mode not in ("xla", "pallas", "unfused"):
        raise ValueError(mode)
    _LRELU_PNORM_BACKEND = mode


def get_lrelu_pnorm_backend() -> str:
    return _LRELU_PNORM_BACKEND


def lrelu_pixel_norm(x, slope, eps, axis):
    """Fused ``pixel_norm(leaky_relu(x, slope))`` (see the backend docs on
    :func:`set_lrelu_pnorm_backend`)."""
    if _LRELU_PNORM_BACKEND == "unfused":
        u = jax.nn.leaky_relu(x, slope)
        if axis in (-1, x.ndim - 1):
            return _pixel_norm_cl(u, eps)
        return u / jnp.sqrt(
            jnp.mean(u ** 2, axis=axis, keepdims=True) + eps)
    if (_LRELU_PNORM_BACKEND == "pallas" and axis in (-1, x.ndim - 1)
            and x.shape[-1] >= 128):
        from ..ops.pallas_lrelu_pnorm import lrelu_pixel_norm_pallas

        return lrelu_pixel_norm_pallas(x, slope, eps)
    return _lrelu_pixel_norm_jnp(x, slope, eps, axis)


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
