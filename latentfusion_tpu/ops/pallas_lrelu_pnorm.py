"""Pallas TPU kernel: fused leaky_relu + PixelNorm, forward and backward.

Every ``Block`` in the reference architecture applies
``pixel_norm(leaky_relu(conv(x)))`` (reference: modules/blocks.py:136-164).
Under the channels-last layout the channel reduction sits on the lane
(minor) dim, where XLA's reduce fusions run far off bandwidth: the
flagship refinement trace attributes ~2 ms/iter to ``convert_reduce``
fusions that re-read each conv output volume, convert to f32, and do a
cross-lane tree reduce — plus a relayout copy of the volume bolted onto
the same fusion. Expressing the channel sum as a dot doesn't help: XLA
either strength-reduces a dot-with-ones-vector back into the same lane
reduce, or (for a rank-2 ones operand) lowers a convolution whose
``u*u`` operand must be materialized to HBM.

These kernels do the whole op in one pass per direction: rows are
independent, so the grid tiles the flattened (M, C) view and each block
computes the masked activation, the f32 channel sum (in registers), the
rsqrt, and the normalized output without touching HBM in between.

Forward:  u = where(x>=0, x, slope*x); inv = rsqrt(mean(u^2, -1) + eps)
          y = u * inv           (residuals: x, inv — no pred tensor)
Backward: t = mean(g*u, -1); du = g*inv - u*inv^3*t
          dx = where(x>=0, du, slope*du)

Numerics: the kernel computes in f32 internally (Mosaic has no bf16
vector compare, and f32 keeps the channel accumulation at MXU-equivalent
precision) and rounds outputs once — at least as accurate as the jnp
path, equal to it within one bf16 ulp.

Measured outcome on v5e (see docs/ARCHITECTURE.md "fused
leaky_relu+PixelNorm"): this kernel does NOT win on the flagship bench
shapes — CEM 2412 vs 2642 hyp/s, gradient 1012 vs 1019 — because XLA
already fuses the lane reduce into neighboring elementwise work and
``pallas_call`` is a fusion barrier. It ships as an A/B backend
(``modules.set_lrelu_pnorm_backend('pallas')``) for chips/shapes where
the reduce does surface as a standalone pass; the default stays the jnp
custom-VJP in ``modules.lrelu_pixel_norm``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.default_backend() != "tpu"


def _block_rows(m: int, c: int, itemsize: int) -> int:
    """Largest power-of-two divisor of m with a <=512 KiB activation block
    (f32 temporaries inside the kernel run 2x that; stay well under VMEM)."""
    del itemsize
    bm = 1
    while bm < 2048 and m % (bm * 2) == 0 and (bm * 2) * c * 4 <= (1 << 19):
        bm *= 2
    return bm


def _fwd_kernel(slope, eps, x_ref, y_ref, inv_ref):
    # f32 internally: Mosaic has no bf16 vector compare, and f32 keeps the
    # channel accumulation at MXU-equivalent precision.
    x = x_ref[...].astype(jnp.float32)
    u = jnp.where(x >= 0, x, slope * x)
    m = jnp.sum(u * u, axis=-1, keepdims=True) / x.shape[-1]
    inv = jax.lax.rsqrt(m + eps)
    y_ref[...] = (u * inv).astype(y_ref.dtype)
    inv_ref[...] = inv.astype(inv_ref.dtype)


def _bwd_kernel(slope, x_ref, inv_ref, g_ref, dx_ref):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    inv = inv_ref[...].astype(jnp.float32)
    u = jnp.where(x >= 0, x, slope * x)
    t = jnp.sum(g * u, axis=-1, keepdims=True) / x.shape[-1]
    du = g * inv - u * (inv * inv * inv) * t
    dx_ref[...] = jnp.where(x >= 0, du, slope * du).astype(dx_ref.dtype)


def _fwd_call(x2, slope, eps, interpret):
    m, c = x2.shape
    bm = _block_rows(m, c, x2.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, slope, eps),
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, c), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((bm, c), lambda i: (i, 0)),
                   pl.BlockSpec((bm, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((m, c), x2.dtype),
                   jax.ShapeDtypeStruct((m, 1), x2.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2)


def _bwd_call(x2, inv2, g2, slope, interpret):
    m, c = x2.shape
    bm = _block_rows(m, c, x2.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, slope),
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, c), lambda i: (i, 0)),
                  pl.BlockSpec((bm, 1), lambda i: (i, 0)),
                  pl.BlockSpec((bm, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, inv2, g2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def lrelu_pixel_norm_pallas(x, slope, eps, interpret=None):
    """Fused ``pixel_norm(leaky_relu(x, slope))`` over the trailing dim."""
    y, _ = _pallas_fwd(x, slope, eps, interpret)
    return y


def _pallas_fwd(x, slope, eps, interpret):
    if interpret is None:
        interpret = _interpret()
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    y2, inv2 = _fwd_call(x2, slope, eps, interpret)
    return y2.reshape(shape), (x2, inv2)


def _pallas_bwd(slope, eps, interpret, res, g):
    if interpret is None:
        interpret = _interpret()
    x2, inv2 = res
    g2 = g.reshape(x2.shape)
    dx2 = _bwd_call(x2, inv2, g2, slope, interpret)
    return (dx2.reshape(g.shape),)


lrelu_pixel_norm_pallas.defvjp(_pallas_fwd, _pallas_bwd)
