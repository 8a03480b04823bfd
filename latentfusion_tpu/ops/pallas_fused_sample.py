"""Fused trilinear volume sampler: tap-matrix tiles built in VMEM.

Why this exists (round-3 profile, TPU v5e): the one-hot matmul sampler
(``ops/gather_matmul.py``) is MXU-friendly but MATERIALIZES the (N, K, J)
tap matrix through HBM — at the flagship refinement shape that is ~1 GB of
traffic per 8-hypothesis forward (and ~17 GB per 128-hypothesis CEM
iteration), which is what bounds the measured 1.3 ms forward; the matmul
itself is 0.35 ms of MXU work. The older ``ops/pallas_volume.py`` kernel
also avoids HBM taps but rebuilds each (BK, BJ) tile with full-width iota
comparisons (~10 VPU ops/element — measured as slow as the matmul).

This kernel never builds the (K, J) tap matrix at all. The trilinear tap
weight factorizes as ``W[k, jx*DH + zy] = wx[k, jx] * w_zy[k, zy]`` (the
volume is flattened in (x, z, y) spatial order), so the contraction
decomposes over the W axis into per-slab MXU dots::

    out[k, c] = sum_jx wx[k, jx] * (w_zy @ vol[jx])[k, c]

Each slab dot is a lane-aligned (BK, DH) @ (DH, C) matmul (256x256x256 at
the flagship 16^3 shape) and the wx weighting is a 2-op in-lane broadcast
multiply-accumulate — everything stays 2D, which Mosaic lowers cleanly
(3D broadcast/reshape variants hit "insertion of minor dim" / minor-dim
split limitations on v5e).

Custom VJP (boundary at ``(vol, wx, w_zy)``; the chain from the grid
coordinates through the per-axis factor construction and the tiny
``w_zy = wz (x) wy`` outer product is ordinary XLA autodiff outside the
kernel):
- d/dwx, d/dw_zy: per-slab ``dW_jx = g @ vol[jx]^T`` MXU dots in VMEM,
  reduced separably on the VPU — the (N, K, J) cotangent never touches
  HBM either.
- d/dvol: ``(wx[:, jx] * w_zy)^T @ g`` accumulated over K tiles into a
  VMEM-resident block. Dead (DCE'd by XLA — it is a separate
  ``pallas_call`` feeding only the vol cotangent) in pose refinement
  where the volume is constant.

Numerics match ``grid_sample_3d_matmul`` exactly: identical factor values
(same ``_axis_factor``), bf16 taps, fp32 MXU accumulation.

Reference behavior replicated: ``F.grid_sample(mode='bilinear',
align_corners=False)`` with zeros/border padding
(reference: latentfusion/modules/geometry.py:16-17, 625-690).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import get_compute_dtype
from .gather_matmul import _axis_factor
from .grid_sample import _unnormalize

# Qualification bounds for the fused path (fall back to the matmul
# otherwise): the whole per-batch volume block must fit VMEM comfortably.
MAX_FUSED_VOXELS = 17 ** 3
MIN_FUSED_CHANNELS = 64

_BK = 256  # samples per tile

# Trace-time analytic FLOPs recorder (see ``record_flops``): XLA's
# ``compiled.cost_analysis()`` reports 0 FLOPs for Pallas custom calls, so
# benchmarks that probe executed work from the compiled executable would
# silently under-count the fused sampler. Each kernel records
# ``(tag, flops)`` here while being *traced*; bench.py sums the tags that
# survive DCE for its differentiation pattern (``bwd_vol`` is a separate
# pallas_call feeding only the volume cotangent, so it is dead whenever
# the volume is not differentiated — pose refinement).
_FLOP_TRACE = None


class record_flops:
    """Context manager: collect analytic (tag, flops) for every fused
    sampler kernel traced inside the context."""

    def __enter__(self):
        global _FLOP_TRACE
        self._prev = _FLOP_TRACE
        _FLOP_TRACE = []
        return _FLOP_TRACE

    def __exit__(self, *exc):
        global _FLOP_TRACE
        _FLOP_TRACE = self._prev
        return False


def _record(tag, flops):
    if _FLOP_TRACE is not None:
        _FLOP_TRACE.append((tag, float(flops)))


def _round_up(v, m):
    return (v + m - 1) // m * m


def _kernel_fwd(wx_ref, wzy_ref, vol_ref, out_ref, *, w, dh):
    """out[k, c] = sum_jx wx[k, jx] * (w_zy @ vol[jx])[k, c]."""
    wzy = wzy_ref[0]
    acc = None
    for jx in range(w):
        q = jax.lax.dot_general(
            wzy, vol_ref[0, jx * dh:(jx + 1) * dh, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (BK, C)
        term = wx_ref[0][:, jx:jx + 1].astype(jnp.float32) * q
        acc = term if acc is None else acc + term
    out_ref[0] = acc


def _kernel_bwd_grid(wx_ref, wzy_ref, g_ref, vol_ref, dwx_ref, dwzy_ref):
    """Per-slab dW_jx = g @ vol[jx]^T (MXU, VMEM-resident), then separable
    VPU reductions: dwx[:, jx] = sum_zy dW_jx * w_zy,
    dw_zy += wx[:, jx] * dW_jx."""
    w = wx_ref.shape[2]
    dh = wzy_ref.shape[2]
    g = g_ref[0]
    wzy = wzy_ref[0].astype(jnp.float32)
    dwzy_acc = None
    for jx in range(w):
        dW = jax.lax.dot_general(
            g, vol_ref[0, jx * dh:(jx + 1) * dh, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (BK, DH)
        dwx_ref[0, :, jx:jx + 1] = (dW * wzy).sum(axis=1, keepdims=True)
        term = wx_ref[0][:, jx:jx + 1].astype(jnp.float32) * dW
        dwzy_acc = term if dwzy_acc is None else dwzy_acc + term
    dwzy_ref[0] = dwzy_acc


def _kernel_bwd_vol(wx_ref, wzy_ref, g_ref, out_ref, *, w, dh,
                    compute_dtype, shared_vol):
    """dvol[jx*DH + zy, c] += (wx[:, jx] * w_zy)^T @ g over K tiles (and
    over hypotheses too when the volume is shared)."""
    k_step = pl.program_id(1)
    first = k_step == 0
    if shared_vol:
        # Shared volume: every (ni, ki) step accumulates into block 0.
        first = jnp.logical_and(pl.program_id(0) == 0, first)
    g = g_ref[0]
    wzy = wzy_ref[0].astype(jnp.float32)
    for jx in range(w):
        tap = (wx_ref[0][:, jx:jx + 1].astype(jnp.float32)
               * wzy).astype(compute_dtype)  # (BK, DH)
        partial = jax.lax.dot_general(
            tap, g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (DH, C)

        @pl.when(first)
        def _():
            out_ref[0, jx * dh:(jx + 1) * dh, :] = partial

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[0, jx * dh:(jx + 1) * dh, :] = (
                out_ref[0, jx * dh:(jx + 1) * dh, :] + partial)


def _interpret():
    return jax.default_backend() != "tpu"


def _vol_index_map(nv):
    """Volume block index: a shared (1, J', C) volume serves every
    hypothesis without an N-way HBM broadcast."""
    if nv == 1:
        return lambda ni, ki: (0, 0, 0)
    return lambda ni, ki: (ni, 0, 0)


def _fused_core(vol_x, wx, wzy):
    """vol_x: (NV, J', C) volume flattened in (x, z, y) order, bf16, with
    NV in {1, N}; wx: (N, Kp, W), wzy: (N, Kp, D*H) factors.
    Returns (N, Kp, C) fp32."""
    n, kp, w = wx.shape
    dh = wzy.shape[2]
    nv, _, c = vol_x.shape
    # Per-slab (BK,DH)@(DH,C) dots + in-lane wx weighting, over n*kp/BK
    # tiles and w slabs: 2*n*kp*(w*dh)*c MXU flops (+ O(n*kp*w*c) VPU).
    _record("fused_fwd", 2.0 * n * kp * w * dh * c + 2.0 * n * kp * w * c)
    return pl.pallas_call(
        functools.partial(_kernel_fwd, w=w, dh=dh),
        grid=(n, kp // _BK),
        in_specs=[
            pl.BlockSpec((1, _BK, w), lambda ni, ki: (ni, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BK, dh), lambda ni, ki: (ni, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w * dh, c), _vol_index_map(nv),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BK, c), lambda ni, ki: (ni, ki, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, kp, c), jnp.float32),
        interpret=_interpret(),
    )(wx, wzy, vol_x)


@jax.custom_vjp
def _fused_sample(vol_x, wx, wzy):
    return _fused_core(vol_x, wx, wzy)


def _fused_fwd(vol_x, wx, wzy):
    return _fused_core(vol_x, wx, wzy), (vol_x, wx, wzy)


def _fused_bwd(res, g):
    vol_x, wx, wzy = res
    compute_dtype = vol_x.dtype
    n, kp, w = wx.shape
    dh = wzy.shape[2]
    nv, _, c = vol_x.shape
    g16 = g.astype(compute_dtype)

    # dW_jx dots (2*n*kp*J*c) + separable VPU reductions (~3*n*kp*J).
    _record("fused_bwd_grid",
            2.0 * n * kp * w * dh * c + 3.0 * n * kp * w * dh)
    dwx, dwzy = pl.pallas_call(
        _kernel_bwd_grid,
        grid=(n, kp // _BK),
        in_specs=[
            pl.BlockSpec((1, _BK, w), lambda ni, ki: (ni, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BK, dh), lambda ni, ki: (ni, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BK, c), lambda ni, ki: (ni, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w * dh, c), _vol_index_map(nv),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _BK, w), lambda ni, ki: (ni, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BK, dh), lambda ni, ki: (ni, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, kp, w), jnp.float32),
            jax.ShapeDtypeStruct((n, kp, dh), jnp.float32),
        ],
        interpret=_interpret(),
    )(wx, wzy, g16, vol_x)

    # Tap rebuild (n*kp*J VPU) + (DH,BK)@(BK,C) accumulation dots.
    _record("fused_bwd_vol",
            2.0 * n * kp * w * dh * c + 1.0 * n * kp * w * dh)
    dvol = pl.pallas_call(
        functools.partial(_kernel_bwd_vol, w=w, dh=dh,
                          compute_dtype=compute_dtype, shared_vol=nv == 1),
        grid=(n, kp // _BK),
        in_specs=[
            pl.BlockSpec((1, _BK, w), lambda ni, ki: (ni, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BK, dh), lambda ni, ki: (ni, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BK, c), lambda ni, ki: (ni, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w * dh, c), _vol_index_map(nv),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nv, w * dh, c), jnp.float32),
        interpret=_interpret(),
    )(wx, wzy, g16)

    return (dvol.astype(vol_x.dtype), dwx.astype(wx.dtype),
            dwzy.astype(wzy.dtype))


_fused_sample.defvjp(_fused_fwd, _fused_bwd)


def fused_qualifies(spatial, c: int, k: int) -> bool:
    """Shapes the fused kernel dispatches for (else: matmul backend)."""
    import math

    j = math.prod(spatial)
    return (j <= MAX_FUSED_VOXELS and c >= MIN_FUSED_CHANNELS
            and c % 128 == 0 and spatial[0] * spatial[1] >= 128
            and k >= _BK)


def grid_sample_3d_fused(input, grid, padding_mode: str = "zeros",
                         channels_last: bool = False):
    """Drop-in for ``grid_sample_3d_matmul`` via the fused Pallas kernels.

    input: (NV, C, D, H, W), or (NV, D, H, W, C) with ``channels_last``,
        where NV is the grid batch N or 1 (shared volume — served to every
        hypothesis straight from its single HBM block, no broadcast).
    grid: (N, Do, Ho, Wo, 3) with (x, y, z) in [-1, 1].
    """
    compute_dtype = get_compute_dtype()
    if channels_last:
        nv, d, h, w, c = input.shape
        vol = input
    else:
        nv, c, d, h, w = input.shape
        vol = input.transpose(0, 2, 3, 4, 1)  # (NV, D, H, W, C)
    n = grid.shape[0]
    if nv not in (1, n):
        raise ValueError(f"volume batch {nv} vs grid batch {n}")
    out_spatial = grid.shape[1:4]
    k = grid.reshape(n, -1, 3).shape[1]

    # (x, z, y) flattening: j' = jx*(D*H) + jz*H + jy — see module
    # docstring (keeps the kernel's slab dots lane-aligned). Loop-invariant
    # in pose estimation (the volume depends only on the latent object), so
    # XLA hoists this transpose out of the refinement/CEM loops.
    vol_x = vol.transpose(0, 3, 1, 2, 4).reshape(nv, w * d * h, c)
    vol_x = vol_x.astype(compute_dtype)

    g = grid.reshape(n, -1, 3).astype(jnp.float32)
    x = _unnormalize(g[..., 0], w)
    y = _unnormalize(g[..., 1], h)
    z = _unnormalize(g[..., 2], d)
    wx = _axis_factor(x, w, padding_mode, compute_dtype)
    wy = _axis_factor(y, h, padding_mode, compute_dtype)
    wz = _axis_factor(z, d, padding_mode, compute_dtype)
    # Tiny (K, D, H) outer product OUTSIDE the kernel: its autodiff (the
    # d/dwz, d/dwy chain back to the grid) is ordinary XLA.
    wzy = (wz[:, :, :, None] * wy[:, :, None, :]).reshape(n, k, d * h)

    kp = _round_up(k, _BK)
    if kp != k:
        wx = jnp.pad(wx, ((0, 0), (0, kp - k), (0, 0)))
        wzy = jnp.pad(wzy, ((0, 0), (0, kp - k), (0, 0)))

    out = _fused_sample(vol_x, wx, wzy)[:, :k]  # (N, K, C) fp32
    if channels_last:
        return out.reshape(n, *out_spatial, c)
    return out.reshape(n, *out_spatial, c).transpose(0, 4, 1, 2, 3)
