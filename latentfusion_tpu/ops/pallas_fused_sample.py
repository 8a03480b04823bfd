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
weight factorizes as ``W[k, jx*DH + zy] = wx[k, jx] * wz[k, jz] * wy[k,
jy]`` (the volume is flattened in (x, z, y) spatial order), so the
contraction decomposes over the W axis into per-slab MXU dots::

    out[k, c] = sum_jx wx[k, jx] * ((wz (x) wy) @ vol[jx])[k, c]

Each slab dot is a lane-aligned (BK, DH) @ (DH, C) matmul (256x256x256 at
the flagship 16^3 shape). The (BK, DH) ``w_zy = wz (x) wy`` outer-product
tile is built IN VMEM per tile from the per-axis factors via two tiny
selection matmuls (``wz @ S``, ``wy @ T`` with S/T 0-1 iota matrices —
everything stays 2D, which Mosaic lowers cleanly; 3D broadcast/reshape
variants hit "insertion of minor dim" limitations on v5e). Earlier
revisions materialized w_zy in HBM as a kernel input: at the CEM shape
that cost ~0.8 GB/iteration of write+read traffic plus an XLA layout
copy — all gone now that only the (N, K, 16) factors cross HBM.

Custom VJP (boundary at ``(vol, wx, wy, wz)``; the chain from the grid
coordinates through the per-axis factor construction is ordinary XLA
autodiff outside the kernel):
- d/dwx, d/dwy, d/dwz: per-slab ``dW_jx = g @ vol[jx]^T`` MXU dots in
  VMEM; the (N, K, J) cotangent never touches HBM. The w_zy cotangent is
  reduced separably in VMEM (``dwz = (dW_zy * wy_rep) @ S^T``,
  ``dwy = (dW_zy * wz_rep) @ T^T``) so only (N, K, 16) factors come back.
- d/dvol: ``(wx[:, jx] * w_zy)^T @ g`` accumulated over K tiles into a
  VMEM-resident block. Dead (DCE'd by XLA — it is a separate
  ``pallas_call`` feeding only the vol cotangent) in pose refinement
  where the volume is constant.

Numerics match ``grid_sample_3d_matmul`` exactly: identical factor values
(same ``_axis_factor``), bf16 taps, fp32 MXU accumulation. The
``out_dtype`` option stores the fp32 accumulator rounded once (used by
the decode path to hand bf16 straight to the next conv — the same values
the conv's own input convert would produce, minus ~0.8 GB/iteration of
f32 round-tripping at the CEM shape).

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


def _sel_matrices(d, h, dtype):
    """0-1 selection matrices turning per-axis factors into the flattened
    (z, y) tile: ``S[jz, j] = [j // h == jz]``, ``T[jy, j] = [j % h ==
    jy]`` so ``(wz @ S) * (wy @ T)`` is the (BK, D*H) outer-product tile.
    Pure 2D iota — Mosaic-safe on v5e."""
    dh = d * h
    j_d = jax.lax.broadcasted_iota(jnp.int32, (d, dh), 1)
    r_d = jax.lax.broadcasted_iota(jnp.int32, (d, dh), 0)
    sel_z = (j_d // h == r_d).astype(dtype)
    j_h = jax.lax.broadcasted_iota(jnp.int32, (h, dh), 1)
    r_h = jax.lax.broadcasted_iota(jnp.int32, (h, dh), 0)
    sel_y = (j_h % h == r_h).astype(dtype)
    return sel_z, sel_y


def _dot(a, b, contract=((1,), (0,))):
    return jax.lax.dot_general(a, b, dimension_numbers=(contract, ((), ())),
                               preferred_element_type=jnp.float32)


def _zy_tile(wz, wy, compute_dtype):
    """(BK, D*H) outer-product tile from (BK, D) and (BK, H) factors.
    f32 product rounded once to the compute dtype — identical values to
    the former HBM-materialized bf16 ``wz (x) wy``."""
    d, h = wz.shape[1], wy.shape[1]
    sel_z, sel_y = _sel_matrices(d, h, wz.dtype)
    wz_rep = _dot(wz, sel_z)  # (BK, DH) f32
    wy_rep = _dot(wy, sel_y)
    return (wz_rep * wy_rep).astype(compute_dtype), wz_rep, wy_rep


def _unpack_factors(wf, w, h, d):
    """wf: (BK, W+H+D) packed per-axis factors -> (wx, wy, wz) lane
    slices. ONE packed HBM operand per kernel instead of three: each
    async operand staging copy has a fixed latency on this backend
    (profiled ~0.3-0.6 ms per slice-start at the 8-hypothesis refinement
    shape), so operand count — not bytes — is what shows up in the loop."""
    return wf[:, :w], wf[:, w:w + h], wf[:, w + h:w + h + d]


def _kernel_fwd(wf_ref, vol_ref, out_ref, *, w, h, d, out_dtype):
    """out[k, c] = sum_jx wx[k, jx] * ((wz (x) wy) @ vol[jx])[k, c]."""
    compute_dtype = vol_ref.dtype
    dh = d * h
    wx, wy, wz = _unpack_factors(wf_ref[0], w, h, d)
    wzy, _, _ = _zy_tile(wz, wy, compute_dtype)
    acc = None
    for jx in range(w):
        q = _dot(wzy, vol_ref[0, jx * dh:(jx + 1) * dh, :])  # (BK, C)
        term = wx[:, jx:jx + 1].astype(jnp.float32) * q
        acc = term if acc is None else acc + term
    out_ref[0] = acc.astype(out_dtype)


def _kernel_bwd_grid(wf_ref, g_ref, vol_ref, dwf_ref, *, w, h, d):
    """Per-slab dW_jx = g @ vol[jx]^T (MXU, VMEM-resident), then separable
    VPU/MXU reductions: dwx[:, jx] = sum_zy dW_jx * w_zy; the accumulated
    w_zy cotangent reduces to dwz / dwy through the selection matrices —
    only the packed (BK, W+H+D) factor gradient leaves the kernel."""
    compute_dtype = vol_ref.dtype
    dh = d * h
    g = g_ref[0]
    wx, wy, wz = _unpack_factors(wf_ref[0], w, h, d)
    wzy, wz_rep, wy_rep = _zy_tile(wz, wy, compute_dtype)
    wzy32 = wzy.astype(jnp.float32)
    dwzy_acc = None
    for jx in range(w):
        dW = _dot(g, vol_ref[0, jx * dh:(jx + 1) * dh, :],
                  contract=((1,), (1,)))  # (BK, DH)
        dwf_ref[0, :, jx:jx + 1] = (dW * wzy32).sum(axis=1, keepdims=True)
        term = wx[:, jx:jx + 1].astype(jnp.float32) * dW
        dwzy_acc = term if dwzy_acc is None else dwzy_acc + term
    sel_z, sel_y = _sel_matrices(d, h, jnp.float32)
    dwf_ref[0, :, w:w + h] = _dot(dwzy_acc * wz_rep, sel_y,
                                  contract=((1,), (1,)))
    dwf_ref[0, :, w + h:w + h + d] = _dot(dwzy_acc * wy_rep, sel_z,
                                          contract=((1,), (1,)))


def _kernel_bwd_vol(wf_ref, g_ref, out_ref, *, w, h, d,
                    compute_dtype, group):
    """dvol[jx*DH + zy, c] += (wx[:, jx] * w_zy)^T @ g over K tiles (and
    over each object's ``group`` hypotheses when the volume is shared)."""
    dh = d * h
    k_step = pl.program_id(1)
    first = k_step == 0
    if group > 1:
        # Shared volume: the first (ni, ki) step of each object's
        # contiguous hypothesis block starts its accumulator.
        first = jnp.logical_and(pl.program_id(0) % group == 0, first)
    g = g_ref[0]
    wx, wy, wz = _unpack_factors(wf_ref[0], w, h, d)
    wzy, _, _ = _zy_tile(wz, wy, jnp.float32)
    for jx in range(w):
        tap = (wx[:, jx:jx + 1].astype(jnp.float32)
               * wzy).astype(compute_dtype)  # (BK, DH)
        partial = _dot(tap, g, contract=((0,), (0,)))  # (DH, C)

        @pl.when(first)
        def _():
            out_ref[0, jx * dh:(jx + 1) * dh, :] = partial

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[0, jx * dh:(jx + 1) * dh, :] = (
                out_ref[0, jx * dh:(jx + 1) * dh, :] + partial)


def _interpret():
    return jax.default_backend() != "tpu"


def _vol_index_map(nv, n):
    """Volume block index: a shared (NV, J', C) volume (NV | N, object-major
    hypothesis blocks) serves each object's hypotheses from its single HBM
    block without an N-way broadcast. Mosaic keeps the block resident
    across grid steps whose index is unchanged, so each object's volume is
    fetched once per contiguous run, not once per hypothesis."""
    if nv == 1:
        return lambda ni, ki: (0, 0, 0)
    if nv == n:
        return lambda ni, ki: (ni, 0, 0)
    group = n // nv
    return lambda ni, ki: (ni // group, 0, 0)


def _factor_spec(width):
    return pl.BlockSpec((1, _BK, width), lambda ni, ki: (ni, ki, 0),
                        memory_space=pltpu.VMEM)


def _fused_core(out_dtype, w, h, d, vol_x, wf):
    """vol_x: (NV, J', C) volume flattened in (x, z, y) order, bf16, with
    NV | N; wf: (N, Kp, W+H+D) packed per-axis factors.
    Returns (N, Kp, C) in ``out_dtype`` (fp32 accumulation)."""
    n, kp, f = wf.shape
    dh = d * h
    nv, _, c = vol_x.shape
    # Per-slab (BK,DH)@(DH,C) dots + in-lane wx weighting over n*kp/BK
    # tiles and w slabs (2*n*kp*(w*dh)*c MXU flops), plus the per-tile
    # w_zy build (two (BK,D|H)@(D|H,DH) selection dots).
    _record("fused_fwd", 2.0 * n * kp * w * dh * c + 2.0 * n * kp * w * c
            + 2.0 * n * kp * (d + h) * dh)
    return pl.pallas_call(
        functools.partial(_kernel_fwd, w=w, h=h, d=d, out_dtype=out_dtype),
        grid=(n, kp // _BK),
        in_specs=[
            _factor_spec(f),
            pl.BlockSpec((1, w * dh, c), _vol_index_map(nv, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BK, c), lambda ni, ki: (ni, ki, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, kp, c), out_dtype),
        interpret=_interpret(),
    )(wf, vol_x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_sample(out_dtype, w, h, d, vol_x, wf):
    return _fused_core(out_dtype, w, h, d, vol_x, wf)


def _fused_fwd(out_dtype, w, h, d, vol_x, wf):
    return _fused_core(out_dtype, w, h, d, vol_x, wf), (vol_x, wf)


def _fused_bwd(out_dtype, w, h, d, res, g):
    vol_x, wf = res
    compute_dtype = vol_x.dtype
    n, kp, f = wf.shape
    dh = d * h
    nv, _, c = vol_x.shape
    g16 = g.astype(compute_dtype)

    # dW_jx dots (2*n*kp*J*c) + separable reductions (VPU + selection dots).
    _record("fused_bwd_grid",
            2.0 * n * kp * w * dh * c + 3.0 * n * kp * w * dh
            + 4.0 * n * kp * (d + h) * dh)
    dwf = pl.pallas_call(
        functools.partial(_kernel_bwd_grid, w=w, h=h, d=d),
        grid=(n, kp // _BK),
        in_specs=[
            _factor_spec(f),
            pl.BlockSpec((1, _BK, c), lambda ni, ki: (ni, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w * dh, c), _vol_index_map(nv, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_factor_spec(f),
        out_shape=jax.ShapeDtypeStruct((n, kp, f), jnp.float32),
        interpret=_interpret(),
    )(wf, g16, vol_x)

    # Tap rebuild (n*kp*J VPU) + (DH,BK)@(BK,C) accumulation dots.
    _record("fused_bwd_vol",
            2.0 * n * kp * w * dh * c + 1.0 * n * kp * w * dh
            + 2.0 * n * kp * (d + h) * dh)
    dvol = pl.pallas_call(
        functools.partial(_kernel_bwd_vol, w=w, h=h, d=d,
                          compute_dtype=compute_dtype, group=n // nv),
        grid=(n, kp // _BK),
        in_specs=[
            _factor_spec(f),
            pl.BlockSpec((1, _BK, c), lambda ni, ki: (ni, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w * dh, c), _vol_index_map(nv, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nv, w * dh, c), jnp.float32),
        interpret=_interpret(),
    )(wf, g16)

    return (dvol.astype(vol_x.dtype), dwf.astype(wf.dtype))


_fused_sample.defvjp(_fused_fwd, _fused_bwd)


def fused_qualifies(spatial, c: int, k: int) -> bool:
    """Shapes the fused kernel dispatches for (else: matmul backend)."""
    import math

    j = math.prod(spatial)
    return (j <= MAX_FUSED_VOXELS and c >= MIN_FUSED_CHANNELS
            and c % 128 == 0 and spatial[0] * spatial[1] >= 128
            and k >= _BK)


def grid_sample_3d_fused(input, grid, padding_mode: str = "zeros",
                         channels_last: bool = False, out_dtype=None):
    """Drop-in for ``grid_sample_3d_matmul`` via the fused Pallas kernels.

    input: (NV, C, D, H, W), or (NV, D, H, W, C) with ``channels_last``,
        where NV divides the grid batch N (a shared volume is served to
        each of its hypotheses straight from its single HBM block, no
        broadcast).
    grid: (N, Do, Ho, Wo, 3) with (x, y, z) in [-1, 1].
    out_dtype: output dtype (default fp32; accumulation is fp32 always).
    """
    compute_dtype = get_compute_dtype()
    out_dtype = jnp.dtype(out_dtype or jnp.float32)
    if channels_last:
        nv, d, h, w, c = input.shape
        vol = input
    else:
        nv, c, d, h, w = input.shape
        vol = input.transpose(0, 2, 3, 4, 1)  # (NV, D, H, W, C)
    n = grid.shape[0]
    if n % nv != 0:
        raise ValueError(f"volume batch {nv} must divide grid batch {n}")
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
    # Packed (N, K, W+H+D) factor operand — one staged HBM operand per
    # kernel (see _unpack_factors).
    wf = jnp.concatenate([wx, wy, wz], axis=-1)

    kp = _round_up(k, _BK)
    if kp != k:
        wf = jnp.pad(wf, ((0, 0), (0, kp - k), (0, 0)))

    out = _fused_sample(out_dtype, w, h, d, vol_x, wf)[:, :k]  # (N, K, C)
    if channels_last:
        return out.reshape(n, *out_spatial, c)
    return out.reshape(n, *out_spatial, c).transpose(0, 4, 1, 2, 3)
