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
copy — all gone now that only the (N, K, 8) coordinates cross HBM.

Custom VJP (boundary at ``(vol, coords)`` — the per-axis factor
construction AND its derivative live inside the kernels; only the
linear ``_unnormalize`` chain from the [-1, 1] grid is outside):
- d/dcoords: per-slab ``dW_jx = g @ vol[jx]^T`` MXU dots in VMEM; the
  (N, K, J) cotangent never touches HBM. The w_zy cotangent is reduced
  separably in VMEM (``dwz = (dW_zy * wy_rep) @ S^T``, ``dwy = (dW_zy *
  wz_rep) @ T^T``), then each per-axis factor cotangent contracts with
  the ±1 tap-derivative selections so only the (N, K, 8) coordinate
  gradient crosses HBM.
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


def _axis_factor_vmem(x, size, padding_mode, dtype):
    """(BK, size) two-tap factor built IN VMEM from the (BK, 1) pixel
    coordinate — the kernel-side twin of ``gather_matmul._axis_factor``
    (identical math incl. the rounding to the compute dtype, so the fused
    path matches the matmul backend bit-for-bit). Building factors in the
    kernel replaces the (N, K, W+H+D) packed-factor HBM operand with an
    (N, K, 8) coordinate operand: each staged operand costs fixed async
    latency in the refinement loop (profiled ~0.3-0.6 ms/slice-start at
    the 8-hypothesis shape), and the XLA-side factor-construction
    fwd+bwd fusions disappear entirely."""
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, size - 1)
    i0 = jnp.floor(x)
    w1 = x - i0
    # Integer iota + cast: Mosaic rejects float-result tpu.iota directly.
    j = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], size),
                                 1).astype(jnp.float32)
    f = ((j == i0) * (1.0 - w1) + (j == (i0 + 1)) * w1)
    return f.astype(dtype)


def _axis_dfactor_vmem(x, size, padding_mode):
    """(BK, size) d(factor)/dx selection: +1 at the ceil tap, -1 at the
    floor tap (the floor() indicator itself carries no gradient), masked
    to zero where border clipping saturates — exactly XLA autodiff of
    ``_axis_factor``."""
    xc = jnp.clip(x, 0.0, size - 1) if padding_mode == "border" else x
    i0 = jnp.floor(xc)
    j = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], size),
                                 1).astype(jnp.float32)
    df = (j == (i0 + 1)).astype(jnp.float32) - (j == i0).astype(jnp.float32)
    if padding_mode == "border":
        valid = ((x >= 0.0) & (x <= size - 1)).astype(jnp.float32)
        df = df * valid
    return df


def _factors_from_coords(cf, w, h, d, padding_mode, dtype):
    """cf: (BK, 8) padded (x, y, z) pixel coords -> per-axis factors."""
    wx = _axis_factor_vmem(cf[:, 0:1], w, padding_mode, dtype)
    wy = _axis_factor_vmem(cf[:, 1:2], h, padding_mode, dtype)
    wz = _axis_factor_vmem(cf[:, 2:3], d, padding_mode, dtype)
    return wx, wy, wz


def _kernel_fwd(cf_ref, vol_ref, out_ref, *, w, h, d, padding_mode,
                out_dtype):
    """out[k, c] = sum_jx wx[k, jx] * ((wz (x) wy) @ vol[jx])[k, c]."""
    compute_dtype = vol_ref.dtype
    dh = d * h
    # The coords operand arrives transposed — (8, BK), samples on the
    # LANE dimension — so its HBM layout is lane-dense: an (N, Kp, 8)
    # operand tiles T(8,128) with only 8 of 128 lanes live, inflating
    # every staged DMA 16x (profiled 0.3-0.7 ms/slice-start spans in the
    # refinement loop). One in-VMEM transpose per grid step recovers the
    # (BK, 8) orientation the factor build wants.
    wx, wy, wz = _factors_from_coords(cf_ref[0].T, w, h, d, padding_mode,
                                      compute_dtype)
    wzy, _, _ = _zy_tile(wz, wy, compute_dtype)
    acc = None
    for jx in range(w):
        q = _dot(wzy, vol_ref[0, jx * dh:(jx + 1) * dh, :])  # (BK, C)
        term = wx[:, jx:jx + 1].astype(jnp.float32) * q
        acc = term if acc is None else acc + term
    out_ref[0] = acc.astype(out_dtype)


def _kernel_bwd_grid(cf_ref, g_ref, vol_ref, dcf_ref, *, w, h, d,
                     padding_mode):
    """Per-slab dW_jx = g @ vol[jx]^T (MXU, VMEM-resident), then separable
    VPU/MXU reductions: the per-axis factor cotangents contract with the
    tap derivatives (±1 selections) IN VMEM — only the (BK, 8) coordinate
    gradient leaves the kernel."""
    compute_dtype = vol_ref.dtype
    dh = d * h
    g = g_ref[0]
    cf = cf_ref[0].T  # lane-major operand -> (BK, 8); see _kernel_fwd
    wx, wy, wz = _factors_from_coords(cf, w, h, d, padding_mode,
                                      compute_dtype)
    wzy, wz_rep, wy_rep = _zy_tile(wz, wy, compute_dtype)
    wzy32 = wzy.astype(jnp.float32)
    dfx = _axis_dfactor_vmem(cf[:, 0:1], w, padding_mode)
    dfy = _axis_dfactor_vmem(cf[:, 1:2], h, padding_mode)
    dfz = _axis_dfactor_vmem(cf[:, 2:3], d, padding_mode)
    dx_acc = jnp.zeros((cf.shape[0], 1), jnp.float32)
    dwzy_acc = None
    for jx in range(w):
        dW = _dot(g, vol_ref[0, jx * dh:(jx + 1) * dh, :],
                  contract=((1,), (1,)))  # (BK, DH)
        dwx_col = (dW * wzy32).sum(axis=1, keepdims=True)
        dx_acc = dx_acc + dwx_col * dfx[:, jx:jx + 1]
        term = wx[:, jx:jx + 1].astype(jnp.float32) * dW
        dwzy_acc = term if dwzy_acc is None else dwzy_acc + term
    sel_z, sel_y = _sel_matrices(d, h, jnp.float32)
    dwy = _dot(dwzy_acc * wz_rep, sel_y, contract=((1,), (1,)))  # (BK, H)
    dwz = _dot(dwzy_acc * wy_rep, sel_z, contract=((1,), (1,)))  # (BK, D)
    # Transposed output rows (samples on lanes), matching the operand
    # layout so the cotangent leaving the kernel is lane-dense too.
    dcf_ref[0, 0:1, :] = dx_acc.T
    dcf_ref[0, 1:2, :] = (dwy * dfy).sum(axis=1, keepdims=True).T
    dcf_ref[0, 2:3, :] = (dwz * dfz).sum(axis=1, keepdims=True).T
    dcf_ref[0, 3:, :] = jnp.zeros((dcf_ref.shape[1] - 3, cf.shape[0]),
                                  jnp.float32)


def _kernel_bwd_vol(cf_ref, g_ref, out_ref, *, w, h, d, padding_mode,
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
    wx, wy, wz = _factors_from_coords(cf_ref[0].T, w, h, d, padding_mode,
                                      compute_dtype)
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


def _coords_spec(width):
    """Transposed coords/cotangent blocks: (1, 8, BK) with samples on the
    lane dimension — lane-dense HBM tiles (see _kernel_fwd)."""
    return pl.BlockSpec((1, width, _BK), lambda ni, ki: (ni, 0, ki),
                        memory_space=pltpu.VMEM)


def _fused_core(out_dtype, w, h, d, padding_mode, vol_x, coords):
    """vol_x: (NV, J', C) volume flattened in (x, z, y) order, bf16, with
    NV | N; coords: (N, 8, Kp) f32 padded (x, y, z) pixel coordinates,
    samples lane-major. Returns (N, Kp, C) in ``out_dtype`` (fp32
    accumulation)."""
    n, f, kp = coords.shape
    dh = d * h
    nv, _, c = vol_x.shape
    # Per-slab (BK,DH)@(DH,C) dots + in-lane wx weighting over n*kp/BK
    # tiles and w slabs (2*n*kp*(w*dh)*c MXU flops), plus the per-tile
    # factor build + w_zy selection dots.
    _record("fused_fwd", 2.0 * n * kp * w * dh * c + 2.0 * n * kp * w * c
            + 2.0 * n * kp * (d + h) * dh + 8.0 * n * kp * (w + h + d))
    return pl.pallas_call(
        functools.partial(_kernel_fwd, w=w, h=h, d=d,
                          padding_mode=padding_mode, out_dtype=out_dtype),
        grid=(n, kp // _BK),
        in_specs=[
            _coords_spec(f),
            pl.BlockSpec((1, w * dh, c), _vol_index_map(nv, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BK, c), lambda ni, ki: (ni, ki, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, kp, c), out_dtype),
        interpret=_interpret(),
    )(coords, vol_x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_sample(out_dtype, w, h, d, padding_mode, vol_x, coords):
    return _fused_core(out_dtype, w, h, d, padding_mode, vol_x, coords)


def _fused_fwd(out_dtype, w, h, d, padding_mode, vol_x, coords):
    return (_fused_core(out_dtype, w, h, d, padding_mode, vol_x, coords),
            (vol_x, coords))


def _fused_bwd(out_dtype, w, h, d, padding_mode, res, g):
    vol_x, coords = res
    compute_dtype = vol_x.dtype
    n, f, kp = coords.shape
    dh = d * h
    nv, _, c = vol_x.shape
    g16 = g.astype(compute_dtype)

    # dW_jx dots (2*n*kp*J*c) + separable reductions (VPU + selection dots).
    _record("fused_bwd_grid",
            2.0 * n * kp * w * dh * c + 3.0 * n * kp * w * dh
            + 4.0 * n * kp * (d + h) * dh + 16.0 * n * kp * (w + h + d))
    dcoords = pl.pallas_call(
        functools.partial(_kernel_bwd_grid, w=w, h=h, d=d,
                          padding_mode=padding_mode),
        grid=(n, kp // _BK),
        in_specs=[
            _coords_spec(f),
            pl.BlockSpec((1, _BK, c), lambda ni, ki: (ni, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w * dh, c), _vol_index_map(nv, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_coords_spec(f),
        out_shape=jax.ShapeDtypeStruct((n, f, kp), jnp.float32),
        interpret=_interpret(),
    )(coords, g16, vol_x)

    # Tap rebuild (n*kp*J VPU) + (DH,BK)@(BK,C) accumulation dots.
    _record("fused_bwd_vol",
            2.0 * n * kp * w * dh * c + 1.0 * n * kp * w * dh
            + 2.0 * n * kp * (d + h) * dh + 8.0 * n * kp * (w + h + d))
    dvol = pl.pallas_call(
        functools.partial(_kernel_bwd_vol, w=w, h=h, d=d,
                          padding_mode=padding_mode,
                          compute_dtype=compute_dtype, group=n // nv),
        grid=(n, kp // _BK),
        in_specs=[
            _coords_spec(f),
            pl.BlockSpec((1, _BK, c), lambda ni, ki: (ni, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w * dh, c), _vol_index_map(nv, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nv, w * dh, c), jnp.float32),
        interpret=_interpret(),
    )(coords, g16)

    return (dvol.astype(vol_x.dtype), dcoords)


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
    # (N, 8, Kp) padded pixel-coordinate operand, samples LANE-major (the
    # (N, K, 8) orientation tiles T(8,128) with 8 of 128 lanes live — a
    # 16x DMA inflation on every staging copy in the refinement loop) —
    # factors are built inside the kernels (see _axis_factor_vmem).
    # K-padding uses -2.0: zero taps and zero derivative in zeros mode; in
    # border mode the clip maps the pad to a full-weight corner tap, but
    # those rows are sliced off the forward output below and their
    # cotangent is zero-padded by the slice VJP, so neither the output nor
    # d/dvol sees them. (Do NOT use _fused_sample's unsliced output
    # directly in border mode.)
    coords = jnp.stack([x, y, z], axis=1)  # (N, 3, K)

    kp = _round_up(k, _BK)
    coords = jnp.pad(coords, ((0, 0), (0, 5), (0, kp - k)),
                     constant_values=-2.0)

    out = _fused_sample(out_dtype, w, h, d, padding_mode,
                        vol_x, coords)[:, :k]  # (N, K, C)
    if channels_last:
        return out.reshape(n, *out_spatial, c)
    return out.reshape(n, *out_spatial, c).transpose(0, 4, 1, 2, 3)
