"""Trilinear 3D grid sampling as one-hot matmuls on the MXU.

TPU profile (tools/profile_decode.py): the gather-based 3D grid sample is
~97% of the flagship decode forward — XLA lowers per-voxel gathers to slow
scalar loads. For the latent volumes used here (16^3 voxels) the sampling is
a sparse matrix W (8 nonzeros per row, the trilinear corner taps) applied as
``out[n,c,k] = sum_j W[n,k,j] vol[n,c,j]`` — dense-matmul work the MXU eats.

The trilinear kernel is separable per *sample*: W[k, (jz,jy,jx)] =
Wz[k,jz] * Wy[k,jy] * Wx[k,jx] where each factor has two nonzeros. W is
therefore built as three tiny (K, axis) one-hot factors expanded by
broadcasting — a few hundred M VPU ops — rather than full-width one-hot
comparisons over all J columns (which profiled as slow as the gather).

Semantics identical to ``grid_sample_3d`` (torch align_corners=False,
zeros/border padding); gradients flow through the axis weights via plain
autodiff — this is a MEASURED choice, not an omission. A hand-written
custom VJP (d/dvol = Wᵀ·g reusing the saved taps; d/dgrid = one
d/dW-shaped matmul + separable per-axis contractions) benchmarked SLOWER
than autodiff at flagship shapes on TPU v5e (tools/bench_sampler.py:
autodiff fwd+bwd 2.56 ms vs custom 3.63 ms for (8, 256, 16^3)->16^3):
XLA fuses the d/dW dot into its broadcast-reduce consumers, while the
custom rule materializes the (N, K, J) intermediate through HBM. Used
automatically by ``transforms`` for volumes up to MAX_MATMUL_VOXELS.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..dtypes import get_compute_dtype
from .grid_sample import _unnormalize

MAX_MATMUL_VOXELS = 17 ** 3  # W is (K, J): 16^3 -> 33MB/hyp bf16.


def _axis_factor(coord, size: int, padding_mode: str, dtype):
    """(N, K, size) two-tap interpolation factor along one axis.

    Out-of-range taps get weight zero (zeros padding) because the clipped
    index comparison only matches when the tap is in range.
    """
    if padding_mode == "border":
        coord = jnp.clip(coord, 0.0, size - 1)
    i0 = jnp.floor(coord)
    w1 = coord - i0
    j = jnp.arange(size, dtype=jnp.float32)[None, None, :]
    f = ((j == i0[..., None]) * (1.0 - w1[..., None])
         + (j == (i0 + 1)[..., None]) * w1[..., None])
    return f.astype(dtype)


def _expand_taps(wz, wy, wx, n):
    """(N, K, D)·(N, K, H)·(N, K, W) -> full (N, K, D*H*W) tap matrix."""
    return (wz[:, :, :, None, None]
            * wy[:, :, None, :, None]
            * wx[:, :, None, None, :]).reshape(n, wz.shape[1], -1)


def _tap_weights(grid, dims, padding_mode, compute_dtype):
    """(N, K, J) trilinear tap matrix from a flat (N, K, 3) grid."""
    d, h, w = dims
    x = _unnormalize(grid[..., 0], w)
    y = _unnormalize(grid[..., 1], h)
    z = _unnormalize(grid[..., 2], d)
    wx = _axis_factor(x, w, padding_mode, compute_dtype)
    wy = _axis_factor(y, h, padding_mode, compute_dtype)
    wz = _axis_factor(z, d, padding_mode, compute_dtype)
    return _expand_taps(wz, wy, wx, grid.shape[0])


def _sample_matmul_impl(input, grid, dims, padding_mode, compute_dtype):
    """input: (N, C, J) flat volume; grid: (N, K, 3) [-1,1] (x,y,z) coords;
    dims = (d, h, w) with J == d*h*w."""
    weight = _tap_weights(grid, dims, padding_mode, compute_dtype)
    vol = input.astype(compute_dtype)
    return jnp.einsum("nkj,ncj->nck", weight, vol,
                      preferred_element_type=jnp.float32)


def grid_sample_3d_taps(input, grid, padding_mode: str = "border"):
    """Channels-last 8-corner tap gather (trilinear, torch
    align_corners=False semantics).

    input: (N, D, H, W, C); grid: (N, Do, Ho, Wo, 3) with (x, y, z).

    Each tap reads a C-contiguous row of the flattened (N, J, C) volume
    via ``take_along_axis`` — on TPU these vectorize over the lane (C)
    dimension, unlike the NCDHW gather whose unit-sized minor dim lowers
    to scalar loads (ops/grid_sample.py). FLOPs are ~8 taps/output instead
    of the dense (N,K,J) one-hot matmul; d/dgrid flows through the tap
    weights. d/dvol is a scatter — dead in pose refinement (the sampled
    volume is constant w.r.t. camera params), so this backend suits the
    refinement loop; prefer the matmul when vol gradients are needed.
    """
    if padding_mode != "border":
        raise NotImplementedError(
            "taps backend implements border padding (the volume "
            "transforms' mode); use gather/matmul for zeros")
    n, d, h, w, c = input.shape
    out_spatial = grid.shape[1:4]
    flat = input.reshape(n, -1, c)
    g = grid.reshape(n, -1, 3).astype(jnp.float32)
    x = jnp.clip(_unnormalize(g[..., 0], w), 0.0, w - 1)
    y = jnp.clip(_unnormalize(g[..., 1], h), 0.0, h - 1)
    z = jnp.clip(_unnormalize(g[..., 2], d), 0.0, d - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx = x - x0
    fy = y - y0
    fz = z - z0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)
    out = jnp.zeros((n, g.shape[1], c), dtype=jnp.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                xi = jnp.minimum(x0i + dx, w - 1)
                yi = jnp.minimum(y0i + dy, h - 1)
                zi = jnp.minimum(z0i + dz, d - 1)
                j = (zi * h + yi) * w + xi
                wgt = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                       * (fz if dz else 1 - fz))
                taps = jnp.take_along_axis(flat, j[..., None], axis=1)
                out = out + wgt[..., None] * taps.astype(jnp.float32)
    return out.reshape(n, *out_spatial, c)


def grid_sample_3d_matmul(input, grid, padding_mode: str = "zeros",
                          compute_dtype=None, channels_last: bool = False):
    """Drop-in for ``grid_sample_3d(mode='bilinear')`` on small volumes.

    input: (N, C, D, H, W) — or (N, D, H, W, C) with ``channels_last``, in
    which case the sampler contracts ``(N,K,J)x(N,J,C)->(N,K,C)`` so its
    output feeds channels-last convs with no physical transpose (layout.py).
    grid: (N, Do, Ho, Wo, 3) with (x, y, z).
    """
    if compute_dtype is None:
        compute_dtype = get_compute_dtype()
    out_spatial = grid.shape[1:4]
    n = input.shape[0]
    g = grid.reshape(n, -1, 3).astype(jnp.float32)
    if channels_last:
        d, h, w, c = input.shape[1:]
        weight = _tap_weights(g, (d, h, w), padding_mode, compute_dtype)
        vol = input.reshape(n, -1, c).astype(compute_dtype)
        out = jnp.einsum("nkj,njc->nkc", weight, vol,
                         preferred_element_type=jnp.float32)
        return out.reshape(n, *out_spatial, c).astype(jnp.float32)
    c, d, h, w = input.shape[1:]
    flat = input.reshape(n, c, -1).astype(jnp.float32)
    out = _sample_matmul_impl(flat, g, (d, h, w), padding_mode,
                              compute_dtype)
    return out.reshape(n, c, *out_spatial).astype(jnp.float32)
