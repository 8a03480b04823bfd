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
zeros/border padding). The backward is a custom VJP that keeps every
cotangent on the MXU (VERDICT.md round-1 item #3):

- d/dvol   = Wᵀ·g — one more matmul of the forward's shape;
- d/dgrid  factors through the separable structure: replacing one axis
  factor with its derivative gives another sampling matmul, and the
  coordinate cotangent is its channel-dot with g.

Autodiff instead materializes d/dW (N,K,J fp32 — half a GB at flagship
shapes) and chains memory-bound broadcast-reduce passes through the factor
product; the custom rule recomputes the cheap VPU factors and spends the
HBM budget on matmuls. Used automatically by ``transforms`` for volumes up
to MAX_MATMUL_VOXELS.
"""
from __future__ import annotations

import functools

import jax
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


def _axis_factor_grad(coord, size: int, padding_mode: str, dtype):
    """d(_axis_factor)/d(coord): two-tap derivative factor, (N, K, size).

    f = (j==i0)(1-w1) + (j==i0+1)w1, so df/dcoord = (j==i0+1) - (j==i0);
    with border padding, clipping zeroes the derivative outside [0, size-1].
    """
    if padding_mode == "border":
        inside = ((coord > 0.0) & (coord < size - 1)).astype(jnp.float32)
        coord = jnp.clip(coord, 0.0, size - 1)
    else:
        inside = jnp.ones_like(coord)
    i0 = jnp.floor(coord)
    j = jnp.arange(size, dtype=jnp.float32)[None, None, :]
    df = ((j == (i0 + 1)[..., None]).astype(jnp.float32)
          - (j == i0[..., None]).astype(jnp.float32))
    return (df * inside[..., None]).astype(dtype)


def _expand_taps(wz, wy, wx, n):
    """(N, K, D)·(N, K, H)·(N, K, W) -> full (N, K, D*H*W) tap matrix."""
    return (wz[:, :, :, None, None]
            * wy[:, :, None, :, None]
            * wx[:, :, None, None, :]).reshape(n, wz.shape[1], -1)


def _sample_matmul_impl(input, grid, dims, padding_mode, compute_dtype):
    """input: (N, C, J) flat volume; grid: (N, K, 3) [-1,1] (x,y,z) coords;
    dims = (d, h, w) with J == d*h*w."""
    n, c, _ = input.shape
    d, h, w = dims
    x = _unnormalize(grid[..., 0], w)
    y = _unnormalize(grid[..., 1], h)
    z = _unnormalize(grid[..., 2], d)
    wx = _axis_factor(x, w, padding_mode, compute_dtype)
    wy = _axis_factor(y, h, padding_mode, compute_dtype)
    wz = _axis_factor(z, d, padding_mode, compute_dtype)
    weight = _expand_taps(wz, wy, wx, n)
    vol = input.astype(compute_dtype)
    return jnp.einsum("nkj,ncj->nck", weight, vol,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _sample_flat(input, grid, dims, padding_mode, compute_dtype):
    return _sample_matmul_impl(input, grid, dims, padding_mode, compute_dtype)


def _sample_flat_fwd(input, grid, dims, padding_mode, compute_dtype):
    n = input.shape[0]
    d, h, w = dims
    x = _unnormalize(grid[..., 0], w)
    y = _unnormalize(grid[..., 1], h)
    z = _unnormalize(grid[..., 2], d)
    wx = _axis_factor(x, w, padding_mode, compute_dtype)
    wy = _axis_factor(y, h, padding_mode, compute_dtype)
    wz = _axis_factor(z, d, padding_mode, compute_dtype)
    weight = _expand_taps(wz, wy, wx, n)
    out = jnp.einsum("nkj,ncj->nck", weight, input.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    # Save the expanded tap matrix: recomputing it in bwd would cost another
    # full (N, K, J) HBM write+read, which profiled as the dominant cost.
    return out, (input, grid, weight)


def _sample_flat_bwd(dims, padding_mode, compute_dtype, res, g):
    input, grid, weight = res
    n, c, _ = input.shape
    d, h, w = dims
    x = _unnormalize(grid[..., 0], w)
    y = _unnormalize(grid[..., 1], h)
    z = _unnormalize(grid[..., 2], d)
    wx = _axis_factor(x, w, padding_mode, compute_dtype)
    wy = _axis_factor(y, h, padding_mode, compute_dtype)
    wz = _axis_factor(z, d, padding_mode, compute_dtype)
    dwx = _axis_factor_grad(x, w, padding_mode, compute_dtype)
    dwy = _axis_factor_grad(y, h, padding_mode, compute_dtype)
    dwz = _axis_factor_grad(z, d, padding_mode, compute_dtype)

    g = g.astype(compute_dtype)
    vol = input.astype(compute_dtype)

    # d/dvol: transpose-sample the cotangent through the saved taps (MXU).
    d_vol = jnp.einsum("nkj,nck->ncj", weight, g,
                       preferred_element_type=jnp.float32)

    # d/dweight collapses channels in ONE forward-sized matmul; the per-axis
    # coordinate cotangents then factor through the separable structure as
    # cheap batched contractions (d/dweight is contracted per axis against
    # the two kept factors and dotted with the derivative factor) — no
    # further (N, K, J) expansions.
    d_m = jnp.einsum("nck,ncj->nkj", g, vol,
                     preferred_element_type=jnp.float32)
    d_m = d_m.reshape(n, -1, d, h, w).astype(compute_dtype)

    mz = jnp.einsum("nkzyx,nkz->nkyx", d_m, wz,
                    preferred_element_type=jnp.float32).astype(compute_dtype)
    dx = jnp.einsum("nkyx,nky,nkx->nk", mz, wy, dwx,
                    preferred_element_type=jnp.float32)
    dy = jnp.einsum("nkyx,nky,nkx->nk", mz, dwy, wx,
                    preferred_element_type=jnp.float32)
    myx = jnp.einsum("nkzyx,nky,nkx->nkz", d_m, wy, wx,
                     preferred_element_type=jnp.float32).astype(compute_dtype)
    dz = jnp.einsum("nkz,nkz->nk", myx, dwz,
                    preferred_element_type=jnp.float32)

    d_grid = jnp.stack((dx * (w / 2.0), dy * (h / 2.0), dz * (d / 2.0)),
                       axis=-1).astype(jnp.float32)
    return d_vol.astype(jnp.float32), d_grid


_sample_flat.defvjp(_sample_flat_fwd, _sample_flat_bwd)


def grid_sample_3d_matmul(input, grid, padding_mode: str = "zeros",
                          compute_dtype=None):
    """Drop-in for ``grid_sample_3d(mode='bilinear')`` on small volumes.

    input: (N, C, D, H, W); grid: (N, Do, Ho, Wo, 3) with (x, y, z).
    """
    if compute_dtype is None:
        compute_dtype = get_compute_dtype()
    n, c, d, h, w = input.shape
    out_spatial = grid.shape[1:4]
    g = grid.reshape(n, -1, 3).astype(jnp.float32)
    flat = input.reshape(n, c, -1).astype(jnp.float32)
    out = _sample_flat(flat, g, (d, h, w), padding_mode, compute_dtype)
    return out.reshape(n, c, *out_spatial).astype(jnp.float32)
