"""Pallas TPU kernel: blockwise trilinear volume sampling.

For small latent volumes (<= 17^3) the one-hot matmul in
``ops/gather_matmul.py`` is ideal; for larger volumes its dense (K, J) tap
matrix no longer fits. This kernel tiles that computation: per (batch,
K-block, J-block) grid step it rebuilds the (BK, BJ) slice of the tap matrix
in VMEM from broadcasted iota + the per-sample corner coordinates, and
accumulates ``out += vol_block @ W_block^T`` on the MXU. The tap matrix never
touches HBM.

Forward semantics match ``grid_sample_3d(mode='bilinear')``; the backward
pass reuses the gather implementation's VJP via ``jax.custom_vjp``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_sample import _unnormalize, grid_sample_3d


def _kernel(coords_ref, vol_ref, out_ref, *, dhw, block_j):
    """coords_ref: (1, 8, BK) rows = (x, y, z, pad...); vol_ref: (1, C, BJ);
    out_ref: (1, C, BK)."""
    d, h, w = dhw
    j_step = pl.program_id(2)
    j0 = j_step * block_j

    x = coords_ref[0, 0, :]
    y = coords_ref[0, 1, :]
    z = coords_ref[0, 2, :]

    bk = x.shape[0]
    j = j0 + jax.lax.broadcasted_iota(jnp.int32, (bk, block_j), 1)
    jz = j // (h * w)
    jy = (j // w) % h
    jx = j % w

    def axis_factor(coord, idx, size):
        i0 = jnp.floor(coord)
        w1 = coord - i0
        i0 = i0[:, None]
        w1 = w1[:, None]
        fidx = idx.astype(jnp.float32)
        return ((fidx == i0) * (1.0 - w1) + (fidx == i0 + 1.0) * w1)

    tap = (axis_factor(z, jz, d)
           * axis_factor(y, jy, h)
           * axis_factor(x, jx, w))  # (BK, BJ)

    partial = jax.lax.dot_general(
        vol_ref[0], tap,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (C, BK)

    @pl.when(j_step == 0)
    def _():
        out_ref[0] = partial

    @pl.when(j_step > 0)
    def _():
        out_ref[0] = out_ref[0] + partial


def _round_up(v, m):
    return (v + m - 1) // m * m


def _forward(input, grid, padding_mode, block_k=256, block_j=2048):
    n, c, d, h, w = input.shape
    out_spatial = grid.shape[1:4]
    k = grid[0, ..., 0].size

    g = grid.reshape(n, -1, 3).astype(jnp.float32)
    x = _unnormalize(g[..., 0], w)
    y = _unnormalize(g[..., 1], h)
    z = _unnormalize(g[..., 2], d)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, w - 1)
        y = jnp.clip(y, 0.0, h - 1)
        z = jnp.clip(z, 0.0, d - 1)

    kp = _round_up(k, block_k)
    j = d * h * w
    block_j = min(block_j, _round_up(j, 128))
    jp = _round_up(j, block_j)

    # (N, 8, Kp): coordinate rows padded out of range so padded samples
    # produce zero taps. 8 sublanes to satisfy the f32 tile constraint.
    coords = jnp.stack([x, y, z], axis=1)
    coords = jnp.pad(coords, ((0, 0), (0, 5), (0, kp - k)),
                     constant_values=-10.0)
    vol = jnp.pad(input.reshape(n, c, j).astype(jnp.float32),
                  ((0, 0), (0, 0), (0, jp - j)))

    out = pl.pallas_call(
        functools.partial(_kernel, dhw=(d, h, w), block_j=block_j),
        grid=(n, kp // block_k, jp // block_j),
        in_specs=[
            pl.BlockSpec((1, 8, block_k), lambda ni, ki, ji: (ni, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, block_j), lambda ni, ki, ji: (ni, 0, ji),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, block_k), lambda ni, ki, ji: (ni, 0, ki),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, kp), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(coords, vol)

    return out[:, :, :k].reshape(n, c, *out_spatial)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def grid_sample_3d_pallas(input, grid, padding_mode: str = "zeros"):
    """Trilinear 3D grid sample (Pallas TPU kernel; interpret mode off-TPU).

    input: (N, C, D, H, W); grid: (N, Do, Ho, Wo, 3) in [-1, 1].
    """
    return _forward(input, grid, padding_mode)


def _fwd(input, grid, padding_mode):
    return _forward(input, grid, padding_mode), (input, grid)


def _bwd(padding_mode, residuals, g):
    input, grid = residuals
    # Backward through the (equivalent) gather formulation.
    _, vjp = jax.vjp(
        lambda i, gr: grid_sample_3d(i, gr, mode="bilinear",
                                     padding_mode=padding_mode), input, grid)
    return vjp(g)


grid_sample_3d_pallas.defvjp(_fwd, _bwd)
