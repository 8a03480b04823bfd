"""Equivalence of the MXU separable resampler vs grid_sample (and hence
torch)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentfusion_tpu.ops import grid_sample_2d
from latentfusion_tpu.ops.affine_resample import (axis_weights,
                                                  bbox_source_coords,
                                                  separable_resample_2d)


def grid_from_src(src_y, src_x, h, w):
    """Build the equivalent grid_sample grid from per-axis source coords."""
    gx = (2 * src_x + 1) / w - 1
    gy = (2 * src_y + 1) / h - 1
    gx = jnp.broadcast_to(gx[:, None, :], (src_x.shape[0], src_y.shape[1],
                                           src_x.shape[1]))
    gy = jnp.broadcast_to(gy[:, :, None], gx.shape)
    return jnp.stack([gx, gy], axis=-1)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_matches_grid_sample(rng, mode, padding_mode):
    img = jnp.asarray(rng.randn(3, 2, 15, 17).astype(np.float32))
    # Coords intentionally spill out of range to exercise padding.
    src_y = jnp.asarray(rng.rand(3, 9).astype(np.float32) * 20 - 3)
    src_x = jnp.asarray(rng.rand(3, 11).astype(np.float32) * 24 - 4)
    ours = separable_resample_2d(img, src_y, src_x, mode, padding_mode)
    grid = grid_from_src(src_y, src_x, 15, 17)
    ref = grid_sample_2d(img, grid, mode=mode, padding_mode=padding_mode)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_bbox_coords_match_bbox_grid(rng):
    from latentfusion_tpu.camera import bboxes_to_grid

    boxes = jnp.asarray(
        np.array([[3.0, 4.0, 12.0, 11.0], [-2.0, 0.0, 20.0, 18.0]],
                 dtype=np.float32))
    img = jnp.asarray(rng.randn(2, 1, 16, 16).astype(np.float32))
    src_y, src_x = bbox_source_coords(boxes, 8)
    ours = separable_resample_2d(img, src_y, src_x, "bilinear", "zeros")
    grid = bboxes_to_grid(boxes, (16, 16), (8, 8))
    ref = grid_sample_2d(img, grid, mode="bilinear", padding_mode="zeros")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_gradients_flow_through_coords(rng):
    img = jnp.asarray(rng.randn(1, 1, 8, 8).astype(np.float32))

    def f(shift):
        src = jnp.arange(8.0)[None] + shift
        return (separable_resample_2d(img, src, src) ** 2).sum()

    g = jax.grad(f)(0.3)
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_axis_weights_rows_sum_to_one_inside(rng):
    src = jnp.asarray(rng.rand(1, 6).astype(np.float32) * 7)
    w = axis_weights(src, 8, "bilinear", "zeros")
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-6)
