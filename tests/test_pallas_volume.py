"""Pallas volume-sampling kernel vs the gather reference (interpret mode on
CPU; the same kernel compiles for TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentfusion_tpu.ops.grid_sample import grid_sample_3d
from latentfusion_tpu.ops.pallas_volume import grid_sample_3d_pallas


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_matches_gather(rng, padding_mode):
    vol = jnp.asarray(rng.randn(2, 4, 8, 8, 8).astype(np.float32))
    grid = jnp.asarray(rng.rand(2, 6, 6, 6, 3).astype(np.float32) * 2.4 - 1.2)
    ours = grid_sample_3d_pallas(vol, grid, padding_mode)
    ref = grid_sample_3d(vol, grid, mode="bilinear",
                         padding_mode=padding_mode)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


def test_large_volume_blocks(rng):
    """Volume bigger than one J block (exercises accumulation)."""
    vol = jnp.asarray(rng.randn(1, 2, 16, 16, 16).astype(np.float32))
    grid = jnp.asarray(rng.rand(1, 4, 4, 4, 3).astype(np.float32) * 2 - 1)
    ours = grid_sample_3d_pallas(vol, grid, "border")
    ref = grid_sample_3d(vol, grid, padding_mode="border")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


def test_gradients(rng):
    vol = jnp.asarray(rng.randn(1, 2, 8, 8, 8).astype(np.float32))
    grid = jnp.asarray(rng.rand(1, 3, 3, 3, 3).astype(np.float32) * 1.6 - 0.8)

    ga = jax.grad(lambda g: (grid_sample_3d_pallas(vol, g, "border") ** 2
                             ).sum())(grid)
    gb = jax.grad(lambda g: (grid_sample_3d(vol, g, padding_mode="border")
                             ** 2).sum())(grid)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-3)
