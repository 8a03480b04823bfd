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


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_pallas_vjp_matches_gather_autodiff(rng, padding_mode):
    """The tiled Pallas backward (both cotangents, random cotangent,
    out-of-range samples) agrees with autodiff through the gather sampler."""
    vol = jnp.asarray(rng.randn(2, 3, 8, 6, 10).astype(np.float32))
    grid = jnp.asarray(
        rng.uniform(-1.2, 1.2, (2, 4, 3, 5, 3)).astype(np.float32))

    f_pl = lambda v, g: grid_sample_3d_pallas(v, g, padding_mode)  # noqa: E731
    f_ga = lambda v, g: grid_sample_3d(v, g, padding_mode=padding_mode)  # noqa: E731

    out = f_pl(vol, grid)
    ct = jnp.asarray(rng.randn(*out.shape).astype(np.float32))
    d_vol_pl, d_grid_pl = jax.vjp(f_pl, vol, grid)[1](ct)
    d_vol_ga, d_grid_ga = jax.vjp(f_ga, vol, grid)[1](ct)
    np.testing.assert_allclose(np.asarray(d_vol_pl), np.asarray(d_vol_ga),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_grid_pl), np.asarray(d_grid_ga),
                               atol=2e-5)


def test_transforms_fused_backend(rng):
    """transforms dispatch with the fused backend matches the matmul
    backend end-to-end (object_to_camera at a qualifying flagship-family
    shape: 16^3 volume, 128 channels, 16^3 output grid), fwd and d/dgrid
    through the camera chain."""
    from latentfusion_tpu import transforms
    from latentfusion_tpu.testing import make_camera

    cam = make_camera(2, key=jax.random.PRNGKey(0))
    vol = jnp.asarray(rng.randn(1, 128, 16, 16, 16).astype(np.float32) * 0.1)

    def run():
        out = transforms.object_to_camera(vol, cam)
        g = jax.grad(lambda t: transforms.object_to_camera(
            vol, cam.replace(translation=t)).sum())(cam.translation)
        return out, g

    transforms.set_volume_sample_backend("fused")
    try:
        out_fu, g_fu = run()
    finally:
        transforms.set_volume_sample_backend("matmul")
    try:
        out_mm, g_mm = run()
    finally:
        transforms.set_volume_sample_backend("auto")
    np.testing.assert_allclose(np.asarray(out_fu), np.asarray(out_mm),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_fu), np.asarray(g_mm),
                               atol=2e-2, rtol=2e-2)


def test_transforms_pallas_backend(rng):
    """transforms dispatch with the pallas backend matches gather end-to-end
    (object_to_camera on an 18^3 volume, above MAX_MATMUL_VOXELS)."""
    from latentfusion_tpu import transforms
    from latentfusion_tpu.testing import make_camera

    cam = make_camera(2, key=jax.random.PRNGKey(0))
    vol = jnp.asarray(rng.randn(1, 2, 18, 18, 18).astype(np.float32))
    transforms.set_volume_sample_backend("pallas")
    try:
        out_pl = transforms.object_to_camera(vol, cam)
    finally:
        transforms.set_volume_sample_backend("gather")
    try:
        out_ga = transforms.object_to_camera(vol, cam)
    finally:
        transforms.set_volume_sample_backend("auto")
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ga),
                               atol=1e-4)
