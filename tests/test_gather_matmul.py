"""Equivalence of the MXU one-hot matmul 3D sampler vs the gather sampler."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentfusion_tpu.ops.gather_matmul import grid_sample_3d_matmul
from latentfusion_tpu.ops.grid_sample import grid_sample_3d


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_matches_gather(rng, padding_mode):
    vol = jnp.asarray(rng.randn(2, 5, 6, 7, 8).astype(np.float32))
    grid = jnp.asarray(rng.rand(2, 4, 5, 6, 3).astype(np.float32) * 2.6 - 1.3)
    a = grid_sample_3d_matmul(vol, grid, padding_mode=padding_mode)
    b = grid_sample_3d(vol, grid, padding_mode=padding_mode)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gradients_match_gather(rng):
    vol = jnp.asarray(rng.randn(1, 2, 6, 6, 6).astype(np.float32))
    grid = jnp.asarray(rng.rand(1, 3, 3, 3, 3).astype(np.float32) * 1.6 - 0.8)

    ga = jax.grad(lambda g: (grid_sample_3d_matmul(vol, g,
                                                   padding_mode="border") ** 2
                             ).sum())(grid)
    gb = jax.grad(lambda g: (grid_sample_3d(vol, g,
                                            padding_mode="border") ** 2
                             ).sum())(grid)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-3)

    va = jax.grad(lambda v: (grid_sample_3d_matmul(v, grid) ** 2).sum())(vol)
    vb = jax.grad(lambda v: (grid_sample_3d(v, grid) ** 2).sum())(vol)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-4)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_custom_vjp_matches_gather_autodiff(rng, padding_mode):
    """The MXU custom VJP (both cotangents, non-cubic dims, random
    cotangent) agrees with autodiff through the gather sampler."""
    vol = jnp.asarray(rng.randn(2, 3, 6, 5, 4).astype(np.float32))
    grid = jnp.asarray(
        rng.uniform(-1.2, 1.2, (2, 4, 3, 5, 3)).astype(np.float32))

    f_mm = lambda v, g: grid_sample_3d_matmul(  # noqa: E731
        v, g, padding_mode=padding_mode, compute_dtype=jnp.float32)
    f_ga = lambda v, g: grid_sample_3d(v, g, padding_mode=padding_mode)  # noqa: E731

    out = f_mm(vol, grid)
    ct = jnp.asarray(rng.randn(*out.shape).astype(np.float32))
    d_vol_mm, d_grid_mm = jax.vjp(f_mm, vol, grid)[1](ct)
    d_vol_ga, d_grid_ga = jax.vjp(f_ga, vol, grid)[1](ct)
    np.testing.assert_allclose(np.asarray(d_vol_mm), np.asarray(d_vol_ga),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_grid_mm), np.asarray(d_grid_ga),
                               atol=2e-5)


def test_transforms_use_matmul_path(rng):
    """End-to-end: object_to_camera on a 16^3 volume matches the gather
    implementation."""
    from latentfusion_tpu import transforms
    from latentfusion_tpu.testing import make_camera

    cam = make_camera(2, key=jax.random.PRNGKey(0))
    vol = jnp.asarray(rng.randn(1, 4, 16, 16, 16).astype(np.float32))
    out = transforms.object_to_camera(vol, cam)
    # Force the gather path for comparison.
    from latentfusion_tpu.ops.grid_sample import grid_sample_3d as gs3

    size = 16
    x_cam, y_cam, z_cam = cam.camera_coords(size)
    cam_coords = jnp.stack((x_cam, y_cam, z_cam, jnp.ones_like(x_cam)),
                           axis=-1).reshape(cam.length, -1, 4)
    obj_coords = cam.cam_to_obj @ jnp.swapaxes(cam_coords, 2, 1)
    obj_coords = jnp.swapaxes(obj_coords[:, :3, :], 1, 2)
    grid = (obj_coords / 0.5).reshape(-1, size, size, size, 3)
    ref = gs3(jnp.broadcast_to(vol, (2, 4, 16, 16, 16)), grid,
              padding_mode="border")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
