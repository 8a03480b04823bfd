"""Parity tests for resampling kernels vs torch (CPU) — the reference's
numerics source (F.grid_sample / F.interpolate)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from latentfusion_tpu import ops


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_2d_matches_torch(rng, mode, padding_mode):
    img = rng.randn(2, 3, 13, 17).astype(np.float32)
    # Include out-of-range coords to exercise padding.
    grid = (rng.rand(2, 9, 11, 2).astype(np.float32) * 2.8 - 1.4)
    ours = _np(ops.grid_sample_2d(jnp.asarray(img), jnp.asarray(grid),
                                  mode=mode, padding_mode=padding_mode))
    theirs = F.grid_sample(torch.from_numpy(img), torch.from_numpy(grid),
                           mode=mode, padding_mode=padding_mode,
                           align_corners=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_3d_matches_torch(rng, mode, padding_mode):
    vol = rng.randn(2, 4, 6, 7, 8).astype(np.float32)
    grid = (rng.rand(2, 5, 6, 7, 3).astype(np.float32) * 2.8 - 1.4)
    ours = _np(ops.grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid),
                                  mode=mode, padding_mode=padding_mode))
    theirs = F.grid_sample(torch.from_numpy(vol), torch.from_numpy(grid),
                           mode=mode, padding_mode=padding_mode,
                           align_corners=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_sample_3d_halfrange_z(rng):
    """The reference's CameraToObjectTransform produces z grid coords in
    [0, 1] (not [-1, 1]); make sure that regime matches too
    (reference: geometry.py:644-653)."""
    vol = rng.randn(1, 2, 8, 8, 8).astype(np.float32)
    grid = rng.rand(1, 4, 4, 4, 3).astype(np.float32)  # all in [0, 1]
    ours = _np(ops.grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid),
                                  padding_mode="border"))
    theirs = F.grid_sample(torch.from_numpy(vol), torch.from_numpy(grid),
                           padding_mode="border", align_corners=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_sample_2d_gradients(rng):
    """Gradients must flow through both image and grid (pose refinement
    differentiates through the warp)."""
    import jax

    img = jnp.asarray(rng.randn(1, 1, 8, 8).astype(np.float32))
    grid = jnp.asarray(rng.rand(1, 4, 4, 2).astype(np.float32) * 1.6 - 0.8)

    def loss_fn(g):
        return (ops.grid_sample_2d(img, g) ** 2).sum()

    g = jax.grad(loss_fn)(grid)
    assert np.isfinite(_np(g)).all()
    assert np.abs(_np(g)).max() > 0

    # Compare against torch autograd.
    timg = torch.from_numpy(np.asarray(img))
    tgrid = torch.from_numpy(np.asarray(grid)).requires_grad_(True)
    tout = (F.grid_sample(timg, tgrid, align_corners=False) ** 2).sum()
    tout.backward()
    np.testing.assert_allclose(_np(g), tgrid.grad.numpy(), atol=1e-4)


@pytest.mark.parametrize("scale", [2.0, 0.5])
@pytest.mark.parametrize("mode", ["nearest", "bilinear"])
def test_interpolate_2d_matches_torch(rng, scale, mode):
    x = rng.randn(2, 3, 12, 16).astype(np.float32)
    kwargs = {} if mode == "nearest" else {"align_corners": False}
    theirs = F.interpolate(torch.from_numpy(x), scale_factor=scale, mode=mode,
                           **kwargs).numpy()
    ours = _np(ops.interpolate(jnp.asarray(x), scale_factor=scale, mode=mode))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("scale", [2.0, 0.5])
@pytest.mark.parametrize("mode", ["nearest", "trilinear"])
def test_interpolate_3d_matches_torch(rng, scale, mode):
    x = rng.randn(2, 3, 8, 10, 12).astype(np.float32)
    kwargs = {} if mode == "nearest" else {"align_corners": False}
    theirs = F.interpolate(torch.from_numpy(x), scale_factor=scale, mode=mode,
                           **kwargs).numpy()
    ours = _np(ops.interpolate(jnp.asarray(x), scale_factor=scale, mode=mode))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_resize_nearest_to_size(rng):
    """F.interpolate(x, size) default mode — used by the occlusion module."""
    x = rng.randn(1, 2, 5, 6, 7).astype(np.float32)
    theirs = F.interpolate(torch.from_numpy(x), size=7).numpy()
    ours = _np(ops.resize_nearest(jnp.asarray(x), 7))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_interpolate_non_integer_scale(rng):
    x = rng.randn(1, 1, 10, 10).astype(np.float32)
    theirs = F.interpolate(torch.from_numpy(x), scale_factor=1.5,
                           mode="bilinear", align_corners=False).numpy()
    ours = _np(ops.interpolate(jnp.asarray(x), scale_factor=1.5, mode="bilinear"))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
