"""Fused Pallas sampler (VMEM-resident tap tiles) vs the one-hot matmul
backend — values and both gradient paths, interpret mode on CPU (the same
kernels compile for TPU; ops/pallas_fused_sample.py docstring has the
performance rationale)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentfusion_tpu.ops.gather_matmul import grid_sample_3d_matmul
from latentfusion_tpu.ops.pallas_fused_sample import (fused_qualifies,
                                                      grid_sample_3d_fused)


def _shapes(rng, n=2, c=128, s=8, k=8):
    vol = jnp.asarray(rng.randn(n, c, s, s, s).astype(np.float32))
    grid = jnp.asarray(
        (rng.rand(n, k, k, k, 3) * 2.4 - 1.2).astype(np.float32))
    return vol, grid


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_matches_matmul(rng, padding_mode):
    vol, grid = _shapes(rng)
    ref = grid_sample_3d_matmul(vol, grid, padding_mode=padding_mode)
    out = grid_sample_3d_fused(vol, grid, padding_mode=padding_mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_channels_last_layout(rng):
    vol, grid = _shapes(rng)
    vol_cl = vol.transpose(0, 2, 3, 4, 1)
    ref = grid_sample_3d_matmul(vol_cl, grid, padding_mode="border",
                                channels_last=True)
    out = grid_sample_3d_fused(vol_cl, grid, padding_mode="border",
                               channels_last=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_gradients_match(rng, padding_mode):
    """Custom-VJP d/dgrid and d/dvol vs the matmul backend's autodiff."""
    vol, grid = _shapes(rng, n=1)

    def loss_m(v, g):
        return (grid_sample_3d_matmul(v, g, padding_mode=padding_mode)
                ** 2).sum()

    def loss_f(v, g):
        return (grid_sample_3d_fused(v, g, padding_mode=padding_mode)
                ** 2).sum()

    gv_m, gg_m = jax.grad(loss_m, argnums=(0, 1))(vol, grid)
    gv_f, gg_f = jax.grad(loss_f, argnums=(0, 1))(vol, grid)
    scale_v = np.abs(np.asarray(gv_m)).max() + 1e-9
    scale_g = np.abs(np.asarray(gg_m)).max() + 1e-9
    np.testing.assert_allclose(np.asarray(gv_f) / scale_v,
                               np.asarray(gv_m) / scale_v, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg_f) / scale_g,
                               np.asarray(gg_m) / scale_g, atol=1e-4)


def test_k_padding(rng):
    """K not a multiple of the tile size pads with zero-weight samples."""
    vol = jnp.asarray(rng.randn(1, 128, 8, 8, 8).astype(np.float32))
    grid = jnp.asarray((rng.rand(1, 5, 7, 9, 3) * 2 - 1).astype(np.float32))
    ref = grid_sample_3d_matmul(vol, grid, padding_mode="border")
    out = grid_sample_3d_fused(vol, grid, padding_mode="border")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_shared_volume_batch1(rng):
    """A (1, ...) volume with an N-hypothesis grid: the kernel serves every
    hypothesis from the single volume block (pose-estimation case — the
    latent is shared across hypotheses), and d/dvol sums over hypotheses."""
    vol = jnp.asarray(rng.randn(1, 128, 8, 8, 8).astype(np.float32))
    grid = jnp.asarray(
        (rng.rand(4, 8, 8, 8, 3) * 2.2 - 1.1).astype(np.float32))
    vol_b = jnp.broadcast_to(vol, (4, *vol.shape[1:]))

    out = grid_sample_3d_fused(vol, grid, padding_mode="border")
    ref = grid_sample_3d_matmul(vol_b, grid, padding_mode="border")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def loss_f(v, g):
        return (grid_sample_3d_fused(v, g, padding_mode="border") ** 2).sum()

    def loss_m(v, g):
        return (grid_sample_3d_matmul(
            jnp.broadcast_to(v, (4, *v.shape[1:])), g,
            padding_mode="border") ** 2).sum()

    gv_f, gg_f = jax.grad(loss_f, argnums=(0, 1))(vol, grid)
    gv_m, gg_m = jax.grad(loss_m, argnums=(0, 1))(vol, grid)
    assert gv_f.shape == vol.shape
    scale_v = np.abs(np.asarray(gv_m)).max() + 1e-9
    scale_g = np.abs(np.asarray(gg_m)).max() + 1e-9
    np.testing.assert_allclose(np.asarray(gv_f) / scale_v,
                               np.asarray(gv_m) / scale_v, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg_f) / scale_g,
                               np.asarray(gg_m) / scale_g, atol=1e-4)


def test_shared_volume_groups(rng):
    """NV=2 volumes serving N=4 hypotheses (multi-object estimate_batch:
    object-major contiguous hypothesis blocks): each object's volume block
    serves its own hypotheses, and d/dvol accumulates per object over its
    group — exercising the group>1 first-step reset in _kernel_bwd_vol."""
    vol = jnp.asarray(rng.randn(2, 128, 8, 8, 8).astype(np.float32))
    grid = jnp.asarray(
        (rng.rand(4, 8, 8, 8, 3) * 2.2 - 1.1).astype(np.float32))
    vol_b = jnp.repeat(vol, 2, axis=0)  # object-major: [v0, v0, v1, v1]

    out = grid_sample_3d_fused(vol, grid, padding_mode="border")
    ref = grid_sample_3d_matmul(vol_b, grid, padding_mode="border")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def loss_f(v, g):
        return (grid_sample_3d_fused(v, g, padding_mode="border") ** 2).sum()

    def loss_m(v, g):
        return (grid_sample_3d_matmul(
            jnp.repeat(v, 2, axis=0), g, padding_mode="border") ** 2).sum()

    gv_f, gg_f = jax.grad(loss_f, argnums=(0, 1))(vol, grid)
    gv_m, gg_m = jax.grad(loss_m, argnums=(0, 1))(vol, grid)
    assert gv_f.shape == vol.shape
    scale_v = np.abs(np.asarray(gv_m)).max() + 1e-9
    scale_g = np.abs(np.asarray(gg_m)).max() + 1e-9
    np.testing.assert_allclose(np.asarray(gv_f) / scale_v,
                               np.asarray(gv_m) / scale_v, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg_f) / scale_g,
                               np.asarray(gg_m) / scale_g, atol=1e-4)


def test_qualification_gate():
    assert fused_qualifies((16, 16, 16), 256, 4096)
    assert not fused_qualifies((16, 16, 16), 4, 4096)      # tiny channels
    assert not fused_qualifies((16, 16, 16), 192, 4096)    # lane-misaligned
    assert not fused_qualifies((16, 16, 16), 256, 64)      # tiny K
    assert not fused_qualifies((32, 32, 32), 256, 4096)    # volume too big


def test_record_flops_trace():
    """Trace-time analytic FLOPs: bench.py adds these back because XLA's
    cost_analysis reports 0 for Pallas custom calls."""
    from latentfusion_tpu.ops.pallas_fused_sample import record_flops

    vol = jnp.ones((1, 128, 8, 8, 8))
    grid = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 8, 3),
                              minval=-1.0, maxval=1.0)

    def f(g):
        return grid_sample_3d_fused(vol, g).sum()

    with record_flops() as tr:
        jax.jit(f).lower(grid).compile()
    assert [t for t, _ in tr] == ["fused_fwd"]
    # 2*n*kp*J*c dominates: n=2, kp=512 (K=8^3 is already a multiple of
    # the 256-sample tile), J=8^3=512, c=128; plus the in-kernel w_zy
    # build (two (BK, D|H) @ (D|H, DH) selection dots per tile).
    n, kp, j, c, d, h = 2, 512, 512, 128, 8, 8
    expect = (2 * n * kp * j * c + 2 * n * kp * 8 * c
              + 2 * n * kp * (d + h) * d * h
              + 8 * n * kp * (8 + 8 + 8))  # in-kernel factor build
    assert abs(tr[0][1] - expect) < 1e3

    with record_flops() as tr2:
        jax.jit(jax.grad(f)).lower(grid).compile()
    assert sorted(t for t, _ in tr2) == [
        "fused_bwd_grid", "fused_bwd_vol", "fused_fwd"]
    for _, fl in tr2:
        assert fl > 2 * n * kp * j * c * 0.9

    # Recorder state restores after the context (no leakage between runs).
    # NOTE: a fresh function object is required — JAX's trace cache skips
    # re-tracing an already-lowered (fn, args) pair, and the recorder only
    # sees actual traces (bench.py builds fresh probe closures per run).
    def f_fresh(g):
        return grid_sample_3d_fused(vol, g).sum() * 2.0

    with record_flops() as outer:
        with record_flops() as inner:
            jax.jit(f_fresh).lower(grid).compile()
        assert len(inner) == 1
        assert len(outer) == 0
