"""Layout-policy equivalence: decoder internals channels-last vs torch.

The channels-last activation layout (latentfusion_tpu/layout.py) is a pure
performance transform — parameters stay torch-layout and module boundaries
stay NC*. These tests pin exact functional equivalence (up to conv
reduction-order noise) between the two layouts for every branch the
Photographer can take, including gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentfusion_tpu import layout
from latentfusion_tpu.modules import unet
from latentfusion_tpu.ops.gather_matmul import grid_sample_3d_matmul

from test_recon import make_cameras, tiny_photographer, tiny_sculptor


@pytest.fixture
def restore_layout():
    yield
    layout.set_decode_layout("auto")


def _decode_both_layouts(ph, params, z, cam, mode="channels_last", **kw):
    layout.set_decode_layout("torch")
    out_t = ph.apply(params, z, cam, **kw)
    layout.set_decode_layout(mode)
    out_c = ph.apply(params, z, cam, **kw)
    return out_t, out_c


def _assert_close(a, b, atol=5e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol,
                               rtol=1e-4)


MODES = ("channels_last", "hybrid")


class TestPhotographerLayouts:
    @pytest.mark.parametrize("mode", MODES)
    def test_plain_decode(self, rng, restore_layout, mode):
        ph = tiny_photographer()
        z = jnp.asarray(rng.randn(3, 4, 8, 8, 8).astype(np.float32))
        cam = make_cameras(3, key=jax.random.PRNGKey(0))
        params = ph.init(jax.random.PRNGKey(1), z, cam)
        (y_t, lat_t, _), (y_c, lat_c, _) = _decode_both_layouts(
            ph, params, z, cam, mode=mode, return_latent=True)
        assert y_t.shape == y_c.shape
        _assert_close(y_t, y_c)
        _assert_close(lat_t, lat_c)

    @pytest.mark.parametrize("mode", MODES)
    def test_occlusion_object_blocks_sum(self, rng, restore_layout, mode):
        ph = tiny_photographer(
            object_config=(4, 4), projection_type="sum",
            occlusion_config=((5, "D", 8), (8, "U", 5)))
        z = jnp.asarray(rng.randn(2, 4, 8, 8, 8).astype(np.float32))
        cam = make_cameras(2, key=jax.random.PRNGKey(2))
        params = ph.init(jax.random.PRNGKey(1), z, cam)
        (y_t, _, zd_t), (y_c, _, zd_c) = _decode_both_layouts(
            ph, params, z, cam, mode=mode)
        assert zd_t.shape == zd_c.shape == (2, 1, 8, 8)
        _assert_close(y_t, y_c)
        _assert_close(zd_t, zd_c)

    @pytest.mark.parametrize("mode", MODES)
    def test_gradients_match(self, rng, restore_layout, mode):
        """Backward equivalence — the layout exists for the bwd hot path."""
        ph = tiny_photographer()
        z = jnp.asarray(rng.randn(2, 4, 8, 8, 8).astype(np.float32))
        cam = make_cameras(2, key=jax.random.PRNGKey(0))
        params = ph.init(jax.random.PRNGKey(1), z, cam)

        def loss(z_in, lq):
            c = cam.replace(log_quaternion=lq)
            y, _, _ = ph.apply(params, z_in, c)
            return (y ** 2).sum()

        grad_fn = jax.grad(loss, argnums=(0, 1))
        layout.set_decode_layout("torch")
        gz_t, gq_t = grad_fn(z, cam.log_quaternion)
        layout.set_decode_layout(mode)
        gz_c, gq_c = grad_fn(z, cam.log_quaternion)
        _assert_close(gz_t, gz_c, atol=2e-4)
        _assert_close(gq_t, gq_c, atol=2e-4)


class TestSculptorLayouts:
    @pytest.mark.parametrize("mode", MODES)
    def test_encode_matches(self, rng, restore_layout, mode):
        sc = tiny_sculptor()
        x = jnp.asarray(rng.randn(4, 4, 16, 16).astype(np.float32))
        cam = make_cameras(4, key=jax.random.PRNGKey(2))
        params = sc.init(jax.random.PRNGKey(1), x, cam)
        layout.set_decode_layout("torch")
        z0, cm0, om0 = sc.apply(params, x, cam)
        layout.set_decode_layout(mode)
        z1, cm1, om1 = sc.apply(params, x, cam)
        _assert_close(z0, z1)
        for a, b in zip(cm0 + om0, cm1 + om1):
            _assert_close(a, b)


class TestPrimitivesChannelsLast:
    def test_matmul_sampler_channels_last(self, rng):
        vol = jnp.asarray(rng.randn(2, 3, 5, 5, 5).astype(np.float32))
        grid = jnp.asarray(
            (rng.rand(2, 4, 4, 4, 3) * 2 - 1).astype(np.float32))
        ref = grid_sample_3d_matmul(vol, grid, padding_mode="border")
        out = grid_sample_3d_matmul(
            vol.transpose(0, 2, 3, 4, 1), grid, padding_mode="border",
            channels_last=True)
        _assert_close(ref, out.transpose(0, 4, 1, 2, 3), atol=1e-5)

    def test_taps_backend_matches_matmul(self, rng):
        """Channels-last 8-corner tap gather == one-hot matmul sampler
        (values AND d/dgrid; border padding)."""
        from latentfusion_tpu.ops.gather_matmul import grid_sample_3d_taps

        vol = jnp.asarray(rng.randn(2, 3, 6, 6, 6).astype(np.float32))
        grid = jnp.asarray(
            (rng.rand(2, 4, 4, 4, 3) * 2.4 - 1.2).astype(np.float32))
        ref = grid_sample_3d_matmul(vol, grid, padding_mode="border",
                                    compute_dtype=jnp.float32)
        vol_cl = vol.transpose(0, 2, 3, 4, 1)
        out = grid_sample_3d_taps(vol_cl, grid)
        _assert_close(ref, out.transpose(0, 4, 1, 2, 3), atol=1e-5)

        g1 = jax.grad(lambda g: (grid_sample_3d_matmul(
            vol, g, padding_mode="border",
            compute_dtype=jnp.float32) ** 2).sum())(grid)
        g2 = jax.grad(lambda g: (grid_sample_3d_taps(
            vol_cl, g) ** 2).sum())(grid)
        _assert_close(g1, g2, atol=1e-4)

    def test_unet3d_channels_last(self, rng, restore_layout):
        """U-Net skip concats under the channels-last policy."""
        net = unet.UNet3d(5, 2, ((4, "D", 8, "D", 8), (8, "U", 8, "U", 4)))
        x = jnp.asarray(rng.randn(2, 5, 8, 8, 8).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)
        ref = net.apply(params, x)
        with layout.activations_channels_last():
            out = net.apply(params, layout.to_channels_last(x))
        _assert_close(ref, layout.from_channels_last(out), atol=5e-5)
