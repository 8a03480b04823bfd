"""Tests for NN building blocks, incl. numerics parity of the equalized conv
against torch (the reference's conv semantics)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from latentfusion_tpu import modules
from latentfusion_tpu.modules import blocks as B


def test_equalized_conv2d_matches_torch(rng):
    x = rng.randn(2, 4, 9, 9).astype(np.float32)
    w = rng.randn(8, 4, 3, 3).astype(np.float32)
    b = rng.randn(8).astype(np.float32)

    conv = modules.EqualizedConv(4, 8, 3, ndim=2, padding=1)
    params = {"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))

    he = math.sqrt(2.0 / (4 * 9))
    theirs = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1)
    theirs = theirs * he + torch.from_numpy(b).view(1, -1, 1, 1)
    np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-5)


def test_equalized_conv3d_matches_torch(rng):
    x = rng.randn(1, 3, 6, 6, 6).astype(np.float32)
    w = rng.randn(5, 3, 3, 3, 3).astype(np.float32)
    b = rng.randn(5).astype(np.float32)

    conv = modules.EqualizedConv(3, 5, 3, ndim=3, padding=1)
    params = {"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))

    he = math.sqrt(2.0 / (3 * 27))
    theirs = F.conv3d(torch.from_numpy(x), torch.from_numpy(w), padding=1)
    theirs = theirs * he + torch.from_numpy(b).view(1, -1, 1, 1, 1)
    np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-5)


def test_equalized_linear_matches_torch(rng):
    x = rng.randn(3, 7).astype(np.float32)
    w = rng.randn(5, 7).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    lin = modules.EqualizedLinear(7, 5)
    params = {"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}
    ours = np.asarray(lin.apply(params, jnp.asarray(x)))
    he = math.sqrt(2.0 / 7)
    theirs = (torch.from_numpy(x) @ torch.from_numpy(w).t()) * he + torch.from_numpy(b)
    np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-5)


def test_pixel_norm_matches_torch(rng):
    x = rng.randn(2, 8, 4, 4).astype(np.float32)
    ours = np.asarray(modules.pixel_norm(jnp.asarray(x)))
    t = torch.from_numpy(x)
    theirs = (t / torch.sqrt(torch.mean(t ** 2, dim=1, keepdim=True) + 1e-8)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_lrelu_pixel_norm_matches_unfused(rng):
    """Fused lrelu+pixelnorm (residual-lean custom VJP) == AD of the
    composition, values and grads, in both layouts."""
    import jax
    from latentfusion_tpu import layout

    for axis, shape in [(-1, (2, 5, 7, 19)), (1, (2, 19, 5, 7))]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))

        def ref(x, axis=axis):
            with layout.activations_channels_last(axis == -1):
                return (modules.pixel_norm(
                    jax.nn.leaky_relu(x, 0.2)) * 1.7).sum()

        def fused(x, axis=axis):
            return (modules.lrelu_pixel_norm(x, 0.2, 1e-8, axis) * 1.7).sum()

        v1, g1 = jax.value_and_grad(ref)(x)
        v2, g2 = jax.value_and_grad(fused)(x)
        np.testing.assert_allclose(v1, v2, rtol=1e-6)
        np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)

        # the 'unfused' backend escape hatch routes back to the plain
        # composition (used for A/B; must agree too)
        modules.set_lrelu_pnorm_backend("unfused")
        try:
            v3, g3 = jax.value_and_grad(fused)(x)
        finally:
            modules.set_lrelu_pnorm_backend("xla")
        np.testing.assert_allclose(v1, v3, rtol=1e-6)
        np.testing.assert_allclose(g1, g3, rtol=1e-5, atol=1e-6)


def test_lrelu_pixel_norm_pallas_matches_jnp(rng):
    """One-pass Pallas kernel (interpret mode here) == the jnp custom VJP,
    values and grads, including a non-lane-multiple channel count."""
    import jax
    from latentfusion_tpu.ops.pallas_lrelu_pnorm import lrelu_pixel_norm_pallas

    for shape in [(4, 8, 8, 128), (2, 4, 4, 4, 196)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))

        def ref(x):
            return (modules._lrelu_pixel_norm_jnp(x, 0.2, 1e-8, -1) * 1.3).sum()

        def pallas(x):
            return (lrelu_pixel_norm_pallas(x, 0.2, 1e-8, True) * 1.3).sum()

        v1, g1 = jax.value_and_grad(ref)(x)
        v2, g2 = jax.value_and_grad(pallas)(x)
        np.testing.assert_allclose(v1, v2, rtol=1e-5)
        np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


class TestBlockDSL:
    def test_simple_config(self):
        defs = B.create_block_defs([64, "D", 128, "D", 256], ndim=2,
                                   scale_factor=0.5)
        assert len(defs) == 2
        assert defs[0]["in_channels"] == 64 and defs[0]["out_channels"] == 128
        # 'D' marker scales the *following* block.
        assert defs[0]["scale_factor"] == 0.5
        assert defs[1]["in_channels"] == 128 and defs[1]["scale_factor"] == 0.5

    def test_in_views_multiplier(self):
        defs = B.create_block_defs([16, 32], ndim=3, scale_factor=2.0, in_views=4)
        assert defs[0]["in_channels"] == 64

    def test_skip_connections_widen(self):
        defs = B.create_block_defs([32, 32, 32, 32], ndim=3, scale_factor=2.0,
                                   skip_connections=True, skip_connect_end=3)
        # First block: no skip; later blocks widened by block_in.
        assert defs[0]["in_channels"] == 32
        assert defs[1]["in_channels"] == 64
        assert defs[2]["in_channels"] == 64

    def test_trilinear_for_3d(self):
        defs = B.create_block_defs([8, "U", 8], ndim=3, scale_factor=2.0,
                                   scale_mode="bilinear")
        assert defs[0]["scale_mode"] == "trilinear"


class TestUNet:
    def test_unet2d_shapes_and_sizes(self, rng):
        config = ([8, "D", 16, "D", 16], [16, "U", 16, "U", 8])
        net = modules.UNet2d(in_channels=3, out_channels=[1, 1],
                             block_config=config)
        x = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert net.bottleneck_size(32) == 8
        assert net.output_size(32) == 32
        assert y.shape == (2, 2, 32, 32)

    def test_unet2d_intermediates(self, rng):
        config = ([8, "D", 16], [16, "U", 8])
        net = modules.UNet2d(in_channels=3, out_channels=None,
                             block_config=config)
        x = jnp.asarray(rng.randn(1, 3, 16, 16).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)
        y, mids = net.apply(params, x, return_intermediate=True)
        assert len(mids) == 1
        assert y.shape == (1, 8, 16, 16)

    def test_unet3d(self, rng):
        config = ([4, "D", 8], [8, "U", 4])
        net = modules.UNet3d(in_channels=2, out_channels=1, block_config=config)
        x = jnp.asarray(rng.randn(1, 2, 8, 8, 8).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == (1, 1, 8, 8, 8)

    def test_unet_z_inject(self, rng):
        config = ([4, "D", 8], [12, "U", 4])
        net = modules.UNet2d(in_channels=2, out_channels=1, block_config=config)
        x = jnp.asarray(rng.randn(1, 2, 8, 8).astype(np.float32))
        z = jnp.asarray(rng.randn(1, 4).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x, z_inject=z)
        y = net.apply(params, x, z_inject=z)
        assert y.shape == (1, 1, 8, 8)


def test_gru_cell(rng):
    cell = modules.ConvGRUCell(in_channels=4, hidden_channels=3)
    x = jnp.asarray(rng.randn(2, 4, 4, 4, 4).astype(np.float32))
    h = jnp.asarray(rng.randn(2, 3, 4, 4, 4).astype(np.float32))
    params = cell.init(jax.random.PRNGKey(0), x, h)
    h2 = cell.apply(params, x, h)
    assert h2.shape == h.shape
    # Param naming matches the converter's expectations.
    assert set(params["params"].keys()) == {"update_gate", "reset_gate", "out_gate"}


def test_lstm_cell(rng):
    cell = modules.ConvLSTMCell(in_channels=4, hidden_channels=3)
    x = jnp.asarray(rng.randn(1, 4, 4, 4, 4).astype(np.float32))
    h = jnp.asarray(rng.randn(1, 3, 4, 4, 4).astype(np.float32))
    c = jnp.zeros_like(h)
    params = cell.init(jax.random.PRNGKey(0), x, (h, c))
    h2, c2 = cell.apply(params, x, (h, c))
    assert h2.shape == h.shape and c2.shape == c.shape
