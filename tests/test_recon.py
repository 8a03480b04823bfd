"""Tests for Sculptor/Photographer/fusers and checkpoint conversion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentfusion_tpu import three
from latentfusion_tpu.camera import Camera
from latentfusion_tpu.recon import checkpoint as ckpt
from latentfusion_tpu.recon import fusion, models
from latentfusion_tpu.three import quaternion as quat

IN_SIZE = 16


def tiny_sculptor(**kw):
    args = dict(
        in_size=IN_SIZE,
        image_config=((4, "D", 8), (8,)),
        camera_config=(4, 4),
        object_config=(4, 4),
        projection_type="factor",
        cube_size=1.0,
    )
    args.update(kw)
    return models.Sculptor(**args)


def tiny_photographer(**kw):
    args = dict(
        in_size=8,
        image_config=((4, "D", 8), (8, "U", 4)),
        camera_config=(4, 4),
        object_config=None,
        projection_type="factor",
        predict_depth=True,
        predict_mask=True,
        cube_size=1.0,
    )
    args.update(kw)
    return models.Photographer(**args)


def make_cameras(n, key=None, z=1.0):
    intrinsic = jnp.tile(
        jnp.array([[20.0, 0, 8.0], [0, 20.0, 8.0], [0, 0, 1.0]])[None], (n, 1, 1))
    quats = quat.identity(n) if key is None else quat.random(key, n)
    trans = jnp.tile(jnp.array([[0.0, 0.0, z]]), (n, 1))
    E = three.to_extrinsic_matrix(trans, quats)
    return Camera(intrinsic, E, z_span=0.5, width=IN_SIZE, height=IN_SIZE)


class TestSculptor:
    def test_forward_shapes(self, rng):
        sc = tiny_sculptor()
        assert sc.in_channels == 4  # color + mask
        assert sc.image_out_size == 8
        assert sc.out_size == 8
        x = jnp.asarray(rng.randn(2, 4, IN_SIZE, IN_SIZE).astype(np.float32))
        cam = make_cameras(2, key=jax.random.PRNGKey(0))
        params = sc.init(jax.random.PRNGKey(1), x, cam)
        z, z_cam_mid, z_obj_mid = sc.apply(params, x, cam)
        assert z.shape == (2, 4, 8, 8, 8)
        # config (4, 4) = one conv block each
        assert len(z_cam_mid) == 1 and len(z_obj_mid) == 1
        assert z_cam_mid[0].shape == (2, 4, 8, 8, 8)

    def test_param_naming(self, rng):
        sc = tiny_sculptor()
        x = jnp.asarray(rng.randn(1, 4, IN_SIZE, IN_SIZE).astype(np.float32))
        cam = make_cameras(1)
        params = sc.init(jax.random.PRNGKey(0), x, cam)
        p = params["params"]
        assert "image_encoder" in p
        assert "camera_blocks_0" in p
        assert "object_blocks_0" in p
        assert "output_block" in p
        assert "weight" in p["camera_blocks_0"]["conv1"]


class TestFusers:
    @pytest.mark.parametrize("pool", ["max", "abs_max", "mean", "median"])
    def test_pool_fuser(self, rng, pool):
        z = jnp.asarray(rng.randn(2, 3, 4, 5, 5, 5).astype(np.float32))
        fuser = fusion.PoolFuser(pool)
        out, _ = fuser.apply({}, z, [], [], None)
        assert out.shape == (2, 1, 4, 5, 5, 5)

    def test_concat_fuser(self, rng):
        z = jnp.asarray(rng.randn(2, 3, 4, 5, 5, 5).astype(np.float32))
        out, _ = fusion.ConcatFuser().apply({}, z, [], [], None)
        assert out.shape == (2, 1, 12, 5, 5, 5)

    def test_gru_fuser(self, rng):
        z = jnp.asarray(rng.randn(1, 3, 4, 6, 6, 6).astype(np.float32))
        fuser = fusion.GRUFuser(in_channels=4)
        params = fuser.init(jax.random.PRNGKey(0), z, [], [], None)
        out, _ = fuser.apply(params, z, [], [], None)
        assert out.shape == (1, 1, 4, 6, 6, 6)

    def test_lstm_fuser(self, rng):
        z = jnp.asarray(rng.randn(1, 3, 4, 6, 6, 6).astype(np.float32))
        fuser = fusion.LSTMFuser(in_channels=4)
        params = fuser.init(jax.random.PRNGKey(0), z, [], [], None)
        out, _ = fuser.apply(params, z, [], [], None)
        assert out.shape == (1, 1, 4, 6, 6, 6)

    def test_blend_fuser(self, rng):
        z = jnp.asarray(rng.randn(1, 2, 4, 8, 8, 8).astype(np.float32))
        z_cam = jnp.asarray(rng.randn(1, 2, 4, 8, 8, 8).astype(np.float32))
        cam = make_cameras(2, key=jax.random.PRNGKey(3))
        fuser = fusion.BlendFuser(block_config=((5, "D", 8), (8, "U", 5)),
                                  in_channels=4)
        params = fuser.init(jax.random.PRNGKey(0), z, [z_cam], [], cam)
        out, extra = fuser.apply(params, z, [z_cam], [], cam)
        assert out.shape == (1, 1, 4, 8, 8, 8)
        assert "blend_weights" in extra


class TestPhotographer:
    def test_decode_shapes(self, rng):
        ph = tiny_photographer()
        z_obj = jnp.asarray(rng.randn(1, 1, 4, 8, 8, 8).astype(np.float32))
        cam = make_cameras(3, key=jax.random.PRNGKey(0))
        params = ph.init(jax.random.PRNGKey(1),
                         jnp.squeeze(z_obj, 1).repeat(3, axis=0), cam)
        y, z_lat, _ = models.decode(ph, params, z_obj, cam, return_latent=True)
        assert y["depth"].shape == (1, 3, 1, 8, 8)
        assert y["mask"].shape == (1, 3, 1, 8, 8)
        assert y["mask_logits"].shape == (1, 3, 1, 8, 8)
        assert float(y["depth"].max()) <= 1.0 and float(y["depth"].min()) >= -1.0
        assert z_lat.shape[1] == 3

    def test_head_hoist_matches_post_upsample_heads(self, rng, monkeypatch):
        """The hoisted 1x1 output heads (run before the image decoder's
        trailing upsample) must match the reference order (heads after the
        upsample, models.py:398-409) — an exact linear commute, so only
        float reassociation tolerance is allowed."""
        from latentfusion_tpu.modules import unet as unet_mod

        ph = tiny_photographer()
        z = jnp.asarray(rng.randn(2, 4, 8, 8, 8).astype(np.float32))
        cam = make_cameras(2, key=jax.random.PRNGKey(5))
        params = ph.init(jax.random.PRNGKey(1), z, cam)
        # tiny_photographer's image up-config ends "U", 4 — the last block
        # carries the trailing upsample, so the hoist is active.
        y_hoist, _, _ = ph.apply(params, z, cam)
        # Disable the hoist (no trailing scale to defer) to restore the
        # reference's head-after-upsample order on the same params.
        monkeypatch.setattr(unet_mod.BaseUNet, "final_scale",
                            property(lambda self: None))
        y_ref, _, _ = ph.apply(params, z, cam)
        np.testing.assert_allclose(np.asarray(y_hoist), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_occlusion_module(self, rng):
        ph = tiny_photographer(
            object_config=(4, 4),
            occlusion_config=((5, "D", 8), (8, "U", 5)))
        z = jnp.asarray(rng.randn(2, 4, 8, 8, 8).astype(np.float32))
        cam = make_cameras(2, key=jax.random.PRNGKey(2))
        params = ph.init(jax.random.PRNGKey(1), z, cam)
        y, _, z_depth = ph.apply(params, z, cam)
        assert z_depth.shape == (2, 1, 8, 8)


class TestEndToEnd:
    def test_encode_fuse_decode(self, rng):
        key = jax.random.PRNGKey(0)
        sc = tiny_sculptor()
        fuser = fusion.GRUFuser(in_channels=4)
        ph = tiny_photographer()

        B, V = 1, 2
        color = jnp.asarray(rng.rand(B, V, 3, IN_SIZE, IN_SIZE).astype(np.float32))
        mask = jnp.asarray((rng.rand(B, V, 1, IN_SIZE, IN_SIZE) > 0.5).astype(np.float32))
        cam_in = make_cameras(B * V, key=key)

        x = jnp.zeros((B * V, 4, IN_SIZE, IN_SIZE))
        sc_params = sc.init(jax.random.PRNGKey(1), x, cam_in)
        zv = jnp.zeros((B, V, 4, 8, 8, 8))
        fu_params = fuser.init(jax.random.PRNGKey(2), zv, [], [], cam_in)

        z_obj, _ = models.encode(sc, sc_params, fuser, fu_params, cam_in,
                                 color, mask=mask)
        assert z_obj.shape == (B, 1, 4, 8, 8, 8)

        cam_out = make_cameras(4, key=jax.random.PRNGKey(3))
        ph_params = ph.init(jax.random.PRNGKey(4),
                            jnp.zeros((4, 4, 8, 8, 8)), cam_out)
        y, _, _ = models.decode(ph, ph_params, z_obj, cam_out)
        assert y["depth"].shape == (1, 4, 1, 8, 8)

    def test_autoencode(self, rng):
        key = jax.random.PRNGKey(0)
        sc = tiny_sculptor()
        fuser = fusion.PoolFuser("mean")
        ph = tiny_photographer()
        B = 2
        color = jnp.asarray(rng.rand(B, 1, 3, IN_SIZE, IN_SIZE).astype(np.float32))
        mask = jnp.ones((B, 1, 1, IN_SIZE, IN_SIZE))
        cam = make_cameras(B, key=key)
        sc_params = sc.init(jax.random.PRNGKey(1),
                            jnp.zeros((B, 4, IN_SIZE, IN_SIZE)), cam)
        ph_params = ph.init(jax.random.PRNGKey(2),
                            jnp.zeros((B, 4, 8, 8, 8)), cam)
        y, z_pix = models.autoencode(sc, sc_params, fuser, {}, ph, ph_params,
                                     cam, color, mask=mask)
        assert y["depth"].shape == (B, 1, 8, 8)
        assert z_pix.shape[0] == B


class TestCheckpointConversion:
    def test_state_dict_roundtrip(self, rng):
        sc = tiny_sculptor()
        x = jnp.zeros((1, 4, IN_SIZE, IN_SIZE))
        cam = make_cameras(1)
        params = sc.init(jax.random.PRNGKey(0), x, cam)
        sd = ckpt.export_torch_state_dict(params)
        # Torch-style keys present.
        assert any(k.endswith("conv1.module.weight") for k in sd)
        assert any(k.endswith("conv1.bias") for k in sd)
        back = ckpt.convert_torch_state_dict(sd)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = jax.tree_util.tree_leaves_with_path(back)
        assert len(flat_a) == len(flat_b)
        for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                      sorted(flat_b, key=lambda t: str(t[0]))):
            assert str(pa) == str(pb)
            np.testing.assert_allclose(np.asarray(va), np.asarray(vb))

    def test_convert_applies(self, rng):
        """Converted params must be directly usable by the module."""
        sc = tiny_sculptor()
        x = jnp.asarray(rng.randn(1, 4, IN_SIZE, IN_SIZE).astype(np.float32))
        cam = make_cameras(1)
        params = sc.init(jax.random.PRNGKey(0), x, cam)
        sd = ckpt.export_torch_state_dict(params)
        back = ckpt.convert_torch_state_dict(sd)
        a = sc.apply(params, x, cam)[0]
        b = sc.apply(back, x, cam)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_sculptor_from_checkpoint_dict(self, rng):
        sc = tiny_sculptor()
        x = jnp.zeros((1, 4, IN_SIZE, IN_SIZE))
        cam = make_cameras(1)
        params = sc.init(jax.random.PRNGKey(0), x, cam)
        torch_ckpt = {
            "args": {
                "in_size": IN_SIZE,
                "in_channels": 4,  # legacy extra key must be ignored
                "image_config": [[4, "D", 8], [8]],
                "camera_config": [4, 4],
                "object_config": [4, 4],
                "projection_type": "factor",
                "cube_size": 1.0,
            },
            "state_dict": ckpt.export_torch_state_dict(params),
        }
        sc2, params2 = ckpt.sculptor_from_checkpoint(torch_ckpt)
        out1 = sc.apply(params, x, cam)[0]
        out2 = sc2.apply(params2, x, cam)[0]
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_recurrent_fuser_scan_matches_unroll(rng):
    """nn.scan view fold (the default) is numerically identical to the
    reference-shaped unrolled chain (docs/ARCHITECTURE.md A/B)."""
    import jax
    import jax.numpy as jnp

    from latentfusion_tpu.recon import fusion
    from latentfusion_tpu.testing import make_camera

    key = jax.random.PRNGKey(0)
    z = jnp.asarray(rng.randn(1, 5, 8, 6, 6, 6).astype("float32"))
    cam = make_camera(5, key=key)

    for scan_cls, kwargs in ((fusion.GRUFuser, {}), (fusion.LSTMFuser, {})):
        scan_mod = scan_cls(in_channels=8, scan_views=True, **kwargs)
        unroll_mod = scan_cls(in_channels=8, scan_views=False, **kwargs)
        params = scan_mod.init(key, z, [], [], cam)
        a = scan_mod.apply(params, z, [], [], cam)[0]
        b = unroll_mod.apply(params, z, [], [], cam)[0]
        assert float(jnp.abs(a - b).max()) < 1e-5
