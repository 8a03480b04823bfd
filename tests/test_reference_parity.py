"""Cross-framework equivalence: run the ACTUAL reference PyTorch code
(/root/reference/latentfusion, imported via tests/reference_shim.py) and this
repo's JAX port on identical inputs/weights and assert agreement.

This is the strongest parity evidence available in this environment (the
released checkpoints aren't present): a transposed UNet skip, a wrong
equalized-LR scale, a drifted Camera.zoom box, or a half-z convention error in
the volume transforms fails here even though every per-op unit test passes.

Covered (VERDICT.md round-1 item #2):
- Camera.zoom / uncrop                (reference: geometry.py:261-354)
- CameraToObjectTransform / ObjectToCameraTransform (geometry.py:614-690)
- Sculptor.encode (+GRUFuser)         (reference: models.py:226-258)
- Photographer.decode                 (reference: models.py:486-505)
- default_pose_loss                   (reference: estimation.py:70-118)
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import reference_shim  # noqa: E402

torch = pytest.importorskip("torch")
ref = reference_shim.import_reference()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from latentfusion_tpu import three  # noqa: E402
from latentfusion_tpu.camera import Camera  # noqa: E402
from latentfusion_tpu import transforms  # noqa: E402
from latentfusion_tpu.recon import checkpoint as ckpt  # noqa: E402
from latentfusion_tpu.recon import fusion as jfusion  # noqa: E402
from latentfusion_tpu.recon import models as jmodels  # noqa: E402

from latentfusion.modules import geometry as tgeom  # noqa: E402
from latentfusion.recon import models as tmodels  # noqa: E402
from latentfusion.recon import fusion as tfusion  # noqa: E402


WIDTH, HEIGHT = 160, 120


def _random_pose(rng, n):
    """Random rotations + translations in front of the camera."""
    q = rng.randn(n, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t = np.stack([rng.uniform(-0.1, 0.1, n), rng.uniform(-0.1, 0.1, n),
                  rng.uniform(1.2, 1.8, n)], axis=1).astype(np.float32)
    return q, t


def _camera_pair(rng, n, z_span=0.5):
    """Identical reference-torch and jax cameras."""
    f = 140.0
    intrinsic = np.tile(np.array(
        [[f, 0.0, WIDTH / 2], [0.0, f, HEIGHT / 2], [0.0, 0.0, 1.0]],
        dtype=np.float32)[None], (n, 1, 1))
    q, t = _random_pose(rng, n)
    ext = np.asarray(
        three.to_extrinsic_matrix(jnp.asarray(t), jnp.asarray(q)))
    tcam = tgeom.Camera(torch.from_numpy(intrinsic), torch.from_numpy(ext),
                        z_span=z_span, width=WIDTH, height=HEIGHT)
    jcam = Camera(intrinsic, ext, z_span=z_span, width=WIDTH, height=HEIGHT)
    np.testing.assert_allclose(np.asarray(jcam.log_quaternion),
                               tcam.log_quaternion.numpy(), atol=1e-5)
    return tcam, jcam


class TestCameraParity:
    def test_extrinsic_and_coords(self):
        rng = np.random.RandomState(0)
        tcam, jcam = _camera_pair(rng, 3)
        np.testing.assert_allclose(np.asarray(jcam.extrinsic),
                                   tcam.extrinsic.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jcam.obj_to_image),
                                   tcam.obj_to_image.numpy(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(jcam.position),
                                   tcam.position.numpy(), atol=1e-5)
        xj, yj, zj = jcam.camera_coords(8)
        with torch.no_grad():
            xt, yt, zt = tcam.camera_coords(8)
        np.testing.assert_allclose(np.asarray(xj), xt.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(yj), yt.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(zj), zt.numpy(), atol=1e-5)

    def test_zoom(self):
        rng = np.random.RandomState(1)
        tcam, jcam = _camera_pair(rng, 2)
        image = rng.randn(2, 3, HEIGHT, WIDTH).astype(np.float32)

        with torch.no_grad():
            t_img, t_zoomed = tcam.zoom(torch.from_numpy(image),
                                        target_size=32, target_dist=1.5)
        j_img, j_zoomed = jcam.zoom(jnp.asarray(image), 32, 1.5)

        np.testing.assert_allclose(np.asarray(j_zoomed.viewport),
                                   t_zoomed.viewport.numpy(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(),
                                   atol=1e-4)

    def test_uncrop(self):
        rng = np.random.RandomState(2)
        tcam, jcam = _camera_pair(rng, 2)
        t_zoomed = tcam.zoom(None, target_size=32, target_dist=1.5)
        j_zoomed = jcam.zoom(None, 32, 1.5)
        crop = rng.randn(2, 1, 32, 32).astype(np.float32)

        for mode in ("nearest", "bilinear"):
            with torch.no_grad():
                t_full, _ = t_zoomed.uncrop(torch.from_numpy(crop),
                                            scale_mode=mode)
            j_full, _ = j_zoomed.uncrop(jnp.asarray(crop), scale_mode=mode)
            if mode == "nearest":
                # Nearest at exact pixel-boundary ties may round differently;
                # require >99.5% exact agreement.
                agree = np.mean(
                    np.isclose(np.asarray(j_full), t_full.numpy(), atol=1e-5))
                assert agree > 0.995, f"nearest uncrop agreement {agree}"
            else:
                np.testing.assert_allclose(np.asarray(j_full),
                                           t_full.numpy(), atol=1e-4)


class TestVolumeTransformParity:
    def test_camera_to_object(self):
        rng = np.random.RandomState(3)
        tcam, jcam = _camera_pair(rng, 2)
        t_zoomed = tcam.zoom(None, target_size=32, target_dist=1.5)
        j_zoomed = jcam.zoom(None, 32, 1.5)
        vol = rng.randn(2, 4, 8, 8, 8).astype(np.float32)

        tblock = tgeom.CameraToObjectTransform(cube_size=1.0)
        with torch.no_grad():
            t_out = tblock(torch.from_numpy(vol), t_zoomed)
        j_out = transforms.camera_to_object(jnp.asarray(vol), j_zoomed, 1.0)
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   atol=2e-4)

    def test_object_to_camera(self):
        rng = np.random.RandomState(4)
        tcam, jcam = _camera_pair(rng, 2)
        t_zoomed = tcam.zoom(None, target_size=32, target_dist=1.5)
        j_zoomed = jcam.zoom(None, 32, 1.5)
        vol = rng.randn(2, 4, 8, 8, 8).astype(np.float32)

        tblock = tgeom.ObjectToCameraTransform(cube_size=1.0)
        with torch.no_grad():
            t_out = tblock(torch.from_numpy(vol), t_zoomed)
        j_out = transforms.object_to_camera(jnp.asarray(vol), j_zoomed, 1.0)
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   atol=2e-4)


def _tiny_ref_sculptor():
    return tmodels.Sculptor(
        in_size=16,
        image_config=[[4, "D", 8], [8]],
        camera_config=[4, 4],
        object_config=[4, 4],
        projection_type="factor",
        cube_size=1.0).eval()


def _tiny_ref_photographer():
    # object_config must be non-empty: the reference's object_out_size
    # property calls object_config.count('U') unconditionally when
    # projection_type='factor' (models.py:319,336).
    return tmodels.Photographer(
        in_size=8,
        image_config=[[4, "D", 8], [8, "U", 8, "U", 4]],
        camera_config=[4, 4],
        object_config=[4, 4],
        projection_type="factor",
        predict_depth=True, predict_mask=True,
        cube_size=1.0).eval()


def _tiny_jax_photographer():
    return jmodels.Photographer(
        in_size=8,
        image_config=((4, "D", 8), (8, "U", 8, "U", 4)),
        camera_config=(4, 4),
        object_config=(4, 4),
        projection_type="factor",
        predict_depth=True, predict_mask=True,
        cube_size=1.0)


class TestModelParity:
    def test_sculptor_encode(self):
        """Full encode (UNet2d + factor projection + camera blocks + volume
        transform + object blocks + GRU fuser) with the reference's weights
        converted into the flax modules."""
        from latentfusion_tpu import zoo

        rng = np.random.RandomState(5)
        torch.manual_seed(5)
        t_sculptor = _tiny_ref_sculptor()
        t_fuser = tfusion.GRUFuser(in_channels=4, cube_size=1.0).eval()
        j_sculptor = zoo.tiny_sculptor()
        j_fuser = jfusion.GRUFuser(in_channels=4, cube_size=1.0)

        j_sc_params = ckpt.convert_torch_state_dict(t_sculptor.state_dict())
        j_fu_params = ckpt.convert_torch_state_dict(t_fuser.state_dict())

        B, V = 2, 3
        color = rng.randn(B, V, 3, 16, 16).astype(np.float32)
        mask = (rng.rand(B, V, 1, 16, 16) > 0.3).astype(np.float32)
        tcam, jcam = _camera_pair(rng, B * V)
        t_zoomed = tcam.zoom(None, target_size=16, target_dist=1.5)
        j_zoomed = jcam.zoom(None, 16, 1.5)

        with torch.no_grad():
            t_z, _ = t_sculptor.encode(t_fuser, t_zoomed,
                                       torch.from_numpy(color),
                                       mask=torch.from_numpy(mask))
        j_z, _ = jmodels.encode(j_sculptor, j_sc_params, j_fuser, j_fu_params,
                                j_zoomed, jnp.asarray(color),
                                mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(j_z), t_z.numpy(),
                                   atol=5e-4, rtol=1e-3)

    def test_photographer_decode(self):
        from latentfusion_tpu import zoo

        rng = np.random.RandomState(6)
        torch.manual_seed(6)
        t_photographer = _tiny_ref_photographer()
        j_photographer = _tiny_jax_photographer()
        j_params = ckpt.convert_torch_state_dict(t_photographer.state_dict())

        B, n_hyp = 1, 4
        z_obj = rng.randn(B, 1, 4, 8, 8, 8).astype(np.float32)
        tcam, jcam = _camera_pair(rng, n_hyp)
        t_zoomed = tcam.zoom(None, target_size=16, target_dist=1.5)
        j_zoomed = jcam.zoom(None, 16, 1.5)

        with torch.no_grad():
            t_y, _, _ = t_photographer.decode(torch.from_numpy(z_obj),
                                              t_zoomed)
        j_y, _, _ = jmodels.decode(j_photographer, j_params,
                                   jnp.asarray(z_obj), j_zoomed)
        for k in ("depth", "mask", "mask_logits"):
            np.testing.assert_allclose(
                np.asarray(j_y[k]), t_y[k].numpy(), atol=5e-4, rtol=1e-3,
                err_msg=f"decode output {k!r} diverges from reference")


class TestPoseLossParity:
    def test_default_pose_loss(self):
        from latentfusion.observation import Observation as TorchObservation
        from latentfusion.pose import estimation as testimation

        from latentfusion_tpu.observation import Observation as JaxObservation
        from latentfusion_tpu.pose import estimation as jestimation

        rng = np.random.RandomState(7)
        # Full-frame target observation (batch 1).
        t_target_cam, j_target_cam = _camera_pair(rng, 1)
        color = rng.rand(1, 3, HEIGHT, WIDTH).astype(np.float32)
        mask = np.zeros((1, 1, HEIGHT, WIDTH), np.float32)
        mask[:, :, 30:90, 50:120] = 1.0
        depth = (mask * rng.uniform(1.2, 1.6)).astype(np.float32)
        # A few invalid-depth pixels inside the mask.
        depth[:, :, 40:45, 60:70] = 0.0

        t_target = TorchObservation(torch.from_numpy(color),
                                    torch.from_numpy(depth),
                                    torch.from_numpy(mask), t_target_cam)
        j_target = JaxObservation(jnp.asarray(color), jnp.asarray(depth),
                                  jnp.asarray(mask), j_target_cam)

        # Hypothesis predictions in the 32^2 zoomed frame.
        n_hyp = 3
        t_pred_cam, j_pred_cam = _camera_pair(rng, n_hyp)
        t_pred_zoom = t_pred_cam.zoom(None, target_size=32, target_dist=1.5)
        j_pred_zoom = j_pred_cam.zoom(None, 32, 1.5)
        pred_depth = rng.uniform(1.0, 1.8, (n_hyp, 1, 32, 32)).astype(
            np.float32)
        pred_mask_logits = rng.randn(n_hyp, 1, 32, 32).astype(np.float32) * 3

        with torch.no_grad():
            t_losses = testimation.default_pose_loss(
                t_target, torch.from_numpy(pred_depth),
                torch.from_numpy(pred_mask_logits), t_pred_zoom)
        j_losses = jestimation.default_pose_loss(
            j_target, jnp.asarray(pred_depth), jnp.asarray(pred_mask_logits),
            j_pred_zoom)

        assert set(j_losses) == set(t_losses)
        for k in t_losses:
            np.testing.assert_allclose(
                np.asarray(j_losses[k]), t_losses[k].numpy(),
                atol=2e-3, rtol=2e-3,
                err_msg=f"pose loss {k!r} diverges from reference")


class TestDiscriminatorParity:
    def test_multiscale_discriminator(self):
        """PatchGAN stack incl. minibatch-stddev concat, InstanceNorm, and
        the 3-scale pyramid, with converted reference weights."""
        from latentfusion import pggan as tpggan

        from latentfusion_tpu.pggan import MultiScaleDiscriminator

        rng = np.random.RandomState(11)
        torch.manual_seed(11)
        t_d = tpggan.MultiScaleDiscriminator(
            in_channels=2, block_config=[8, 16, 16]).eval()
        j_d = MultiScaleDiscriminator(in_channels=2,
                                      block_config=(8, 16, 16))
        j_params = ckpt.convert_torch_state_dict(t_d.state_dict())

        x = rng.randn(4, 2, 64, 64).astype(np.float32)
        mask = (rng.rand(4, 1, 64, 64) > 0.3).astype(np.float32)
        with torch.no_grad():
            t_out = t_d(torch.from_numpy(x), torch.from_numpy(mask))
        j_out = j_d.apply(j_params, jnp.asarray(x), jnp.asarray(mask))
        assert len(j_out) == len(t_out) == 3
        for scale, (a, b) in enumerate(zip(j_out, t_out)):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy(), atol=2e-3, rtol=1e-3,
                err_msg=f"discriminator scale {scale} diverges")


class TestLossParity:
    def test_hard_pixel_loss(self):
        from latentfusion import losses as tlosses

        from latentfusion_tpu import losses as jlosses

        rng = np.random.RandomState(12)
        x = rng.randn(2, 3, 16, 16).astype(np.float32)
        y = rng.randn(2, 3, 16, 16).astype(np.float32)
        for reduction in ("mean", "sum"):
            t_loss = tlosses.HardPixelLoss(torch.nn.L1Loss, k=40,
                                           reduction=reduction)
            with torch.no_grad():
                t_val = t_loss(torch.from_numpy(x), torch.from_numpy(y))
            j_val = jlosses.hard_pixel_loss(jlosses.l1_loss, jnp.asarray(x),
                                            jnp.asarray(y), k=40,
                                            reduction=reduction)
            np.testing.assert_allclose(float(j_val), float(t_val), rtol=1e-5,
                                       err_msg=f"reduction={reduction}")

    def test_beta_prior_and_lsgan(self):
        from latentfusion import losses as tlosses

        from latentfusion_tpu import losses as jlosses

        rng = np.random.RandomState(13)
        m = rng.rand(2, 1, 8, 8).astype(np.float32)
        with torch.no_grad():
            t_beta = tlosses.beta_prior_loss(torch.from_numpy(m), 0.01, 0.01)
        j_beta = jlosses.beta_prior_loss(jnp.asarray(m), 0.01, 0.01)
        np.testing.assert_allclose(float(j_beta), float(t_beta), rtol=1e-4)

        d = rng.randn(2, 1, 6, 6).astype(np.float32)
        with torch.no_grad():
            t_ls = tlosses.lsgan_loss(torch.from_numpy(d), 1)
        j_ls = jlosses.lsgan_loss(jnp.asarray(d), 1)
        np.testing.assert_allclose(float(j_ls), float(t_ls), rtol=1e-5)


class TestIbrParity:
    def test_reproject_views(self):
        from latentfusion import ibr as tibr

        from latentfusion_tpu import ibr as jibr

        rng = np.random.RandomState(14)
        t_cin, j_cin = _camera_pair(rng, 2)
        t_cout, j_cout = _camera_pair(rng, 3)

        image_in = rng.rand(2, 3, 24, 32).astype(np.float32)
        depth_in = rng.uniform(1.2, 1.8, (2, 1, 24, 32)).astype(np.float32)
        depth_out = rng.uniform(1.2, 1.8, (3, 1, 24, 32)).astype(np.float32)

        with torch.no_grad():
            t_img, t_dep = tibr.reproject_views(
                torch.from_numpy(image_in), torch.from_numpy(depth_in),
                torch.from_numpy(depth_out), t_cin, t_cout)
        j_img, j_dep = jibr.reproject_views(
            jnp.asarray(image_in), jnp.asarray(depth_in),
            jnp.asarray(depth_out), j_cin, j_cout)
        np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(j_dep), t_dep.numpy(),
                                   atol=2e-4)


class TestExportedCheckpointLoadsInReference:
    def test_reference_load_models_runs_our_checkpoint(self):
        """INVERSE interop: a checkpoint exported by this framework (the
        reference .pth schema via export_torch_state_dict) loads through the
        reference's own load_models and reproduces our outputs — proving
        natively-trained models can be consumed by the original framework."""
        from latentfusion_tpu import zoo
        from latentfusion_tpu.recon import fusion as jfusion2

        rng = np.random.RandomState(21)
        j_sculptor = zoo.tiny_sculptor()
        j_fuser = jfusion2.GRUFuser(in_channels=4, cube_size=1.0)
        j_photographer = _tiny_jax_photographer()
        params = zoo.init_recon_params(jax.random.PRNGKey(21), j_sculptor,
                                       j_fuser, j_photographer,
                                       batch=1, views=2)
        # tiny_photographer in the zoo has object_config=None; rebuild
        # params for the object_config=(4,4) variant used here.
        B = 1
        cam0 = zoo.canonical_camera(B, 16)
        z0 = jnp.zeros((B, 4, 8, 8, 8))
        params["photographer"] = j_photographer.init(jax.random.PRNGKey(22),
                                                     z0, cam0)

        def to_sd(tree):
            return {k: torch.from_numpy(np.asarray(v).copy()) for k, v in
                    ckpt.export_torch_state_dict(tree).items()}

        checkpoint = {
            "name": "roundtrip", "epoch": 0,
            "args": {"camera_dist": 1.5, "no_discriminator": True},
            "modules": {
                "sculptor": {"args": j_sculptor.checkpoint_args(),
                             "state_dict": to_sd(params["sculptor"])},
                "photographer": {
                    "args": j_photographer.checkpoint_args(),
                    "state_dict": to_sd(params["photographer"])},
                "fuser": {"type": "GRUFuser",
                          "args": {"in_channels": 4, "cube_size": 1.0},
                          "state_dict": to_sd(params["fuser"])},
            },
        }

        t_sculptor, t_fuser, t_photographer, t_disc = tmodels.load_models(
            checkpoint)
        assert t_disc is None
        t_sculptor = t_sculptor.eval()
        t_fuser = t_fuser.eval()
        t_photographer = t_photographer.eval()

        # Encode parity on shared inputs.
        B, V = 1, 2
        color = rng.randn(B, V, 3, 16, 16).astype(np.float32)
        mask = (rng.rand(B, V, 1, 16, 16) > 0.3).astype(np.float32)
        tcam, jcam = _camera_pair(rng, B * V)
        t_zoom = tcam.zoom(None, target_size=16, target_dist=1.5)
        j_zoom = jcam.zoom(None, 16, 1.5)
        with torch.no_grad():
            t_z, _ = t_sculptor.encode(t_fuser, t_zoom,
                                       torch.from_numpy(color),
                                       mask=torch.from_numpy(mask))
        j_z, _ = jmodels.encode(j_sculptor, params["sculptor"], j_fuser,
                                params["fuser"], j_zoom, jnp.asarray(color),
                                mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(j_z), t_z.numpy(),
                                   atol=5e-4, rtol=1e-3)

        # Decode parity through the loaded photographer.
        z_obj = rng.randn(1, 1, 4, 8, 8, 8).astype(np.float32)
        tc2, jc2 = _camera_pair(rng, 3)
        t_zoom2 = tc2.zoom(None, target_size=16, target_dist=1.5)
        j_zoom2 = jc2.zoom(None, 16, 1.5)
        with torch.no_grad():
            t_y, _, _ = t_photographer.decode(torch.from_numpy(z_obj),
                                              t_zoom2)
        j_y, _, _ = jmodels.decode(j_photographer, params["photographer"],
                                   jnp.asarray(z_obj), j_zoom2)
        for k in ("depth", "mask"):
            np.testing.assert_allclose(np.asarray(j_y[k]), t_y[k].numpy(),
                                       atol=5e-4, rtol=1e-3)


class TestProcessBatchParity:
    def test_process_batch_deterministic(self):
        """The training-batch preprocessing (view folding, canonical zoom,
        depth-window normalization, GT masking) matches the reference with
        random_orientation disabled."""
        from latentfusion.recon import utils as tutils

        from latentfusion_tpu.recon import utils as jutils

        rng = np.random.RandomState(31)
        B, V, h, w = 2, 3, 48, 64
        f = 60.0
        intrinsic = np.tile(np.array(
            [[f, 0, w / 2, 0], [0, f, h / 2, 0], [0, 0, 1, 0]],
            np.float32)[None, None], (B, V, 1, 1))
        q, t = _random_pose(rng, B * V)
        ext = np.asarray(three.to_extrinsic_matrix(
            jnp.asarray(t), jnp.asarray(q))).reshape(B, V, 4, 4)

        def group():
            return {
                "render": rng.rand(B, V, 3, h, w).astype(np.float32),
                "mask": (rng.rand(B, V, h, w) > 0.4).astype(np.float32),
                "depth": rng.uniform(1.2, 1.8, (B, V, h, w)).astype(
                    np.float32),
                "extrinsic": ext.copy(), "intrinsic": intrinsic.copy(),
            }

        batch = {"in": group(), "out_gt": group()}
        t_batch = {k: {kk: torch.from_numpy(vv.copy())
                       for kk, vv in v.items()} for k, v in batch.items()}

        with torch.no_grad():
            t_out = tutils.process_batch(t_batch, cube_size=1.0,
                                         camera_dist=1.5, input_size=32,
                                         device="cpu",
                                         random_orientation=False)
        j_out = jutils.process_batch(batch, cube_size=1.0, camera_dist=1.5,
                                     input_size=32, random_orientation=False)

        for grp in ("in", "out_gt"):
            for field, tol in (("image", 2e-3), ("mask", 0.0),
                               ("depth", 2e-3)):
                a = np.asarray(j_out[grp][field])
                b = t_out[grp][field].numpy()
                if field == "mask":
                    agree = (a == b).mean()
                    assert agree > 0.995, (grp, field, agree)
                else:
                    # Tiny fraction of pixels may straddle a bilinear tap
                    # boundary after fp differences in the zoom box.
                    close = np.isclose(a, b, atol=tol).mean()
                    assert close > 0.99, (grp, field, close)
            np.testing.assert_allclose(
                np.asarray(j_out[grp]["camera"].viewport),
                t_out[grp]["camera"].viewport.numpy(), atol=1e-3)


class TestOcclusionDecodeParity:
    def test_photographer_with_occlusion_module(self):
        """The occlusion UNet3d branch (depth softmax + feature gating,
        reference models.py:378-395, 427-433) matches with converted
        weights."""
        rng = np.random.RandomState(32)
        torch.manual_seed(32)
        t_ph = tmodels.Photographer(
            in_size=8,
            image_config=[[4, "D", 8], [8, "U", 8, "U", 4]],
            camera_config=[4, 4],
            object_config=[4, 4],
            occlusion_config=[[4, "D", 8], [8, "U", 4]],
            projection_type="sum",
            predict_depth=True, predict_mask=True,
            cube_size=1.0).eval()
        j_ph = jmodels.Photographer(
            in_size=8,
            image_config=((4, "D", 8), (8, "U", 8, "U", 4)),
            camera_config=(4, 4),
            object_config=(4, 4),
            occlusion_config=((4, "D", 8), (8, "U", 4)),
            projection_type="sum",
            predict_depth=True, predict_mask=True,
            cube_size=1.0)
        j_params = ckpt.convert_torch_state_dict(t_ph.state_dict())

        z_obj = rng.randn(1, 1, 4, 8, 8, 8).astype(np.float32)
        tcam, jcam = _camera_pair(rng, 2)
        t_zoom = tcam.zoom(None, target_size=16, target_dist=1.5)
        j_zoom = jcam.zoom(None, 16, 1.5)
        with torch.no_grad():
            t_y, _, t_zd = t_ph.decode(torch.from_numpy(z_obj), t_zoom)
        j_y, _, j_zd = jmodels.decode(j_ph, j_params, jnp.asarray(z_obj),
                                      j_zoom)
        for k in ("depth", "mask"):
            np.testing.assert_allclose(np.asarray(j_y[k]), t_y[k].numpy(),
                                       atol=5e-4, rtol=1e-3,
                                       err_msg=f"occlusion decode {k}")
        np.testing.assert_allclose(np.asarray(j_zd), t_zd.numpy(),
                                   atol=5e-4, rtol=1e-3,
                                   err_msg="occlusion z_depth")


class TestBlendFuserParity:
    def test_blend_fuser(self):
        """Blend-weight UNet3d + camera->object transform + view softmax
        with converted weights (reference fusion.py:95-149)."""
        rng = np.random.RandomState(41)
        torch.manual_seed(41)
        cfg = [[5, "D", 8], [8, "U", 4]]
        t_f = tfusion.BlendFuser(block_config=cfg, in_channels=4,
                                 cube_size=1.0).eval()

        from latentfusion_tpu.recon.fusion import BlendFuser

        j_f = BlendFuser(block_config=((5, "D", 8), (8, "U", 4)),
                         in_channels=4, cube_size=1.0)
        j_params = ckpt.convert_torch_state_dict(t_f.state_dict())

        B, V = 1, 3
        z_obj = rng.randn(B, V, 4, 8, 8, 8).astype(np.float32)
        z_cam = rng.randn(B, V, 4, 8, 8, 8).astype(np.float32)
        tcam, jcam = _camera_pair(rng, B * V)
        t_zoom = tcam.zoom(None, target_size=16, target_dist=1.5)
        j_zoom = jcam.zoom(None, 16, 1.5)

        with torch.no_grad():
            t_out, t_extra = t_f(torch.from_numpy(z_obj), [
                torch.from_numpy(z_cam)], [], t_zoom)
        j_out, j_extra = j_f.apply(j_params, jnp.asarray(z_obj),
                                   [jnp.asarray(z_cam)], [], j_zoom)
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(j_extra["blend_weights"]),
                                   t_extra["blend_weights"].numpy(),
                                   atol=5e-4, rtol=1e-3)


class TestObservationParity:
    def _obs_pair(self, rng):
        from latentfusion.observation import Observation as TorchObservation

        from latentfusion_tpu.observation import Observation as JaxObservation

        t_cam, j_cam = _camera_pair(rng, 2)
        color = rng.rand(2, 3, HEIGHT, WIDTH).astype(np.float32)
        mask = np.zeros((2, 1, HEIGHT, WIDTH), np.float32)
        mask[:, :, 30:90, 50:120] = 1.0
        depth = (mask * rng.uniform(1.3, 1.6)).astype(np.float32)
        t_obs = TorchObservation(torch.from_numpy(color.copy()),
                                 torch.from_numpy(depth.copy()),
                                 torch.from_numpy(mask.copy()), t_cam)
        j_obs = JaxObservation(jnp.asarray(color), jnp.asarray(depth),
                               jnp.asarray(mask), j_cam)
        return t_obs, j_obs

    def test_zoom_prepare_normalize_pipeline(self):
        """The full inference preprocessing (zoom -> prepare -> normalize),
        exactly what preprocess_observation runs (reference
        inference.py:63-71 over observation.py:225-282)."""
        rng = np.random.RandomState(42)
        t_obs, j_obs = self._obs_pair(rng)

        with torch.no_grad():
            t_p = t_obs.zoom(1.5, 32).prepare().normalize()
        j_p = j_obs.zoom(1.5, 32).prepare().normalize()

        for field in ("color", "depth", "mask"):
            a = np.asarray(getattr(j_p, field))
            b = getattr(t_p, field).numpy()
            close = np.isclose(a, b, atol=2e-3).mean()
            assert close > 0.99, (field, close)
        np.testing.assert_allclose(np.asarray(j_p.camera.viewport),
                                   t_p.camera.viewport.numpy(), atol=1e-3)
        assert j_p.meta["is_zoomed"] and j_p.meta["is_normalized"]


class TestRenderIbrParity:
    @pytest.mark.parametrize("weight_type",
                             ["cam_dist", "cam_angle", "cam_hybrid", "depth"])
    def test_render_ibr_all_weight_types(self, weight_type):
        from latentfusion import ibr as tibr

        from latentfusion_tpu import ibr as jibr

        rng = np.random.RandomState(51)
        B, Vi, Vo, h, w = 1, 3, 2, 24, 32
        t_cin, j_cin = _camera_pair(rng, B * Vi)
        t_cout, j_cout = _camera_pair(rng, B * Vo)
        image_in = rng.rand(B, Vi, 3, h, w).astype(np.float32)
        d_in = rng.uniform(1.2, 1.8, (B, Vi, 1, h, w)).astype(np.float32)
        d_out = rng.uniform(1.2, 1.8, (B, Vo, 1, h, w)).astype(np.float32)

        with torch.no_grad():
            t_ibr, t_reproj = tibr.render_ibr(
                t_cin, t_cout, torch.from_numpy(image_in),
                torch.from_numpy(d_in), torch.from_numpy(d_out),
                weight_type=weight_type)
        j_ibr, j_reproj = jibr.render_ibr(
            j_cin, j_cout, jnp.asarray(image_in), jnp.asarray(d_in),
            jnp.asarray(d_out), weight_type=weight_type)
        np.testing.assert_allclose(np.asarray(j_reproj), t_reproj.numpy(),
                                   atol=5e-4,
                                   err_msg=f"reproj ({weight_type})")
        np.testing.assert_allclose(np.asarray(j_ibr), t_ibr.numpy(),
                                   atol=5e-4, rtol=1e-3,
                                   err_msg=f"ibr blend ({weight_type})")


@pytest.mark.slow
class TestFlagshipScaleParity:
    """Cross-framework parity at the REAL flagship channel configuration
    (VERDICT r2 missing #4): the tiny-config tests cannot exercise
    size-dependent wiring — skip widening at depth, the 6-down image
    encoder, 256-channel camera blocks, factor projections at C*D=2048+
    (reference: models.py:84-505, tools/train/train.sh). Runs at 128^2
    input (identical wiring to 256^2, half the spatial cost)."""

    IN_SIZE = 128

    def _flagship_pair(self):
        from latentfusion_tpu import zoo

        torch.manual_seed(77)
        t_sculptor = tmodels.Sculptor(
            in_size=self.IN_SIZE,
            image_config=[list(zoo.SCULPTOR_IMAGE_CONFIG[0]),
                          list(zoo.SCULPTOR_IMAGE_CONFIG[1])],
            camera_config=list(zoo.SCULPTOR_CAMERA_CONFIG),
            object_config=list(zoo.SCULPTOR_OBJECT_CONFIG),
            projection_type="factor",
            cube_size=1.0, scale_mode="nearest").eval()
        t_fuser = tfusion.GRUFuser(in_channels=256, cube_size=1.0).eval()
        t_photographer = tmodels.Photographer(
            in_size=self.IN_SIZE // 16,
            image_config=[list(zoo.PHOTOGRAPHER_IMAGE_CONFIG[0]),
                          list(zoo.PHOTOGRAPHER_IMAGE_CONFIG[1])],
            camera_config=list(zoo.PHOTOGRAPHER_CAMERA_CONFIG),
            object_config=[256, 256],
            projection_type="factor",
            predict_color=False, predict_depth=True, predict_mask=True,
            cube_size=1.0, scale_mode="nearest").eval()

        j_sculptor = zoo.flagship_sculptor(self.IN_SIZE)
        j_fuser = zoo.flagship_fuser()
        # The reference requires non-empty object_config under factor
        # projection (models.py:319,336); mirror it on the jax side.
        j_photographer = jmodels.Photographer(
            in_size=self.IN_SIZE // 16,
            image_config=zoo.PHOTOGRAPHER_IMAGE_CONFIG,
            camera_config=zoo.PHOTOGRAPHER_CAMERA_CONFIG,
            object_config=(256, 256),
            projection_type="factor",
            predict_color=False, predict_depth=True, predict_mask=True,
            cube_size=1.0, scale_mode="nearest")
        return (t_sculptor, t_fuser, t_photographer,
                j_sculptor, j_fuser, j_photographer)

    def test_flagship_encode_decode(self):
        rng = np.random.RandomState(78)
        (t_sculptor, t_fuser, t_photographer,
         j_sculptor, j_fuser, j_photographer) = self._flagship_pair()

        j_sc = ckpt.convert_torch_state_dict(t_sculptor.state_dict())
        j_fu = ckpt.convert_torch_state_dict(t_fuser.state_dict())
        j_ph = ckpt.convert_torch_state_dict(t_photographer.state_dict())

        B, V = 1, 2
        s = self.IN_SIZE
        color = rng.rand(B, V, 3, s, s).astype(np.float32)
        mask = np.zeros((B, V, 1, s, s), np.float32)
        mask[..., 30:100, 40:110] = 1.0
        tcam, jcam = _camera_pair(rng, B * V)
        t_zoomed = tcam.zoom(None, target_size=s, target_dist=1.5)
        j_zoomed = jcam.zoom(None, s, 1.5)

        with torch.no_grad():
            t_z, _ = t_sculptor.encode(t_fuser, t_zoomed,
                                       torch.from_numpy(color),
                                       mask=torch.from_numpy(mask))
        j_z, _ = jmodels.encode(j_sculptor, j_sc, j_fuser, j_fu,
                                j_zoomed, jnp.asarray(color),
                                mask=jnp.asarray(mask))
        assert j_z.shape == tuple(t_z.shape) == (1, 1, 256, 8, 8, 8)
        np.testing.assert_allclose(np.asarray(j_z), t_z.numpy(),
                                   atol=5e-4, rtol=1e-3,
                                   err_msg="flagship encode diverged")

        # Decode the SAME latent through both flagship decoders.
        n_hyp = 2
        t_dcam, j_dcam = _camera_pair(rng, n_hyp)
        t_dzoom = t_dcam.zoom(None, target_size=s, target_dist=1.5)
        j_dzoom = j_dcam.zoom(None, s, 1.5)
        with torch.no_grad():
            t_y, _, _ = t_photographer.decode(t_z, t_dzoom)
        j_y, _, _ = jmodels.decode(j_photographer, j_ph, j_z, j_dzoom)
        for k in ("depth", "mask", "mask_logits"):
            a = np.asarray(j_y[k])
            b = t_y[k].numpy()
            assert a.shape == b.shape
            np.testing.assert_allclose(
                a, b, atol=1e-3, rtol=1e-3,
                err_msg=f"flagship decode output {k!r} diverged")


class TestLearnedIbrBlendParity:
    """The one IBR surface the r2 suite skipped (VERDICT r2 missing #5):
    blend_logits / warp_blend_logits and the full render_ibr path with a
    converted UNet2d generator (reference: ibr.py:225-249,
    inference.py:151-192)."""

    def test_blend_functions(self):
        from latentfusion import ibr as tibr

        from latentfusion_tpu import ibr as jibr

        rng = np.random.RandomState(60)
        B, V, h, w = 2, 3, 16, 20
        reproj = rng.rand(B, V, 3, h, w).astype(np.float32)
        blend = rng.randn(B, V, h, w).astype(np.float32)

        t_img, t_w = tibr.blend_logits(torch.from_numpy(blend),
                                       torch.from_numpy(reproj))
        j_img, j_w = jibr.blend_logits(jnp.asarray(blend),
                                       jnp.asarray(reproj))
        np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(j_w), t_w.numpy(), atol=1e-6)

        logits = rng.randn(B, 3 * V, h, w).astype(np.float32)
        with torch.no_grad():
            t_img, t_w, t_dx, t_dy = tibr.warp_blend_logits(
                torch.from_numpy(logits), torch.from_numpy(reproj),
                flow_size=5)
        j_img, j_w, j_dx, j_dy = jibr.warp_blend_logits(
            jnp.asarray(logits), jnp.asarray(reproj), flow_size=5)
        np.testing.assert_allclose(np.asarray(j_dx), t_dx.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(j_dy), t_dy.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(),
                                   atol=5e-4,
                                   err_msg="warp-blend color diverged")

    def test_render_ibr_with_converted_generator(self):
        """Full learned-IBR render through both frameworks' models."""
        from latentfusion.recon.inference import (
            LatentFusionModel as TorchLatentFusionModel)
        from latentfusion.modules.unet import UNet2d as TorchUNet2d
        from latentfusion.observation import Observation as TorchObservation
        from latentfusion.recon import fusion as tfusion_mod

        from latentfusion_tpu.modules.unet import UNet2d
        from latentfusion_tpu.observation import Observation as JaxObservation
        from latentfusion_tpu.recon.inference import LatentFusionModel
        from latentfusion_tpu import zoo

        rng = np.random.RandomState(61)
        torch.manual_seed(61)
        V = 3
        # Generator input: predicted out-depth (1) + per-view color(3) +
        # depth(1) + cam-sim(1) channels; output: 3V warp-blend logits
        # (reference: inference.py:164-186, train_ibr.py:161-174).
        gen_in, gen_out = 1 + 5 * V, 3 * V
        t_gen = TorchUNet2d(gen_in, gen_out,
                            [[8, "D", 8], [8, "U", 8]]).eval()
        t_sculptor = _tiny_ref_sculptor()
        t_fuser = tfusion_mod.GRUFuser(in_channels=4, cube_size=1.0).eval()
        t_photographer = _tiny_ref_photographer()
        t_model = TorchLatentFusionModel(t_sculptor, t_fuser, t_photographer,
                                         camera_dist=1.5, device="cpu")
        t_model.generator = t_gen

        j_model = LatentFusionModel(
            sculptor=zoo.tiny_sculptor(), sculptor_params={},
            fuser=zoo.tiny_fuser(), fuser_params={},
            photographer=_tiny_jax_photographer(),
            photographer_params=ckpt.convert_torch_state_dict(
                t_photographer.state_dict()),
            generator=UNet2d(gen_in, gen_out, ((8, "D", 8), (8, "U", 8))),
            generator_params=ckpt.convert_torch_state_dict(
                t_gen.state_dict()),
            camera_dist=1.5)
        j_model.input_size = 16

        z_obj = rng.randn(1, 1, 4, 8, 8, 8).astype(np.float32)
        t_cin, j_cin = _camera_pair(rng, V)
        t_cout, j_cout = _camera_pair(rng, 2)
        t_zin = t_cin.zoom(None, target_size=16, target_dist=1.5)
        j_zin = j_cin.zoom(None, 16, 1.5)
        t_zout = t_cout.zoom(None, target_size=16, target_dist=1.5)
        j_zout = j_cout.zoom(None, 16, 1.5)

        color = rng.rand(V, 3, 16, 16).astype(np.float32)
        mask = (rng.rand(V, 1, 16, 16) > 0.3).astype(np.float32)
        depth = (mask * 1.4).astype(np.float32)
        meta = dict(is_zoomed=True, is_prepared=True, is_normalized=True)
        t_obs = TorchObservation(torch.from_numpy(color.copy()),
                                 torch.from_numpy(depth.copy()),
                                 torch.from_numpy(mask.copy()), t_zin, **meta)
        j_obs = JaxObservation(jnp.asarray(color), jnp.asarray(depth),
                               jnp.asarray(mask), j_zin, **meta)

        with torch.no_grad():
            t_y, _ = t_model.render_ibr(torch.from_numpy(z_obj), t_obs,
                                        t_zout)
        j_y, _ = j_model.render_ibr(jnp.asarray(z_obj), j_obs, j_zout)

        for k in ("color", "depth", "mask"):
            a = np.asarray(j_y[k])
            b = t_y[k].numpy()
            assert a.shape == b.shape, (k, a.shape, b.shape)
            close = np.isclose(a, b, atol=2e-3).mean()
            assert close > 0.99, (k, close)


class TestInitializationParity:
    def test_estimate_initial_pose(self):
        """Translation-only init from eroded-mask depth median vs the
        reference's skimage-erosion version on shared masks (VERDICT r2
        item #7; reference: initialization.py:35-96)."""
        from latentfusion.pose import initialization as tinit

        from latentfusion_tpu.pose import initialization as jinit

        rng = np.random.RandomState(62)
        B = 2
        depth = np.zeros((B, 1, HEIGHT, WIDTH), np.float32)
        mask = np.zeros((B, 1, HEIGHT, WIDTH), np.float32)
        mask[:, :, 30:90, 50:120] = 1.0
        # Smooth depth ramp inside the mask + a few outlier speckles.
        yy = np.linspace(1.3, 1.5, 60, dtype=np.float32)[None, :, None]
        depth[:, :, 30:90, 50:120] = yy
        depth[:, :, 35:37, 55:57] = 9.0  # outliers the MAD filter rejects
        intrinsic = np.tile(np.array(
            [[140.0, 0, WIDTH / 2], [0, 140.0, HEIGHT / 2], [0, 0, 1.0]],
            np.float32)[None], (B, 1, 1))

        t_cam = tinit.estimate_initial_pose(
            torch.from_numpy(depth), torch.from_numpy(mask),
            torch.from_numpy(intrinsic), WIDTH, HEIGHT)
        j_cam = jinit.estimate_initial_pose(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(intrinsic),
            WIDTH, HEIGHT)

        np.testing.assert_allclose(np.asarray(j_cam.translation),
                                   t_cam.translation.numpy(), atol=5e-3,
                                   err_msg="initial translation diverged")
        np.testing.assert_allclose(np.asarray(j_cam.extrinsic),
                                   t_cam.extrinsic.numpy(), atol=5e-3)
