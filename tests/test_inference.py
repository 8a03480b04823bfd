"""LatentFusionModel API tests: torch-checkpoint round trip, observation
pipeline, render_full."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentfusion_tpu import zoo
from latentfusion_tpu.observation import Observation
from latentfusion_tpu.recon.inference import LatentFusionModel
from latentfusion_tpu.testing import make_camera


@pytest.fixture(scope="module")
def tiny_model():
    key = jax.random.PRNGKey(0)
    sculptor = zoo.tiny_sculptor()
    fuser = zoo.tiny_fuser()
    photographer = zoo.tiny_photographer()
    params = zoo.init_recon_params(key, sculptor, fuser, photographer,
                                   batch=1, views=2)
    return LatentFusionModel(
        sculptor, params["sculptor"], fuser, params["fuser"],
        photographer, params["photographer"], camera_dist=1.5)


def make_obs(n=2, key=None):
    cam = make_camera(n, z=1.5, f=64, width=64, height=48, key=key)
    color = jnp.ones((n, 3, 48, 64)) * 0.5
    depth = jnp.full((n, 1, 48, 64), 1.5)
    mask = jnp.zeros((n, 1, 48, 64)).at[:, :, 16:32, 24:40].set(1.0)
    return Observation(color, depth, mask, cam)


class TestObservation:
    def test_save_load_roundtrip(self, tmp_path):
        obs = make_obs(2, key=jax.random.PRNGKey(1))
        obs.save(tmp_path / "obs")
        loaded = Observation.load(tmp_path / "obs")
        assert len(loaded) == 2
        np.testing.assert_allclose(np.asarray(loaded.mask),
                                   np.asarray(obs.mask))
        np.testing.assert_allclose(np.asarray(loaded.depth),
                                   np.asarray(obs.depth), atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(loaded.camera.extrinsic),
            np.asarray(obs.camera.extrinsic), atol=1e-4)

    def test_load_frames_subset(self, tmp_path):
        obs = make_obs(3)
        obs.save(tmp_path / "obs")
        loaded = Observation.load(tmp_path / "obs", frames=[1, 2])
        assert len(loaded) == 2

    def test_preprocess_pipeline_flags(self, tiny_model):
        obs = make_obs(1)
        assert not obs.meta["is_zoomed"]
        pre = tiny_model.preprocess_observation(obs)
        assert pre.meta["is_zoomed"]
        assert pre.meta["is_prepared"]
        assert pre.meta["is_normalized"]
        assert pre.color.shape[-1] == tiny_model.input_size
        # Idempotent.
        pre2 = tiny_model.preprocess_observation(pre)
        np.testing.assert_allclose(np.asarray(pre2.color),
                                   np.asarray(pre.color))

    def test_collate_expand(self):
        a, b = make_obs(1), make_obs(1)
        both = Observation.collate([a, b])
        assert len(both) == 2
        exp = a.expand(4)
        assert len(exp) == 4

    def test_prepare_masks_background(self):
        obs = make_obs(1)
        pre = obs.prepare()
        outside = np.asarray(pre.depth)[0, 0, 0, 0]
        assert outside == 0.0


class TestLatentFusionModel:
    def test_build_and_render(self, tiny_model):
        obs = make_obs(2, key=jax.random.PRNGKey(2))
        z_obj = tiny_model.build_latent_object(obs)
        assert z_obj.shape[0] == 1 and z_obj.shape[1] == 1
        cam = make_camera(3, z=1.5, f=64, width=64, height=48,
                          key=jax.random.PRNGKey(3))
        zoom = cam.zoom(None, tiny_model.input_size, tiny_model.camera_dist)
        y, z_lat = tiny_model.render_latent_object(z_obj, zoom)
        assert y["depth"].shape == (1, 3, 1, 16, 16)
        assert np.isfinite(np.asarray(y["depth"])).all()

    def test_render_full_uncrops(self, tiny_model):
        obs = make_obs(2, key=jax.random.PRNGKey(2))
        z_obj = tiny_model.build_latent_object(obs)
        cam = make_camera(1, z=1.5, f=64, width=64, height=48)
        out = tiny_model.render_full(z_obj, cam)
        assert out["depth"].shape == (1, 1, 48, 64)
        assert out["mask"].shape == (1, 1, 48, 64)

    def test_compute_latent_code(self, tiny_model):
        obs = make_obs(1, key=jax.random.PRNGKey(4))
        cam = make_camera(2, z=1.5, f=64, width=64, height=48)
        feats = tiny_model.compute_latent_code(obs, cam)
        assert feats.shape[0] == 2

    def test_torch_checkpoint_roundtrip(self, tiny_model, tmp_path):
        """Export a reference-format .pth and load it back through the
        public from_checkpoint API; renders must match exactly."""
        import torch

        from latentfusion_tpu.recon import checkpoint as ckpt

        def module_ckpt(module, params):
            return {
                "args": module.checkpoint_args(),
                "state_dict": {
                    k: torch.from_numpy(np.array(v)) for k, v in
                    ckpt.export_torch_state_dict(params).items()
                },
            }

        payload = {
            "name": "tiny-test",
            "epoch": 0,
            "meter_hists": {},
            "args": {"camera_dist": tiny_model.camera_dist,
                     "no_discriminator": True},
            "modules": {
                "sculptor": module_ckpt(tiny_model.sculptor,
                                        tiny_model.sculptor_params),
                "photographer": module_ckpt(tiny_model.photographer,
                                            tiny_model.photographer_params),
                "fuser": {
                    "type": "GRUFuser",
                    "args": {"in_channels": 4, "cube_size": 1.0},
                    "state_dict": {
                        k: torch.from_numpy(np.array(v)) for k, v in
                        ckpt.export_torch_state_dict(
                            tiny_model.fuser_params).items()
                    },
                },
            },
        }
        path = tmp_path / "model.pth"
        torch.save(payload, path)

        loaded = LatentFusionModel.from_checkpoint(path)
        assert loaded.camera_dist == tiny_model.camera_dist
        assert loaded.input_size == tiny_model.input_size

        obs = make_obs(2, key=jax.random.PRNGKey(5))
        z1 = tiny_model.build_latent_object(obs)
        z2 = loaded.build_latent_object(obs)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)


class TestLoadModels:
    def test_load_models_and_size_properties(self, tiny_model):
        from latentfusion_tpu.recon import checkpoint as ckpt

        def module_ckpt(module, params):
            return {"args": module.checkpoint_args(),
                    "state_dict": ckpt.export_torch_state_dict(params)}

        full = {
            "name": "t", "epoch": 0,
            "args": {"no_discriminator": True,
                     "generator_input_depth": True,
                     "generator_input_mask": True,
                     "predict_color": False, "predict_depth": True,
                     "predict_mask": True},
            "modules": {
                "sculptor": module_ckpt(tiny_model.sculptor,
                                        tiny_model.sculptor_params),
                "photographer": module_ckpt(tiny_model.photographer,
                                            tiny_model.photographer_params),
                "fuser": {"type": "GRUFuser",
                          "args": {"in_channels": 4, "cube_size": 1.0},
                          "state_dict": ckpt.export_torch_state_dict(
                              tiny_model.fuser_params)},
            },
        }
        sc, fu, ph, disc = ckpt.load_models(full)
        assert type(sc[0]).__name__ == "Sculptor"
        assert type(fu[0]).__name__ == "GRUFuser"
        assert type(ph[0]).__name__ == "Photographer"
        assert disc is None

        out5 = ckpt.load_models(full, return_generator=True)
        assert len(out5) == 5 and out5[-1] is None

        # size accounting (reference: models.py:161-163, 342-348)
        sculptor, photographer = sc[0], ph[0]
        assert sculptor.image_bottleneck_size == (
            sculptor.in_size // 2 ** (
                sculptor.image_config[0].count("D")
                + sculptor.image_config[0].count("I")))
        assert photographer.out_size >= photographer.camera_out_size
        assert photographer.image_bottleneck_size <= photographer.camera_out_size
