"""LatentFusionModel — the public inference API.

Behavioral reference: ``latentfusion/recon/inference.py``. Preserves the
reference's surface: ``from_checkpoint``, ``preprocess_observation``,
``build_latent_object``, ``render_latent_object``, ``render_full``,
``compute_latent_code``, ``render_ibr_basic`` / ``render_ibr``.

Hot entry points are jitted per (shape, flags) via ``functools`` caching on
the bound closures; everything inside stays on-device.
"""
from __future__ import annotations

import logging
from pathlib import Path

import jax
import jax.numpy as jnp

from .. import ibr
from ..camera import Camera
from ..observation import Observation
from ..three.batchview import b2bv
from . import checkpoint as ckpt
from . import models

logger = logging.getLogger(__name__)


class LatentFusionModel:
    """(reference: inference.py:14-44)"""

    @classmethod
    def from_checkpoint(cls, checkpoint, device=None) -> "LatentFusionModel":
        """Load from a reference torch ``.pth`` (path or loaded dict)."""
        if isinstance(checkpoint, (str, Path)):
            checkpoint = ckpt.load_torch_checkpoint(checkpoint)
        kwargs = checkpoint["args"]
        name = checkpoint.get("name", "<unnamed>")
        epoch = checkpoint.get("epoch", -1) + 1
        checkpoint = ckpt.patch_legacy_args(checkpoint)

        sculptor, sculptor_params = ckpt.sculptor_from_checkpoint(
            checkpoint["modules"]["sculptor"])
        photographer, photographer_params = ckpt.photographer_from_checkpoint(
            checkpoint["modules"]["photographer"])
        fuser, fuser_params = ckpt.fuser_from_checkpoint(
            checkpoint["modules"]["fuser"])

        generator = None
        generator_params = None
        gen_ckpt = checkpoint.get("modules", {}).get("generator")
        if gen_ckpt is not None:
            from ..modules import unet

            args = dict(gen_ckpt["args"])
            args.pop("conv_module", None)
            for k in ("block_config",):
                if k in args:
                    args[k] = ckpt._to_block_config(args[k])
            generator = unet.UNet2d(**args)
            generator_params = ckpt.convert_torch_state_dict(gen_ckpt["state_dict"])

        model = cls(sculptor, sculptor_params, fuser, fuser_params,
                    photographer, photographer_params,
                    camera_dist=kwargs["camera_dist"],
                    generator=generator, generator_params=generator_params)
        logger.info("loaded model name=%s epoch=%s", name, epoch)
        return model

    def __init__(self, sculptor, sculptor_params, fuser, fuser_params,
                 photographer, photographer_params, camera_dist,
                 generator=None, generator_params=None, device=None):
        self.sculptor = sculptor
        self.sculptor_params = sculptor_params
        self.fuser = fuser
        self.fuser_params = fuser_params
        self.photographer = photographer
        self.photographer_params = photographer_params
        self.generator = generator
        self.generator_params = generator_params

        self.camera_dist = camera_dist
        # Decode-only models (e.g. a distilled photographer) have no
        # encoder; callers set input_size directly then.
        self.input_size = sculptor.in_size if sculptor is not None else None
        self.device = device

        # Jitted kernels (cached per input shape / observation meta flags by
        # jax; Observation meta is static pytree aux).
        def _build(sp, fp, observation):
            obs = self.preprocess_observation(observation)
            z_obj, _ = models.encode(self.sculptor, sp, self.fuser, fp,
                                     obs.camera, obs.color[None],
                                     obs.depth[None], obs.mask[None])
            return z_obj

        self._build_jit = jax.jit(_build)
        self._decode_jit = {}

    # API-parity no-ops (flax modules are stateless).
    def eval(self):
        return self

    def train(self, mode=True):
        return self

    # ------------------------------------------------------------ preprocess
    def zoom_observation(self, observation: Observation) -> Observation:
        if not observation.meta["is_zoomed"]:
            return observation.zoom(self.camera_dist, self.input_size)
        return observation

    def preprocess_observation(self, observation: Observation) -> Observation:
        """(reference: inference.py:63-71)"""
        if not observation.meta["is_zoomed"]:
            observation = observation.zoom(self.camera_dist, self.input_size)
        if not observation.meta["is_prepared"]:
            observation = observation.prepare()
        if not observation.meta["is_normalized"]:
            observation = observation.normalize()
        return observation

    # --------------------------------------------------------------- encode
    def build_latent_object(self, observation: Observation):
        """(reference: inference.py:73-84). Preprocess + encode as one
        jitted program (zoom/normalize included)."""
        z_obj = self._build_jit(self.sculptor_params, self.fuser_params,
                                observation)
        return jax.lax.stop_gradient(z_obj)

    def compute_latent_code(self, observation: Observation, camera: Camera):
        """Autoencode the target at hypothesis cameras -> target latent
        (reference: inference.py:86-99)."""
        observation = self.preprocess_observation(observation)
        num_batch = len(camera)
        if len(observation) == 1:
            observation = observation.expand(num_batch)
        _, feats_tar = models.autoencode(
            self.sculptor, self.sculptor_params, self.fuser, self.fuser_params,
            self.photographer, self.photographer_params, camera,
            observation.color[:, None], observation.depth[:, None],
            observation.mask[:, None])
        return feats_tar

    # --------------------------------------------------------------- decode
    def decode_latent(self, z_obj, camera: Camera, return_latent: bool = True,
                      apply_mask: bool = False):
        """Pure (unjitted) decode used inside estimator jit loops."""
        return models.decode(self.photographer, self.photographer_params,
                             z_obj, camera, interpret=True,
                             return_latent=return_latent,
                             apply_mask=apply_mask)

    def _decode(self, z_obj, camera, return_latent, apply_mask):
        key = (return_latent, apply_mask)
        if key not in self._decode_jit:
            self._decode_jit[key] = jax.jit(
                lambda p, z, cam: models.decode(
                    self.photographer, p, z, cam, interpret=True,
                    return_latent=return_latent, apply_mask=apply_mask))
        return self._decode_jit[key](self.photographer_params, z_obj, camera)

    def render_latent_object(self, z_obj, camera: Camera,
                             return_latent: bool = True,
                             apply_mask: bool = True):
        """(reference: inference.py:122-128)"""
        y_opt, z_opt, _ = self._decode(z_obj, camera, return_latent, apply_mask)
        if return_latent:
            z_opt = z_opt.squeeze(0)  # decoding one object
        return y_opt, z_opt

    def render_full(self, z_obj, camera: Camera, input_obs=None, p=0.5):
        """Render + denormalize depth + uncrop to the full frame
        (reference: inference.py:101-120)."""
        camera_zoom = camera.zoom(None, self.input_size, self.camera_dist)
        if input_obs is None:
            pred_y, _ = self.render_latent_object(z_obj, camera_zoom,
                                                  apply_mask=True,
                                                  return_latent=False)
        else:
            pred_y, _ = self.render_ibr_basic(z_obj, input_obs, camera_zoom,
                                              apply_mask=True,
                                              return_latent=False, p=p)
        out = {}
        mask = pred_y["mask"].squeeze(0)
        depth = pred_y["depth"].squeeze(0)
        depth = camera_zoom.denormalize_depth(depth) * mask
        out["depth"], _ = camera_zoom.uncrop(depth)
        out["mask"], _ = camera_zoom.uncrop(mask)
        if "color" in pred_y:
            color = pred_y["color"].squeeze(0) / 2 + 0.5
            out["color"], _ = camera_zoom.uncrop(color)
        return out

    # ------------------------------------------------------------------ IBR
    def render_ibr_basic(self, z_obj, input_obs: Observation,
                         camera_out: Camera, return_latent: bool = True,
                         apply_mask: bool = True, p=0.5):
        """(reference: inference.py:130-152)"""
        input_obs = self.preprocess_observation(input_obs)
        y_ibr, z_ibr = ibr.render_latent_ibr2(
            self.photographer, self.photographer_params, z_obj,
            input_obs.camera, camera_out,
            b2bv(input_obs.color, batch_size=1),
            p=p, weight_type="cam_dist", return_latent=return_latent,
            apply_mask=apply_mask)
        if return_latent:
            z_ibr = z_ibr.squeeze(0)
        y_ibr = {k: v.squeeze(0) if k == "color" else v for k, v in y_ibr.items()}
        return y_ibr, z_ibr

    def render_ibr(self, z_obj, input_obs: Observation, camera_out: Camera,
                   return_latent: bool = True):
        """Learned-generator IBR color (reference: inference.py:154-215)."""
        if self.generator is None:
            raise ValueError("no IBR generator in this checkpoint")
        input_obs = self.preprocess_observation(input_obs)
        color_in = input_obs.color
        camera_in = input_obs.camera

        (y_out, z_out, image_reproj, depth_reproj, mask_ibr_out,
         depth_ibr_out, cam_dist_r, cam_dist_t) = self._render_reprojections(
            z_obj, color_in, camera_in, camera_out)
        if return_latent:
            z_out = z_out.squeeze(0)

        cam_sims = 1.0 - cam_dist_t * 2
        x = jnp.concatenate(
            (
                image_reproj,
                depth_reproj,
                jnp.broadcast_to(
                    cam_sims[:, :, None, None, None],
                    (*cam_sims.shape, 1, *image_reproj.shape[-2:])),
            ),
            axis=2,
        )
        x = x.reshape(-1, x.shape[1] * x.shape[2], x.shape[3], x.shape[4])
        x = jnp.concatenate((depth_ibr_out, x), axis=1)
        logits = self.generator.apply(self.generator_params, x)
        color_ibr, _, _, _ = ibr.warp_blend_logits(logits, image_reproj, 5)
        y_out["color"] = color_ibr
        # torch .squeeze(0) is a no-op on non-1 leading dims (the blended
        # color is already view-folded); mirror that.
        y_out = {k: (v.squeeze(0) if v.shape[0] == 1 else v)
                 for k, v in y_out.items()}
        return y_out, z_out

    def _render_reprojections(self, z_obj, color_in, camera_in, camera_out,
                              return_latent: bool = True):
        """(reference: inference.py:195-215)"""
        from ..three.batchview import bv2b

        y_in, _, _ = models.decode(self.photographer, self.photographer_params,
                                   z_obj, camera_in)
        y_out, z_out, _ = models.decode(self.photographer,
                                        self.photographer_params, z_obj,
                                        camera_out,
                                        return_latent=return_latent)
        mask_fake_out = y_out["mask"]
        depth_fake_out = y_out["depth"]
        image_reproj, depth_reproj, cam_dist_r, cam_dist_t = \
            ibr.reproject_views_batch(color_in[None], y_in["depth"],
                                      y_out["depth"], camera_in, camera_out)
        image_reproj = image_reproj * mask_fake_out[:, :, None]
        depth_reproj = (depth_reproj + 1.0) * mask_fake_out[:, :, None] - 1.0
        return (y_out, z_out, bv2b(image_reproj), bv2b(depth_reproj),
                bv2b(mask_fake_out), bv2b(depth_fake_out), bv2b(cam_dist_r),
                bv2b(cam_dist_t))
