"""Jitted IBR-generator training step.

Behavioral reference: ``tools/train/train_ibr.py:305-460`` (IBRTrainer
run_iteration): a frozen (or fine-tuned) reconstruction model predicts depth
for input+output views; input colors are reprojected into output views via
the predicted depths; a UNet2d generator consumes [predicted output depth,
per-view (reprojected color, reprojected depth, rotation+translation camera
distances)] and regresses or blends the output color.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .. import ibr
from ..camera import Camera
from ..recon import models
from ..recon.utils import mask_normalized_depth, process_batch
from ..three.batchview import b2bv, bv2b
from . import step as base_step
from .. import losses as L


class IBRTrainState(NamedTuple):
    params: Dict[str, Any]        # generator (+ recon modules if train_recon)
    opt_state: Any
    d_params: Any
    d_opt_state: Any
    step: jnp.ndarray


def generator_in_channels(num_input_views: int) -> int:
    """1 output-depth channel + per input view (3 color + 1 depth + 2 camera
    distance channels) (reference: train_ibr.py:161-166)."""
    return 1 + (2 + 1 + 3) * num_input_views


def generator_out_channels(ibr_type: str, num_input_views: int):
    """(reference: train_ibr.py:166-174)"""
    if ibr_type == "regress":
        return (3,)
    elif ibr_type == "blend":
        return (num_input_views,)
    elif ibr_type == "blend_flow":
        return (num_input_views,) * 3
    raise ValueError("Unknown ibr_type")


def make_ibr_train_step(sculptor, fuser, photographer, generator,
                        g_optimizer, discriminator=None, d_optimizer=None,
                        config: Optional[Dict] = None):
    config = dict(config or {})
    cube_size = config.get("cube_size", 1.0)
    camera_dist = config.get("camera_dist", 1.5)
    input_size = sculptor.in_size
    num_input_views = config["num_input_views"]
    num_output_views = config["num_output_views"]
    batch_size = config.get("batch_size", 1)
    ibr_type = config.get("ibr_type", "blend_flow")
    flow_size = config.get("flow_size", 5)
    train_recon = config.get("train_recon", False)
    no_apply_mask = config.get("no_apply_mask", False)
    gan_weight = config.get("g_gan_loss_weight", 1.0)
    color_weight = config.get("g_color_recon_loss_weight", 50.0)
    color_loss_type = config.get("g_color_recon_loss_type", "l1")
    color_k = config.get("g_color_recon_loss_k", 2000)
    noise_std = config.get("input_noise_std", 0.2)

    def render_reprojections(params, batch, key):
        """(reference: train_ibr.py:305-357)"""
        recon_camera = Camera.vcat(
            (batch["in_gt"]["camera"], batch["out_gt"]["camera"]),
            batch_size=batch_size)

        depth_in = None
        if config.get("generator_input_depth", False):
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, batch["in"]["depth"].shape) * \
                config.get("depth_noise_std", 0.25)
            depth_in = jnp.clip(batch["in"]["depth"] + noise, -1, 1)

        def recon_fn(recon_params):
            z_obj, _ = models.encode(
                sculptor, recon_params["sculptor"], fuser,
                recon_params.get("fuser", {}), batch["in"]["camera"],
                batch["in"]["image"], depth_in, batch["in"]["mask"])
            fake, _, _ = models.decode(photographer,
                                       recon_params["photographer"], z_obj,
                                       recon_camera, interpret=True)
            return fake

        if train_recon:
            fake = recon_fn(params["recon"])
        else:
            fake = jax.lax.stop_gradient(recon_fn(params["recon"]))

        v = num_input_views
        depth_fake_in = fake["depth"][:, :v]
        depth_fake_out = fake["depth"][:, v:]
        mask_fake_out = fake["mask"][:, v:]

        image_reproj, depth_reproj, cam_dists_r, cam_dists_t = \
            ibr.reproject_views_batch(
                batch["in"]["image"], depth_fake_in, depth_fake_out,
                batch["in"]["camera"], batch["out_gt"]["camera"])
        image_reproj = image_reproj * mask_fake_out[:, :, None]
        depth_reproj = (depth_reproj + 1.0) * mask_fake_out[:, :, None] - 1.0
        return (image_reproj, depth_reproj, mask_fake_out, depth_fake_out,
                cam_dists_r, cam_dists_t)

    def g_loss_fn(params, batch, key, input_noise_weight, d_params):
        proc = process_batch(batch, cube_size, camera_dist, input_size,
                             random_orientation=False)
        proc["in"]["image"] = proc["in"]["image"] * proc["in"]["mask"]
        if "depth" in proc["in"]:
            proc["in"]["depth"] = mask_normalized_depth(proc["in"]["depth"],
                                                        proc["in"]["mask"])

        (image_reproj, depth_reproj, mask_ibr_out, depth_ibr_out, cam_r,
         cam_t) = render_reprojections(params, proc, key)

        hw = image_reproj.shape[-2:]
        x = jnp.concatenate((
            image_reproj,
            depth_reproj,
            jnp.broadcast_to(cam_r[:, :, :, None, None, None],
                             (*cam_r.shape, 1, *hw)),
            jnp.broadcast_to(cam_t[:, :, :, None, None, None],
                             (*cam_t.shape, 1, *hw)),
        ), axis=3)
        x = x.reshape(x.shape[0] * x.shape[1], x.shape[2] * x.shape[3],
                      *hw)
        x = jnp.concatenate((bv2b(depth_ibr_out), x), axis=1)

        logits = generator.apply(params["generator"], x)
        if ibr_type == "regress":
            image_ibr_out = jnp.tanh(logits)
        elif ibr_type == "blend":
            image_ibr_out, _ = ibr.blend_logits(logits, bv2b(image_reproj))
        else:
            image_ibr_out, _, _, _ = ibr.warp_blend_logits(
                logits, bv2b(image_reproj), flow_size)
        image_ibr_out = b2bv(image_ibr_out, num_output_views)

        if not no_apply_mask:
            image_ibr_out = image_ibr_out * mask_ibr_out

        gt_image = proc["out_gt"]["image"] * proc["out_gt"]["mask"]
        loss_dict = {
            "color": color_weight * base_step._recon_loss(
                color_loss_type, image_ibr_out, gt_image, color_k)
        }

        d_pack = None
        if discriminator is not None:
            key, k1, k2 = jax.random.split(key, 3)
            real = bv2b(proc["out_gt"]["image"])
            fake_img = bv2b(image_ibr_out)
            rn = input_noise_weight * noise_std * jax.random.normal(
                k1, real.shape)
            fn_ = input_noise_weight * noise_std * jax.random.normal(
                k2, fake_img.shape)
            d_fake_g = discriminator.apply(d_params, fake_img + fn_,
                                           bv2b(mask_ibr_out))
            loss_dict["gan"] = gan_weight * L.multiscale_lsgan_loss(d_fake_g, 1)
            d_pack = (jax.lax.stop_gradient(fake_img), real,
                      bv2b(proc["out_gt"]["mask"]), bv2b(mask_ibr_out),
                      rn, fn_)

        total = sum(loss_dict.values())
        return total, (loss_dict, d_pack)

    def d_loss_fn(d_params, d_pack):
        fake_img, real, real_mask, fake_mask, rn, fn_ = d_pack
        d_real = discriminator.apply(d_params, real + rn, real_mask)
        d_fake = discriminator.apply(d_params, fake_img + fn_, fake_mask)
        loss_real = L.multiscale_lsgan_loss(d_real, 1)
        loss_fake = L.multiscale_lsgan_loss(d_fake, 0)
        return loss_real + loss_fake, (loss_real, loss_fake)

    g_grad = jax.value_and_grad(g_loss_fn, has_aux=True)
    d_grad = (jax.value_and_grad(d_loss_fn, has_aux=True)
              if discriminator is not None else None)

    def step(state: IBRTrainState, batch, key, input_noise_weight=0.0):
        (g_loss, (loss_dict, d_pack)), grads = g_grad(
            state.params, batch, key, input_noise_weight, state.d_params)
        if not train_recon:
            grads = {**grads,
                     "recon": jax.tree_util.tree_map(jnp.zeros_like,
                                                     grads["recon"])}
        updates, opt_state = g_optimizer.update(grads, state.opt_state,
                                                state.params)
        params = optax.apply_updates(state.params, updates)
        scalars = {f"loss/generator/recon/{k}": v
                   for k, v in loss_dict.items()}
        scalars["loss/generator/total"] = g_loss

        d_params, d_opt_state = state.d_params, state.d_opt_state
        if discriminator is not None:
            (d_loss, (lr_, lf_)), dg = d_grad(state.d_params, d_pack)
            d_updates, d_opt_state = d_optimizer.update(dg, state.d_opt_state,
                                                        state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)
            scalars["loss/discriminator/total"] = d_loss

        return IBRTrainState(params, opt_state, d_params, d_opt_state,
                             state.step + 1), scalars

    return jax.jit(step)
