"""Jitted reconstruction training step (data-parallel over a device mesh).

Behavioral reference: ``tools/train/train_reconstruct.py:421-604``
(run_iteration) — the published recipe (train.sh) trains with no
discriminator: generator losses only (depth hard-smooth-L1 top-k + mask BCE
[+ color, + mask beta prior]). The GAN path is ``make_recon_train_step``'s
discriminator branch below in this module.

TPU mapping: one jitted step; batch sharded over the ``data`` mesh axis
(gradients psum'd by XLA over ICI); bf16-friendly conv stacks; gradient
accumulation expressed as a ``lax.scan`` over microbatches.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .. import losses as L
from ..recon import models
from ..recon.utils import mask_normalized_depth


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(name: str = "adam", learning_rate: float = 1e-3,
                   b1: float = 0.0, b2: float = 0.99):
    """Reference optimizer factory: adam with betas (0.0, 0.99)
    (reference: trainutils.py:103-111)."""
    if name == "adam":
        return optax.adam(learning_rate, b1=b1, b2=b2)
    elif name == "sgd":
        return optax.sgd(learning_rate)
    elif name == "rmsprop":
        return optax.rmsprop(learning_rate)
    raise ValueError(f"Unknown optimizer {name!r}")


def _recon_loss(kind: str, pred, target, k: int):
    if kind == "l1":
        return L.l1_loss(pred, target)
    elif kind == "smooth_l1":
        return L.smooth_l1_loss(pred, target)
    elif kind == "hard_l1":
        return L.hard_pixel_loss(L.l1_loss, pred, target, k)
    elif kind == "hard_smooth_l1":
        return L.hard_pixel_loss(L.smooth_l1_loss, pred, target, k)
    elif kind == "binary_cross_entropy":
        return L.binary_cross_entropy_loss(pred, target)
    raise ValueError(f"Unknown loss type {kind!r}")


def generator_losses(photographer, y: Dict, batch_gt: Dict, config: Dict,
                     depth_k: int) -> Dict[str, jnp.ndarray]:
    """Reconstruction losses against ground truth
    (reference: train_reconstruct.py:491-521)."""
    out = {}
    gt_camera = batch_gt["camera"]
    if photographer.predict_depth:
        gt_depth = mask_normalized_depth(batch_gt["depth"], batch_gt["mask"])
        out["depth"] = config.get("g_depth_recon_loss_weight", 25.0) * \
            _recon_loss(config.get("g_depth_recon_loss_type", "hard_smooth_l1"),
                        y["depth"], gt_depth, depth_k)
    if photographer.predict_mask:
        out["mask"] = config.get("g_mask_recon_loss_weight", 25.0) * \
            _recon_loss(config.get("g_mask_recon_loss_type",
                                   "binary_cross_entropy"),
                        y["mask"], batch_gt["mask"],
                        config.get("g_mask_recon_loss_k", 2000))
        beta_w = config.get("g_mask_beta_loss_weight", 0.0)
        if beta_w > 0:
            p = config.get("g_mask_beta_loss_param", 0.01)
            out["mask_beta"] = beta_w * L.beta_prior_loss(y["mask"], p, p)
    if photographer.predict_color:
        gt_color = batch_gt["image"] * batch_gt["mask"]
        out["color"] = config.get("g_color_recon_loss_weight", 50.0) * \
            _recon_loss(config.get("g_color_recon_loss_type", "l1"),
                        y["color"], gt_color,
                        config.get("g_color_recon_loss_k", 2000))
    del gt_camera
    return out


def make_train_step(sculptor, fuser, photographer, optimizer,
                    config: Optional[Dict] = None, num_microbatches: int = 1,
                    state_shardings=None):
    """Build the jitted training step.

    The returned ``step(state, batch, key, depth_k)`` expects a processed
    batch (see ``recon.utils.process_batch``):
    ``{'in': {image (B,V,3,h,w), depth, mask, camera(B*V)}, 'out_gt': {...}}``.
    ``depth_k`` is the annealed hard-pixel k (static; milestones change it
    between compilations, reference: train_reconstruct.py:424-425).

    ``state_shardings`` (a ``TrainState`` of ``NamedSharding``, see
    ``parallel.fsdp_shardings``) pins the updated state's layout so
    ZeRO-style parameter/optimizer sharding persists across steps — without
    the constraint GSPMD may re-replicate the params after the optimizer
    update. XLA inserts the param all-gathers / grad reduce-scatters from
    the shardings; nothing here is collective-aware.
    """
    config = config or {}

    def loss_fn(params, batch, key):
        bin = batch["in"]
        bout = batch["out_gt"]
        z_obj, _ = models.encode(
            sculptor, params["sculptor"], fuser, params.get("fuser", {}),
            bin["camera"], bin["image"],
            bin.get("depth"), bin["mask"])
        y, _, _ = models.decode(photographer, params["photographer"], z_obj,
                                bout["camera"], interpret=True)
        depth_k = config.get("g_depth_recon_loss_k", 16384)
        loss_dict = generator_losses(photographer, y, bout, config, depth_k)
        total = sum(loss_dict.values())
        return total, loss_dict

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, batch, key):
        if num_microbatches > 1:
            # Gradient accumulation via scan over microbatches
            # (reference --batch-groups, trainutils.py:32-35, 366-371).
            def micro(carry, mb):
                acc_grads, acc_loss = carry
                (loss, aux), grads = grad_fn(state.params, mb, key)
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                return (acc_grads, acc_loss + loss), aux

            mbs = jax.tree_util.tree_map(
                lambda x: x.reshape(num_microbatches,
                                    x.shape[0] // num_microbatches,
                                    *x.shape[1:]), batch)
            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss), aux = jax.lax.scan(micro, (zero, 0.0), mbs)
            grads = jax.tree_util.tree_map(
                lambda g: g / num_microbatches, grads)
            loss = loss / num_microbatches
            aux = jax.tree_util.tree_map(lambda x: x[-1], aux)
        else:
            (loss, aux), grads = grad_fn(state.params, batch, key)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        if state_shardings is not None:
            new_state = jax.lax.with_sharding_constraint(
                new_state, state_shardings)
        return new_state, loss, aux

    return jax.jit(step)


def init_train_state(params: Dict[str, Any], optimizer) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.asarray(0))


# ---------------------------------------------------------------------------
# Full reconstruction iteration (process_batch + GAN), the jitted analog of
# the reference's run_iteration (train_reconstruct.py:421-604).
# ---------------------------------------------------------------------------

class GanTrainState(NamedTuple):
    params: Dict[str, Any]        # sculptor/fuser/photographer
    opt_state: Any
    d_params: Any                 # discriminator (or empty dict)
    d_opt_state: Any
    step: jnp.ndarray


def make_recon_train_step(sculptor, fuser, photographer, g_optimizer,
                          discriminator=None, d_optimizer=None,
                          config: Optional[Dict] = None,
                          num_microbatches: int = 1,
                          state_shardings=None, jit: bool = True):
    """Full training iteration:

    process_batch -> optional input masking/noise -> encode -> decode on
    output (+input) cameras -> multiscale LSGAN D step with annealed
    instance noise -> G losses (GAN + recon + beta prior) -> optax updates.

    Returns ``step(state, raw_batch, key, input_noise_weight) ->
    (state, scalars)``; ``depth_k`` is baked via config (annealed between
    compilations, reference: train_reconstruct.py:424-425).

    ``num_microbatches`` > 1 is the reference's ``--batch-groups`` gradient
    accumulation (trainutils.py:32-35, 366-371) as a ``lax.scan`` over
    leading-axis batch slices inside ONE jitted step. With a discriminator,
    both G and D gradients accumulate over the microbatches before their
    single optimizer updates (the reference steps every ``groups``
    iterations, train_reconstruct.py:515-534 — same averaged gradients).
    """
    from ..camera import Camera
    from ..recon.utils import process_batch
    from ..three.batchview import bv2b

    config = dict(config or {})
    cube_size = config.get("cube_size", 1.0)
    camera_dist = config.get("camera_dist", 1.5)
    input_size = sculptor.in_size
    reconstruct_input = config.get("reconstruct_input", False)
    random_orientation = config.get("random_orientation", True)
    crop_random_background = config.get("crop_random_background", False)
    color_random_background = config.get("color_random_background", False)
    depth_random_background = config.get("depth_random_background", False)
    generator_input_depth = config.get("generator_input_depth", False)
    depth_noise_std = config.get("depth_noise_std", 0.25)
    crop_predicted_mask = config.get("crop_predicted_mask", False)
    d_inputs = {
        "color": config.get("discriminator_input_color", False),
        "depth": config.get("discriminator_input_depth", False),
        "mask": config.get("discriminator_input_mask", False),
    }
    gan_weight = config.get("g_gan_loss_weight", 1.0)

    # Rematerialization: trade ~1/3 extra FLOPs for activation memory so the
    # published batch sizes fit HBM (the TPU analog of the reference's
    # memory-motivated AMP + batch-groups; enable with config["remat"]).
    use_remat = config.get("remat", False)

    def forward_and_g_loss(params, batch, key, input_noise_weight, d_params):
        proc = process_batch(batch, cube_size, camera_dist, input_size,
                             random_orientation=random_orientation, key=key)

        if reconstruct_input:
            recon_camera = Camera.vcat(
                (proc["in_gt"]["camera"], proc["out_gt"]["camera"]),
                batch_size=batch["in"]["mask"].shape[0])
            recon = {
                k: jnp.concatenate((proc["in_gt"][k], proc["out_gt"][k]),
                                   axis=1)
                for k in ("image", "depth", "mask")
            }
        else:
            recon_camera = proc["out_gt"]["camera"]
            recon = {k: proc["out_gt"][k] for k in ("image", "depth", "mask")}

        # Input masking (reference: train_reconstruct.py:441-446).
        image_in = proc["in"]["image"]
        depth_norm = proc["in"].get("depth")
        mask_in = proc["in"]["mask"]
        if not color_random_background or crop_random_background:
            image_in = image_in * mask_in
        if depth_norm is not None and (
                not depth_random_background or crop_random_background):
            depth_norm = mask_normalized_depth(depth_norm, mask_in)

        depth_in = None
        if generator_input_depth:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, depth_norm.shape) * depth_noise_std
            depth_in = jnp.clip(depth_norm + noise, -1, 1)

        def encode_fn(sp, fp, cam, img, dep, msk):
            z, _ = models.encode(sculptor, sp, fuser, fp, cam, img, dep, msk)
            return z

        def decode_fn(pp, z, cam):
            y, _, _ = models.decode(photographer, pp, z, cam, interpret=True)
            return y

        if use_remat:
            encode_fn = jax.checkpoint(encode_fn)
            decode_fn = jax.checkpoint(decode_fn)

        z_obj = encode_fn(params["sculptor"], params.get("fuser", {}),
                          proc["in"]["camera"], image_in, depth_in, mask_in)
        y = decode_fn(params["photographer"], z_obj, recon_camera)
        fake_image = y.get("color")
        if (photographer.predict_mask and photographer.predict_color):
            if crop_predicted_mask:
                fake_image = fake_image * y["mask"]
            else:
                fake_image = fake_image * recon["mask"]

        # Generator losses.
        depth_k = config.get("g_depth_recon_loss_k", 16384)
        loss_dict = {}
        if photographer.predict_depth:
            gt_depth = mask_normalized_depth(recon["depth"], recon["mask"])
            loss_dict["depth"] = config.get("g_depth_recon_loss_weight", 25.0) * \
                _recon_loss(config.get("g_depth_recon_loss_type",
                                       "hard_smooth_l1"),
                            y["depth"], gt_depth, depth_k)
        if photographer.predict_mask:
            kind = config.get("g_mask_recon_loss_type", "binary_cross_entropy")
            y_mask = y["mask_logits"] if kind == "binary_cross_entropy" else \
                y["mask"]
            if kind == "binary_cross_entropy":
                from ..pose.estimation import _bce_with_logits

                loss_dict["mask"] = config.get("g_mask_recon_loss_weight",
                                               25.0) * \
                    _bce_with_logits(y_mask, recon["mask"]).mean()
            else:
                loss_dict["mask"] = config.get("g_mask_recon_loss_weight",
                                               25.0) * \
                    _recon_loss(kind, y_mask, recon["mask"],
                                config.get("g_mask_recon_loss_k", 2000))
            beta_w = config.get("g_mask_beta_loss_weight", 0.0)
            if beta_w > 0:
                p = config.get("g_mask_beta_loss_param", 0.01)
                loss_dict["mask_beta"] = beta_w * L.beta_prior_loss(
                    y["mask"], p, p)
        if photographer.predict_color:
            loss_dict["color"] = config.get("g_color_recon_loss_weight",
                                            50.0) * \
                _recon_loss(config.get("g_color_recon_loss_type", "l1"),
                            fake_image, recon["image"],
                            config.get("g_color_recon_loss_k", 2000))

        d_fake_for_g = None
        d_pack = None
        if discriminator is not None:
            key, k1, k2 = jax.random.split(key, 3)
            y_fake, y_real, mask_real = _stack_d_inputs(
                d_inputs, fake_image, y.get("depth"), y.get("mask"),
                recon["image"], recon["depth"], recon["mask"])
            noise_std = config.get("input_noise_std", 0.2)
            real_noise = input_noise_weight * noise_std * jax.random.normal(
                k1, y_real.shape)
            fake_noise = input_noise_weight * noise_std * jax.random.normal(
                k2, y_fake.shape)
            d_fake_for_g = discriminator.apply(
                d_params, y_fake + fake_noise, mask_real)
            loss_dict["gan"] = gan_weight * L.multiscale_lsgan_loss(
                d_fake_for_g, 1)
            d_pack = (jax.lax.stop_gradient(y_fake), y_real, mask_real,
                      real_noise, fake_noise)

        total = sum(loss_dict.values())
        return total, (loss_dict, d_pack)

    def _stack_d_inputs(d_flags, image_fake, depth_fake, mask_fake,
                        image_real, depth_real, mask_real):
        """(reference: train_reconstruct.py:606-631)"""
        y_fake, y_real = [], []
        if d_flags["color"]:
            y_fake.append(image_fake)
            y_real.append(image_real)
        if d_flags["depth"]:
            y_fake.append(depth_fake)
            y_real.append(depth_real)
        if d_flags["mask"]:
            y_fake.append(mask_fake)
            y_real.append(mask_real)
        y_fake = jnp.concatenate([bv2b(t) for t in y_fake], axis=1)
        y_real = jnp.concatenate([bv2b(t) for t in y_real], axis=1)
        return y_fake, y_real, bv2b(mask_real)

    def d_loss_fn(d_params, d_pack):
        y_fake, y_real, mask_real, real_noise, fake_noise = d_pack
        d_real = discriminator.apply(d_params, y_real + real_noise, mask_real)
        d_fake = discriminator.apply(d_params, y_fake + fake_noise, mask_real)
        loss_real = L.multiscale_lsgan_loss(d_real, 1)
        loss_fake = L.multiscale_lsgan_loss(d_fake, 0)
        return loss_real + loss_fake, (loss_real, loss_fake)

    g_grad = jax.value_and_grad(forward_and_g_loss, has_aux=True)
    d_grad = jax.value_and_grad(d_loss_fn, has_aux=True) \
        if discriminator is not None else None

    def step(state: GanTrainState, batch, key, input_noise_weight=0.0):
        if num_microbatches > 1:
            mb_batch = jax.tree_util.tree_map(
                lambda x: x.reshape(num_microbatches,
                                    x.shape[0] // num_microbatches,
                                    *x.shape[1:]), batch)
            keys = jax.random.split(key, num_microbatches)

            def accumulate(carry, xs):
                acc_grads, acc_loss, acc_dict, acc_d = carry
                mb, k = xs
                (loss, (ld, d_pack)), grads = g_grad(
                    state.params, mb, k, input_noise_weight, state.d_params)
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                acc_dict = {kk: acc_dict[kk] + v for kk, v in ld.items()}
                if discriminator is not None:
                    (d_loss, (ld_real, ld_fake)), dg = d_grad(state.d_params,
                                                              d_pack)
                    acc_d = (
                        jax.tree_util.tree_map(jnp.add, acc_d[0], dg),
                        acc_d[1] + d_loss, acc_d[2] + ld_real,
                        acc_d[3] + ld_fake)
                return (acc_grads, acc_loss + loss, acc_dict, acc_d), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            probe_mb = jax.tree_util.tree_map(lambda x: x[0], mb_batch)
            # Discover the loss-dict keys abstractly — tracing the full
            # forward just for its output structure roughly doubled trace
            # time (ADVICE r2); eval_shape never builds the graph.
            _, (probe_dict, _) = jax.eval_shape(
                forward_and_g_loss, state.params, probe_mb, keys[0],
                input_noise_weight, state.d_params)
            zero_dict = {kk: jnp.zeros(()) for kk in probe_dict}
            zero_d = (jax.tree_util.tree_map(jnp.zeros_like, state.d_params),
                      jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
            (grads, g_loss, loss_dict, acc_d), _ = jax.lax.scan(
                accumulate, (zero_grads, jnp.zeros(()), zero_dict, zero_d),
                (mb_batch, keys))
            grads = jax.tree_util.tree_map(
                lambda g: g / num_microbatches, grads)
            g_loss = g_loss / num_microbatches
            loss_dict = {kk: v / num_microbatches
                         for kk, v in loss_dict.items()}
            d_grads = jax.tree_util.tree_map(
                lambda g: g / num_microbatches, acc_d[0])
            d_scalars = tuple(v / num_microbatches for v in acc_d[1:])
            d_pack = None
        else:
            (g_loss, (loss_dict, d_pack)), grads = g_grad(
                state.params, batch, key, input_noise_weight, state.d_params)
        updates, opt_state = g_optimizer.update(grads, state.opt_state,
                                                state.params)
        params = optax.apply_updates(state.params, updates)

        d_params, d_opt_state = state.d_params, state.d_opt_state
        scalars = {f"loss/generator/{k}": v for k, v in loss_dict.items()}
        scalars["loss/generator/total"] = g_loss
        if discriminator is not None:
            if num_microbatches > 1:
                dg = d_grads
                d_loss, ld_real, ld_fake = d_scalars
            else:
                (d_loss, (ld_real, ld_fake)), dg = d_grad(state.d_params,
                                                          d_pack)
            d_updates, d_opt_state = d_optimizer.update(dg, state.d_opt_state,
                                                        state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)
            scalars["loss/discriminator/real"] = ld_real
            scalars["loss/discriminator/fake"] = ld_fake
            scalars["loss/discriminator/total"] = d_loss

        new_state = GanTrainState(params, opt_state, d_params, d_opt_state,
                                  state.step + 1)
        if state_shardings is not None:
            # Pin the updated state's ZeRO/FSDP layout (see make_train_step).
            new_state = jax.lax.with_sharding_constraint(
                new_state, state_shardings)
        return new_state, scalars

    # jit=False hands back the pure step for embedding inside a larger
    # compiled region (e.g. the unseen-real rig's K-steps-per-dispatch
    # lax.fori_loop over a device-resident replay buffer — dispatching one
    # jitted step per batch leaks ~4 MB of host memory per call on the
    # tunneled TPU backend, which OOM-killed an 80k-step run).
    return jax.jit(step) if jit else step


def init_gan_train_state(params, g_optimizer, d_params=None,
                         d_optimizer=None) -> GanTrainState:
    return GanTrainState(
        params=params,
        opt_state=g_optimizer.init(params),
        d_params=d_params or {},
        d_opt_state=d_optimizer.init(d_params) if d_optimizer else None,
        step=jnp.asarray(0),
    )
