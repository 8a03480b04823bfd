"""Jitted reconstruction training step (data-parallel over a device mesh).

Behavioral reference: ``tools/train/train_reconstruct.py:421-604``
(run_iteration) — the published recipe (train.sh) trains with no
discriminator: generator losses only (depth hard-smooth-L1 top-k + mask BCE
[+ color, + mask beta prior]). The GAN path lives in ``train/gan.py``.

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
                    config: Optional[Dict] = None, num_microbatches: int = 1):
    """Build the jitted training step.

    The returned ``step(state, batch, key, depth_k)`` expects a processed
    batch (see ``recon.utils.process_batch``):
    ``{'in': {image (B,V,3,h,w), depth, mask, camera(B*V)}, 'out_gt': {...}}``.
    ``depth_k`` is the annealed hard-pixel k (static; milestones change it
    between compilations, reference: train_reconstruct.py:424-425).
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
        return TrainState(params, opt_state, state.step + 1), loss, aux

    return jax.jit(step)


def init_train_state(params: Dict[str, Any], optimizer) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.asarray(0))
