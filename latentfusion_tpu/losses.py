"""Loss zoo (behavioral reference: ``latentfusion/losses.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


def reduce_loss(loss, reduction="mean", axis=None):
    """(reference: losses.py:60-72)"""
    if reduction is None:
        return loss
    elif reduction == "mean":
        return loss.mean() if axis is None else loss.mean(axis=axis)
    elif reduction == "sum":
        return loss.sum() if axis is None else loss.sum(axis=axis)
    raise ValueError(f"Unknown reduction {reduction!r}")


def l1_loss(x, y, reduction="mean"):
    return reduce_loss(jnp.abs(x - y), reduction)


def smooth_l1_loss(x, y, reduction="mean", beta: float = 1.0):
    """torch F.smooth_l1_loss semantics."""
    diff = jnp.abs(x - y)
    loss = jnp.where(diff < beta, 0.5 * diff ** 2 / beta, diff - 0.5 * beta)
    return reduce_loss(loss, reduction)


def binary_cross_entropy_loss(pred, target, reduction="mean", eps=1e-12):
    """torch F.binary_cross_entropy on probabilities."""
    pred = jnp.clip(pred, eps, 1 - eps)
    loss = -(target * jnp.log(pred) + (1 - target) * jnp.log(1 - pred))
    return reduce_loss(loss, reduction)


def hard_pixel_loss(base_loss_fn, x, y, k: int, reduction="mean"):
    """Top-k hardest pixels (reference: losses.py:33-57 HardPixelLoss).

    x, y: (B, C, H, W) (higher-rank inputs are folded). ``k`` is static.
    """
    if x.ndim > 4:
        x = x.reshape(-1, *x.shape[-3:])
    if y.ndim > 4:
        y = y.reshape(-1, *y.shape[-3:])
    loss = base_loss_fn(x, y, reduction=None)
    # The reference applies the configured reduction to the channel axis too
    # (losses.py:54: reduce_loss(loss, dim=1, reduction=self.reduction)).
    if reduction == "sum":
        loss = loss.sum(axis=1)
    else:
        loss = loss.mean(axis=1)
    loss = loss.reshape(x.shape[0], -1)
    k = min(k, loss.shape[1])
    loss, _ = jax.lax.top_k(loss, k)
    return reduce_loss(loss, reduction)


def lsgan_loss(input, target, reduction="mean"):
    """(reference: losses.py:75-77)"""
    loss = (input.squeeze() - target) ** 2
    return reduce_loss(loss, reduction=reduction)


def multiscale_lsgan_loss(inputs, target, reduction="mean"):
    """(reference: losses.py:80-85)"""
    loss = 0
    for input in inputs:
        loss += lsgan_loss(input, target, reduction)
    return loss


def _log_beta(alpha, beta):
    return gammaln(alpha) + gammaln(beta) - gammaln(alpha + beta)


def beta_prior_loss(tensor, alpha, beta, reduction="mean", eps=1e-4):
    """Pushes mask values toward {0, 1} (reference: losses.py:88-99)."""
    loss = ((alpha - 1.0) * jnp.log(jnp.clip(tensor, eps))
            + (beta - 1.0) * jnp.log(jnp.clip(1.0 - tensor, eps))
            - _log_beta(alpha, beta))
    loss = jnp.clip(-loss, 0)
    return reduce_loss(loss, reduction=reduction)


class PerceptualLoss:
    """Feature-space L2 (reference: losses.py:7-30). Takes any callable
    ``features_fn(x) -> [feat]`` (e.g. a flax VGG); the reference uses
    torchvision VGG16 features."""

    def __init__(self, features_fn, layer_weights, w_act: float = 0.1,
                 reduction="mean"):
        self.features_fn = features_fn
        self.layer_weights = layer_weights
        self.w_act = w_act
        self.reduction = reduction

    def __call__(self, x1, x2):
        feats1 = self.features_fn(x1)
        feats2 = self.features_fn(x2)
        loss = 0
        for w, f1, f2 in zip(self.layer_weights, feats1, feats2):
            f1 = f1.reshape(f1.shape[0], -1)
            f2 = f2.reshape(f2.shape[0], -1)
            loss += w * jnp.mean((self.w_act * (f1 - f2)) ** 2, axis=1)
        if self.reduction is not None:
            return reduce_loss(loss, self.reduction)
        return loss
