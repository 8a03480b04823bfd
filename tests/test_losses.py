"""Loss zoo parity vs torch."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from latentfusion_tpu import losses as L


def test_smooth_l1_matches_torch(rng):
    x = rng.randn(4, 8).astype(np.float32)
    y = rng.randn(4, 8).astype(np.float32)
    ours = float(L.smooth_l1_loss(jnp.asarray(x), jnp.asarray(y)))
    theirs = float(F.smooth_l1_loss(torch.from_numpy(x), torch.from_numpy(y)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_bce_matches_torch(rng):
    p = rng.rand(4, 8).astype(np.float32)
    t = (rng.rand(4, 8) > 0.5).astype(np.float32)
    ours = float(L.binary_cross_entropy_loss(jnp.asarray(p), jnp.asarray(t)))
    theirs = float(F.binary_cross_entropy(torch.from_numpy(p),
                                          torch.from_numpy(t)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_hard_pixel_loss_topk(rng):
    """Top-k hardest pixels (reference: losses.py:33-57)."""
    x = rng.randn(2, 1, 8, 8).astype(np.float32)
    y = rng.randn(2, 1, 8, 8).astype(np.float32)
    k = 10
    ours = float(L.hard_pixel_loss(L.l1_loss, jnp.asarray(x), jnp.asarray(y),
                                   k))
    per_pixel = np.abs(x - y).mean(axis=1).reshape(2, -1)
    topk = np.sort(per_pixel, axis=1)[:, -k:]
    np.testing.assert_allclose(ours, topk.mean(), rtol=1e-5)


def test_beta_prior_loss_matches_reference_formula(rng):
    """(reference: losses.py:88-99)"""
    x = rng.rand(4, 4).astype(np.float32)
    alpha = beta = 0.01
    ours = float(L.beta_prior_loss(jnp.asarray(x), alpha, beta))

    t = torch.from_numpy(x)
    eps = 1e-4
    log_beta = (torch.lgamma(torch.tensor(alpha))
                + torch.lgamma(torch.tensor(beta))
                - torch.lgamma(torch.tensor(alpha + beta)))
    loss = ((alpha - 1.0) * torch.log(t.clamp(min=eps))
            + (beta - 1.0) * torch.log((1.0 - t).clamp(min=eps)) - log_beta)
    theirs = float((-loss).clamp(min=0).mean())
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_lsgan_losses(rng):
    x = rng.randn(4, 1, 5, 5).astype(np.float32)
    ours = float(L.lsgan_loss(jnp.asarray(x), 1))
    theirs = float(((torch.from_numpy(x).squeeze() - 1) ** 2).mean())
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)
    multi = float(L.multiscale_lsgan_loss(
        [jnp.asarray(x), jnp.asarray(x)], 0))
    np.testing.assert_allclose(multi, 2 * float((torch.from_numpy(x) ** 2
                                                 ).mean()), rtol=1e-5)
