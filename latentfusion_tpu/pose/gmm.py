"""On-device diagonal-covariance Gaussian mixture (weighted EM).

The reference CEM estimator round-trips to CPU sklearn every iteration
(reference: estimation.py:429-473). Here the GMM fit, blend, and sampling are
fixed-shape jnp so the entire CEM loop stays jitted on-device. Elite
selection feeds EM through per-sample weights (masking), which also handles
the reference's annealed elite counts without dynamic shapes.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiagGMM(NamedTuple):
    weights: jnp.ndarray      # (C,)
    means: jnp.ndarray        # (C, D)
    covariances: jnp.ndarray  # (C, D) diagonal


def _log_prob(gmm: DiagGMM, x: jnp.ndarray) -> jnp.ndarray:
    """Per-component log densities, (N, C)."""
    diff = x[:, None, :] - gmm.means[None]            # (N, C, D)
    inv = 1.0 / gmm.covariances                        # (C, D)
    quad = (diff ** 2 * inv[None]).sum(-1)             # (N, C)
    logdet = jnp.log(gmm.covariances).sum(-1)          # (C,)
    d = x.shape[-1]
    return -0.5 * (quad + logdet[None] + d * math.log(2 * math.pi))


def fit(key, data: jnp.ndarray, n_components: int,
        sample_weights: jnp.ndarray = None, n_iter: int = 25,
        reg_covar: float = 1e-5) -> DiagGMM:
    """Weighted EM fit (sklearn ``GaussianMixture(covariance_type='diag',
    reg_covar=1e-5)`` analog; reference: estimation.py:449-464).

    ``sample_weights`` masks/weights data points (elite selection).
    """
    n, d = data.shape
    if sample_weights is None:
        sample_weights = jnp.ones((n,))
    sw = sample_weights / jnp.maximum(sample_weights.sum(), 1e-12)

    # Init: means at weighted-random data points; shared weighted variance.
    idx = jax.random.choice(key, n, (n_components,), replace=False
                            if n >= n_components else True, p=sw)
    mu0 = data[idx]
    mean_all = (sw[:, None] * data).sum(0)
    var_all = (sw[:, None] * (data - mean_all) ** 2).sum(0) + reg_covar
    gmm0 = DiagGMM(jnp.full((n_components,), 1.0 / n_components), mu0,
                   jnp.broadcast_to(var_all[None], (n_components, d)))

    def em_step(gmm, _):
        logp = _log_prob(gmm, data) + jnp.log(
            jnp.maximum(gmm.weights, 1e-12))[None]
        resp = jax.nn.softmax(logp, axis=1) * sw[:, None]      # (N, C)
        nk = jnp.maximum(resp.sum(0), 1e-12)                   # (C,)
        means = (resp.T @ data) / nk[:, None]
        diff2 = (data[:, None, :] - means[None]) ** 2          # (N, C, D)
        cov = (resp[:, :, None] * diff2).sum(0) / nk[:, None] + reg_covar
        weights = nk / nk.sum()
        return DiagGMM(weights, means, cov), None

    gmm, _ = jax.lax.scan(em_step, gmm0, None, length=n_iter)
    return gmm


def blend(old: DiagGMM, new: DiagGMM, alpha: float) -> DiagGMM:
    """Weighted union of components (reference: estimation.py:449-473)."""
    return DiagGMM(
        jnp.concatenate([(1.0 - alpha) * old.weights, alpha * new.weights]),
        jnp.concatenate([old.means, new.means]),
        jnp.concatenate([old.covariances, new.covariances]),
    )


def pad_components(gmm: DiagGMM, n_components: int) -> DiagGMM:
    """Pad with zero-weight components so blended/unblended GMMs share a
    static shape inside jit loops."""
    c, d = gmm.means.shape
    if c >= n_components:
        return gmm
    pad = n_components - c
    return DiagGMM(
        jnp.concatenate([gmm.weights, jnp.zeros((pad,))]),
        jnp.concatenate([gmm.means, jnp.zeros((pad, d))]),
        jnp.concatenate([gmm.covariances, jnp.ones((pad, d))]),
    )


def sample(key, gmm: DiagGMM, n: int) -> jnp.ndarray:
    """Draw n samples, (n, D)."""
    k1, k2 = jax.random.split(key)
    comp = jax.random.categorical(
        k1, jnp.log(jnp.maximum(gmm.weights, 1e-30)), shape=(n,))
    eps = jax.random.normal(k2, (n, gmm.means.shape[-1]))
    return gmm.means[comp] + eps * jnp.sqrt(gmm.covariances[comp])
