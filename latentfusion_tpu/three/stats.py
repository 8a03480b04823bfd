"""Robust statistics (MAD outlier rejection).

Behavioral reference: ``latentfusion/three/stats.py``. The ``reject_*``
variants return boolean masks plus masked arrays rather than ragged arrays so
they remain jit-compatible; ``robust_mean*`` compute the same scalar as the
reference via masked means.
"""
from __future__ import annotations

import jax.numpy as jnp


def mad(tensor: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Median absolute deviation (reference: stats.py:4-6)."""
    median = jnp.median(tensor, axis=axis)
    return jnp.median(jnp.abs(tensor - median), axis=axis)


def mask_outliers_mad(data: jnp.ndarray, m: float = 2.0) -> jnp.ndarray:
    """(reference: stats.py:9-13)"""
    median = jnp.median(data)
    _mad = jnp.median(jnp.abs(data - median))
    return jnp.abs(data - median) / _mad < m


def mask_outliers(data: jnp.ndarray, m: float = 2.0) -> jnp.ndarray:
    """(reference: stats.py:20-24)"""
    mean = data.mean()
    std = jnp.std(data, ddof=1)
    return jnp.abs(data - mean) / std < m


def robust_mean(data: jnp.ndarray, m: float = 2.0) -> jnp.ndarray:
    """Mean of std-inliers (reference: stats.py:31-32)."""
    mask = mask_outliers(data, m)
    return jnp.sum(data * mask) / jnp.maximum(jnp.sum(mask), 1)


def robust_mean_mad(data: jnp.ndarray, m: float = 2.0) -> jnp.ndarray:
    """Mean of MAD-inliers (reference: stats.py:35-36)."""
    mask = mask_outliers_mad(data, m)
    return jnp.sum(data * mask) / jnp.maximum(jnp.sum(mask), 1)
