"""Misc functional ops (behavioral reference: ``latentfusion/functional.py``)."""
from __future__ import annotations

import jax.numpy as jnp


def normalize(tensor, mean, std):
    """Channel-wise normalize for (B,C,H,W) or (C,H,W) (reference: functional.py:13-27)."""
    mean = jnp.asarray(mean, dtype=jnp.float32)
    std = jnp.asarray(std, dtype=jnp.float32)
    if tensor.ndim == 4:
        mean, std = mean[None, :, None, None], std[None, :, None, None]
    elif tensor.ndim == 3:
        mean, std = mean[:, None, None], std[:, None, None]
    else:
        raise ValueError(f"Unsupported number of dimensions ({tensor.ndim}).")
    return (tensor - mean) / std


def denormalize(tensor, mean, std):
    """(reference: functional.py:30-44)"""
    mean = jnp.asarray(mean, dtype=jnp.float32)
    std = jnp.asarray(std, dtype=jnp.float32)
    if tensor.ndim == 4:
        mean, std = mean[None, :, None, None], std[None, :, None, None]
    elif tensor.ndim == 3:
        mean, std = mean[:, None, None], std[:, None, None]
    else:
        raise ValueError(f"Unsupported number of dimensions ({tensor.ndim}).")
    return tensor * std + mean


def unit_normalize(tensor, axis, eps=1e-3):
    """(reference: functional.py:43-44)"""
    return tensor / (eps + jnp.linalg.norm(tensor, axis=axis, keepdims=True))


def absolute_max_pool(tensor: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Pick the element with the largest magnitude along ``axis``, keepdims
    (reference: functional.py:47-49)."""
    index = jnp.argmax(jnp.abs(tensor), axis=axis, keepdims=True)
    return jnp.take_along_axis(tensor, index, axis=axis)
