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


def extract_features(layers, x, layer_names):
    """Run ``x`` through an ordered ``(name, fn)`` layer sequence and collect
    the activations whose names appear in ``layer_names`` (reference:
    functional.py:4-10 iterates ``module.named_children()``; the functional
    analog takes explicit callables — flax modules expose these via
    ``nn.Module.apply(..., capture_intermediates=...)`` or an explicit list
    like :class:`latentfusion_tpu.modules.vgg.VGG16Features`)."""
    wanted = set(layer_names)
    features = []
    for name, fn in layers:
        x = fn(x)
        if name in wanted:
            features.append(x)
    return features


def absolute_max_pool(tensor: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Pick the element with the largest magnitude along ``axis``, keepdims
    (reference: functional.py:47-49)."""
    index = jnp.argmax(jnp.abs(tensor), axis=axis, keepdims=True)
    return jnp.take_along_axis(tensor, index, axis=axis)
