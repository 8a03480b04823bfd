"""Normalization + augmentation utilities
(behavioral reference: ``latentfusion/augment/__init__.py``)."""
from __future__ import annotations

import jax.numpy as jnp

from .. import functional

IMAGENET_MEAN = [0.485, 0.456, 0.406]
IMAGENET_STD = [0.229, 0.224, 0.225]


def gan_normalize(tensor):
    """[0,1] -> [-1,1] (reference: augment/__init__.py:58-59)."""
    return tensor * 2.0 - 1.0


def gan_denormalize(tensor):
    """[-1,1] -> clamped [0,1] (reference: augment/__init__.py:62-63)."""
    return jnp.clip((tensor + 1.0) / 2.0, 0, 1)


def imagenet_normalize(tensor):
    return functional.normalize(tensor, IMAGENET_MEAN, IMAGENET_STD)


def imagenet_denormalize(tensor):
    return jnp.clip(
        functional.denormalize(tensor, IMAGENET_MEAN, IMAGENET_STD), 0, 1)
