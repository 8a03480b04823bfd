"""VGG16 feature extractor for the perceptual loss.

Behavioral reference: ``latentfusion/pose/utils.py:20-25`` builds the
perceptual loss from torchvision's pretrained VGG16 ``features`` at layers
[3, 8, 15, 22, 27] with weights [1/32, 1/16, 1/8, 1/4, 1]. This flax module
mirrors torchvision's feature-stack indexing and loads a torchvision VGG16
state_dict directly (torch layout, pure rename) — pretrained weights are an
external asset, exactly as in the reference.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

# torchvision vgg16.features: (layer_index, kind, channels)
VGG16_LAYOUT: Tuple = (
    (0, "conv", 64), (1, "relu", None), (2, "conv", 64), (3, "relu", None),
    (4, "pool", None),
    (5, "conv", 128), (6, "relu", None), (7, "conv", 128), (8, "relu", None),
    (9, "pool", None),
    (10, "conv", 256), (11, "relu", None), (12, "conv", 256),
    (13, "relu", None), (14, "conv", 256), (15, "relu", None),
    (16, "pool", None),
    (17, "conv", 512), (18, "relu", None), (19, "conv", 512),
    (20, "relu", None), (21, "conv", 512), (22, "relu", None),
    (23, "pool", None),
    (24, "conv", 512), (25, "relu", None), (26, "conv", 512),
    (27, "relu", None), (28, "conv", 512), (29, "relu", None),
    (30, "pool", None),
)

DEFAULT_LAYERS = (3, 8, 15, 22, 27)
DEFAULT_LAYER_WEIGHTS = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)


class VGG16Features(nn.Module):
    """Extracts intermediate activations at the given torchvision feature
    indices. Input: (B, 3, H, W) imagenet-normalized."""

    layers: Sequence[int] = DEFAULT_LAYERS

    @nn.compact
    def __call__(self, x):
        outputs = []
        in_ch = 3
        for idx, kind, ch in VGG16_LAYOUT:
            if kind == "conv":
                w = self.param(f"features_{idx}_weight",
                               nn.initializers.he_normal(),
                               (ch, in_ch, 3, 3), jnp.float32)
                b = self.param(f"features_{idx}_bias", nn.initializers.zeros,
                               (ch,), jnp.float32)
                x = lax.conv_general_dilated(
                    x, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"))
                x = x + b.reshape(1, -1, 1, 1)
                in_ch = ch
            elif kind == "relu":
                x = jax.nn.relu(x)
            elif kind == "pool":
                x = lax.reduce_window(x, -jnp.inf, lax.max,
                                      (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
            if idx in self.layers:
                outputs.append(x)
            if idx >= max(self.layers):
                break
        return outputs


def params_from_torchvision_state_dict(state_dict) -> dict:
    """Map torchvision ``vgg16().state_dict()`` to VGG16Features params."""
    import numpy as np

    params = {}
    for key, value in state_dict.items():
        if not key.startswith("features."):
            continue
        _, idx, kind = key.split(".")
        arr = np.asarray(value.detach().cpu().numpy()
                         if hasattr(value, "detach") else value)
        params[f"features_{idx}_{kind}"] = jnp.asarray(arr)
    return {"params": params}


def build_perceptual_loss(vgg_params, layers=DEFAULT_LAYERS,
                          layer_weights=DEFAULT_LAYER_WEIGHTS):
    """(reference: pose/utils.py:20-25 get_perceptual_loss)"""
    from ..losses import PerceptualLoss

    module = VGG16Features(layers=layers)

    def features_fn(x):
        return module.apply(vgg_params, x)

    return PerceptualLoss(features_fn, layer_weights, reduction=None)
