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


# ---------------------------------------------------------------- host-side
# Noise / blur augmentations for data workers (numpy; behavioral reference:
# augment/__init__.py:143-214).

def add_noise(image, level: float = 0.1):
    """Additive gaussian noise with random per-call level in [0, level]."""
    import random

    import numpy as np

    std = random.uniform(0, level)
    out = np.asarray(image, dtype=np.float32)
    return np.clip(out + np.random.randn(*out.shape).astype(np.float32) * std,
                   0.0, 1.0)


def add_depth_noise(depth, level: float = 0.1):
    """Multiplicative-free gaussian depth noise applied to valid pixels."""
    import random

    import numpy as np

    std = random.uniform(0, level)
    out = np.asarray(depth, dtype=np.float32).copy()
    valid = out > 0
    out[valid] += np.random.randn(int(valid.sum())).astype(np.float32) * std
    return out


def motion_blur(image, max_kernel: int = 9):
    """Random directional motion blur (cv2)."""
    import random

    import cv2
    import numpy as np

    k = random.randrange(3, max_kernel, 2)
    kernel = np.zeros((k, k), dtype=np.float32)
    kernel[k // 2, :] = 1.0 / k
    angle = random.uniform(0, 360)
    M = cv2.getRotationMatrix2D((k / 2 - 0.5, k / 2 - 0.5), angle, 1.0)
    kernel = cv2.warpAffine(kernel, M, (k, k))
    s = kernel.sum()
    if s > 0:
        kernel /= s
    hwc = np.asarray(image, dtype=np.float32)
    return cv2.filter2D(hwc, -1, kernel)


def color_jitter(image, brightness=0.1, contrast=0.1, saturation=0.05,
                 hue=0.05):
    """Random color jitter on an (H, W, 3) float image in [0, 1] (cv2)."""
    import random

    import cv2
    import numpy as np

    img = np.asarray(image, dtype=np.float32)
    b = 1.0 + random.uniform(-brightness, brightness)
    c = 1.0 + random.uniform(-contrast, contrast)
    mean = img.mean()
    img = np.clip((img * b - mean) * c + mean, 0, 1)
    hsv = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2HSV
                       ).astype(np.float32)
    hsv[..., 1] *= 1.0 + random.uniform(-saturation, saturation)
    hsv[..., 0] = (hsv[..., 0] + random.uniform(-hue, hue) * 180) % 180
    hsv = np.clip(hsv, 0, [179, 255, 255]).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.float32) / 255.0


from . import masks, tensors  # noqa: F401,E402
