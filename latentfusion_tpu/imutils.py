"""Image/mask utilities (behavioral reference: ``latentfusion/imutils.py``).

Morphology is implemented with ``lax.reduce_window`` so it is jit-safe and
runs on-device (the reference shells out to cv2/skimage on CPU); host-only
helpers (grabcut, connected components) use cv2.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax


def _morph(mask, kernel_size: int, op: str):
    """Square-kernel morphological max/min over (..., H, W)."""
    orig_shape = mask.shape
    x = mask.reshape(-1, *orig_shape[-2:])
    pad = kernel_size // 2
    if op == "dilate":
        init, fn = -jnp.inf, lax.max
    else:
        init, fn = jnp.inf, lax.min
    out = lax.reduce_window(
        x, init, fn,
        window_dimensions=(1, kernel_size, kernel_size),
        window_strides=(1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad)),
    )
    return out.reshape(orig_shape)


def dilate(mask, iterations: int = 1, kernel_size: int = 3):
    """(reference: imutils.py dilate via cv2)"""
    for _ in range(iterations):
        mask = _morph(mask, kernel_size, "dilate")
    return mask


def erode(mask, iterations: int = 1, kernel_size: int = 3):
    for _ in range(iterations):
        mask = _morph(mask, kernel_size, "erode")
    return mask


def disk_kernel(radius: int) -> np.ndarray:
    """Disk structuring element matching skimage.morphology.disk."""
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (np.abs(x) + np.abs(y) <= radius).astype(np.float32) if radius == 1 \
        else ((x ** 2 + y ** 2) <= radius ** 2).astype(np.float32)


def erode_disk(mask, radius: int):
    """Binary erosion with a disk structuring element
    (used by pose initialization; reference: pose/initialization.py:35-42)."""
    kernel = jnp.asarray(disk_kernel(radius))
    ksum = kernel.sum()
    orig_shape = mask.shape
    x = mask.reshape(-1, 1, *orig_shape[-2:]).astype(jnp.float32)
    k = kernel[None, None]
    hits = lax.conv_general_dilated(
        x, k, window_strides=(1, 1),
        padding=[(radius, radius), (radius, radius)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    out = (hits >= ksum - 1e-3).astype(jnp.float32)
    return out.reshape(orig_shape)


def mean_color(color, mask, eps: float = 1e-6):
    """Mean color over the mask, per batch item -> (B, 3)."""
    m = mask
    num = (color * m).sum(axis=(-2, -1))
    den = jnp.maximum(m.sum(axis=(-2, -1)), eps)
    return num / den


def largest_component(mask: np.ndarray) -> np.ndarray:
    """Keep the largest connected component (host-side, cv2)."""
    import cv2

    mask_u8 = (np.asarray(mask) > 0).astype(np.uint8)
    num, labels, stats, _ = cv2.connectedComponentsWithStats(mask_u8)
    if num <= 1:
        return mask_u8.astype(bool)
    largest = 1 + np.argmax(stats[1:, cv2.CC_STAT_AREA])
    return labels == largest


def chroma_mask(image: np.ndarray, hue: float = 120.0, tol: float = 30.0
                ) -> np.ndarray:
    """Chroma-key foreground mask (host-side, cv2). image: (H, W, 3) in [0,1]."""
    import cv2

    hsv = cv2.cvtColor((np.asarray(image) * 255).astype(np.uint8),
                       cv2.COLOR_RGB2HSV)
    h = hsv[..., 0].astype(np.float32) * 2.0  # OpenCV hue in [0,180]
    keyed = (np.abs(h - hue) < tol) & (hsv[..., 1] > 60)
    return ~keyed


def grabcut_mask(image: np.ndarray, seed_mask: np.ndarray,
                 iterations: int = 5) -> np.ndarray:
    """GrabCut refinement of a coarse mask (host-side, cv2)."""
    import cv2

    img = (np.asarray(image) * 255).astype(np.uint8)
    gc_mask = np.where(np.asarray(seed_mask) > 0, cv2.GC_PR_FGD,
                       cv2.GC_PR_BGD).astype(np.uint8)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    cv2.grabCut(img, gc_mask, None, bgd, fgd, iterations,
                cv2.GC_INIT_WITH_MASK)
    return (gc_mask == cv2.GC_FGD) | (gc_mask == cv2.GC_PR_FGD)
