"""Mask corruption augmentations for robustness training.

Behavioral reference: ``latentfusion/augment/masks.py`` (uois/DexNet-derived).
These train the network to tolerate bad segmentation masks (the MOPED noisy-
mask benchmark config). Host-side numpy/cv2 (runs in data workers).

The three transforms used by the shipped pipeline
(reference: datasets/training/pyrender.py:177-184):
RandomAdd (p=0.15), RandomCut (p=0.05), RandomEllipses (p=0.2); the
morphology/translate/rotate variants are provided for completeness.
"""
from __future__ import annotations

import random
from abc import ABC, abstractmethod

import numpy as np


def mask_to_tight_box(mask: np.ndarray):
    """(x_min, y_min, x_max, y_max) of the nonzero region."""
    ys, xs = np.nonzero(mask)
    return xs.min(), ys.min(), xs.max(), ys.max()


class MaskTransform(ABC):
    def __init__(self, p: float = 1.0):
        self.p = p

    def __call__(self, mask):
        is_np = isinstance(mask, np.ndarray)
        m = np.asarray(mask).astype(bool)
        squeeze = m.ndim == 3 and m.shape[0] == 1
        if squeeze:
            m = m[0]
        if random.random() < self.p and m.any():
            m = self.apply(m)
        if squeeze:
            m = m[None]
        return m if is_np else m

    @abstractmethod
    def apply(self, mask: np.ndarray) -> np.ndarray:
        ...


class RandomMorphologicalTransform(MaskTransform):
    """Random erosion/dilation with a random elliptical kernel."""

    def __init__(self, p=1.0, max_kernel: int = 11):
        super().__init__(p)
        self.max_kernel = max_kernel

    def apply(self, mask):
        import cv2

        k = random.randrange(3, self.max_kernel, 2)
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
        op = random.choice([cv2.MORPH_ERODE, cv2.MORPH_DILATE,
                            cv2.MORPH_OPEN, cv2.MORPH_CLOSE])
        out = cv2.morphologyEx(mask.astype(np.uint8), op, kernel)
        return out.astype(bool) if out.any() else mask


class RandomTranslation(MaskTransform):
    """Translate the mask by a fraction of its extent."""

    def __init__(self, p=1.0, max_frac: float = 0.25):
        super().__init__(p)
        self.max_frac = max_frac

    def apply(self, mask):
        x0, y0, x1, y1 = mask_to_tight_box(mask)
        tx = int(random.uniform(-self.max_frac, self.max_frac) * (x1 - x0 + 1))
        ty = int(random.uniform(-self.max_frac, self.max_frac) * (y1 - y0 + 1))
        out = np.roll(np.roll(mask, ty, axis=0), tx, axis=1)
        return out


class RandomRotation(MaskTransform):
    """Rotate the mask about its centroid."""

    def __init__(self, p=1.0, max_deg: float = 20.0):
        super().__init__(p)
        self.max_deg = max_deg

    def apply(self, mask):
        import cv2

        h, w = mask.shape
        x0, y0, x1, y1 = mask_to_tight_box(mask)
        center = ((x0 + x1) / 2.0, (y0 + y1) / 2.0)
        angle = random.uniform(-self.max_deg, self.max_deg)
        M = cv2.getRotationMatrix2D(center, angle, 1.0)
        out = cv2.warpAffine(mask.astype(np.uint8), M, (w, h),
                             flags=cv2.INTER_NEAREST)
        return out.astype(bool) if out.any() else mask


class RandomEllipses(MaskTransform):
    """Add and remove random ellipses around the mask region."""

    def __init__(self, p=1.0, num_range=(1, 4), radius_frac=(0.05, 0.3)):
        super().__init__(p)
        self.num_range = num_range
        self.radius_frac = radius_frac

    def apply(self, mask):
        import cv2

        out = mask.astype(np.uint8)
        x0, y0, x1, y1 = mask_to_tight_box(mask)
        extent = max(x1 - x0 + 1, y1 - y0 + 1)
        ys, xs = np.nonzero(mask)
        for _ in range(random.randint(*self.num_range)):
            i = random.randrange(len(xs))
            cx, cy = int(xs[i]), int(ys[i])
            ax = max(1, int(random.uniform(*self.radius_frac) * extent))
            ay = max(1, int(random.uniform(*self.radius_frac) * extent))
            angle = random.uniform(0, 180)
            value = random.choice([0, 1])
            cv2.ellipse(out, (cx, cy), (ax, ay), angle, 0, 360, value, -1)
        return out.astype(bool) if out.any() else mask


class RandomAdd(MaskTransform):
    """Paste a shifted copy of the mask onto itself (false positives)."""

    def __init__(self, p=1.0, max_frac: float = 0.5):
        super().__init__(p)
        self.max_frac = max_frac

    def apply(self, mask):
        x0, y0, x1, y1 = mask_to_tight_box(mask)
        tx = int(random.uniform(0.1, self.max_frac) * (x1 - x0 + 1)
                 * random.choice([-1, 1]))
        ty = int(random.uniform(0.1, self.max_frac) * (y1 - y0 + 1)
                 * random.choice([-1, 1]))
        shifted = np.roll(np.roll(mask, ty, axis=0), tx, axis=1)
        return mask | shifted


class RandomCut(MaskTransform):
    """Cut a rectangle from one edge of the mask bbox (occlusion)."""

    def __init__(self, p=1.0, max_frac: float = 0.4):
        super().__init__(p)
        self.max_frac = max_frac

    def apply(self, mask):
        x0, y0, x1, y1 = mask_to_tight_box(mask)
        out = mask.copy()
        side = random.randrange(4)
        fx = random.uniform(0.1, self.max_frac)
        w = x1 - x0 + 1
        h = y1 - y0 + 1
        if side == 0:  # left
            out[:, x0:x0 + int(fx * w)] = False
        elif side == 1:  # right
            out[:, x1 - int(fx * w):x1 + 1] = False
        elif side == 2:  # top
            out[y0:y0 + int(fx * h), :] = False
        else:  # bottom
            out[y1 - int(fx * h):y1 + 1, :] = False
        return out if out.any() else mask


class Compose:
    """Apply a list of mask transforms in order. A class (not a closure) so
    datasets holding one stay picklable for spawn-start loader workers."""

    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, mask):
        for t in self.transforms:
            mask = t(mask)
        return mask


def default_mask_corruption():
    """The shipped pipeline's mask-noise chain
    (reference: pyrender.py:177-184)."""
    return Compose([RandomAdd(p=0.15), RandomCut(p=0.05),
                    RandomEllipses(p=0.2)])
