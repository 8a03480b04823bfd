"""Visualization helpers: tensor/depth colorization, image grids.

Behavioral reference: ``latentfusion/visualization.py`` (312 LoC). Host-side
numpy/matplotlib; used by the trainer's image logging and the example
scripts.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


def _to_numpy(x):
    return np.asarray(x)


def colorize_tensor(value, vmin=None, vmax=None, cmap: str = "viridis"):
    """Map a (B, 1, H, W) or (B, H, W) tensor to RGB with a colormap
    (reference: visualization.py colorize_tensor)."""
    import matplotlib.cm as cm

    value = _to_numpy(value).astype(np.float32)
    if value.ndim == 4 and value.shape[1] == 1:
        value = value[:, 0]
    elif value.ndim == 5:
        value = value.reshape(-1, *value.shape[-2:])
    vmin = value.min() if vmin is None else vmin
    vmax = value.max() if vmax is None else vmax
    normed = (value - vmin) / max(vmax - vmin, 1e-12)
    mapper = cm.get_cmap(cmap)
    colored = mapper(np.clip(normed, 0, 1))[..., :3]  # (B, H, W, 3)
    return colored.transpose(0, 3, 1, 2).astype(np.float32)


def colorize_depth(depth, **kwargs):
    """Depth maps with invalid (<= 0 or min) pixels black
    (reference: visualization.py colorize_depth)."""
    depth = _to_numpy(depth).astype(np.float32)
    if depth.ndim == 5:
        depth = depth.reshape(-1, *depth.shape[-3:])
    mask = depth > depth.min()
    colored = colorize_tensor(depth, **kwargs)
    if depth.ndim == 4 and depth.shape[1] == 1:
        mask = mask[:, 0]
    return colored * mask[:, None].astype(np.float32)


def make_grid(image_groups: List, row_size: int = 8, stride: int = 1,
              output_size: Optional[int] = None, pad: int = 2):
    """Stack groups of (B, C, H, W) images into one grid image
    (reference: visualization.py make_grid; each group is a row band)."""
    import cv2

    rows = []
    for group in image_groups:
        if group is None:
            continue
        imgs = _to_numpy(group).astype(np.float32)
        if imgs.ndim == 5:
            imgs = imgs.reshape(-1, *imgs.shape[-3:])
        if imgs.ndim == 3:
            imgs = imgs[:, None]
        if imgs.shape[1] == 1:
            imgs = np.repeat(imgs, 3, axis=1)
        imgs = imgs[::stride][:row_size]
        if output_size is not None:
            imgs = np.stack([
                cv2.resize(im.transpose(1, 2, 0), (output_size, output_size)
                           ).transpose(2, 0, 1)
                for im in imgs
            ])
        b, c, h, w = imgs.shape
        padded = np.zeros((b, c, h + pad, w + pad), np.float32)
        padded[:, :, :h, :w] = imgs
        rows.append(np.concatenate(list(padded), axis=-1))
    if not rows:
        return np.zeros((3, 8, 8), np.float32)
    width = max(r.shape[-1] for r in rows)
    rows = [np.pad(r, ((0, 0), (0, 0), (0, width - r.shape[-1])))
            for r in rows]
    return np.clip(np.concatenate(rows, axis=-2), 0, 1)


def plot_to_array(fig):
    """Render a matplotlib figure to an (H, W, 3) array
    (reference: visualization.py plot-to-array)."""
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    return buf.copy()


class Plot:
    """Small matplotlib figure builder (reference: visualization.py Plot)."""

    def __init__(self, rows: int = 1, cols: int = 1, size: float = 3.0):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        self.fig, self.axes = plt.subplots(rows, cols,
                                           figsize=(cols * size, rows * size),
                                           squeeze=False)
        self._idx = 0

    def _next_ax(self):
        ax = self.axes.flat[self._idx]
        self._idx += 1
        return ax

    def image(self, image, title: str = ""):
        ax = self._next_ax()
        img = _to_numpy(image)
        if img.ndim == 3 and img.shape[0] in (1, 3):
            img = img.transpose(1, 2, 0)
        if img.ndim == 3 and img.shape[-1] == 1:
            img = img[..., 0]
        ax.imshow(np.clip(img, 0, 1) if img.ndim == 3 else img)
        ax.set_title(title)
        ax.axis("off")
        return self

    def line(self, ys, title: str = ""):
        ax = self._next_ax()
        ax.plot(_to_numpy(ys))
        ax.set_title(title)
        return self

    def to_array(self):
        import matplotlib.pyplot as plt

        self.fig.tight_layout()
        arr = plot_to_array(self.fig)
        plt.close(self.fig)
        return arr


def plot_grid(images, titles=None, cols: int = 4, size: float = 3.0):
    """(reference: visualization.py plot_grid)"""
    images = list(images)
    rows = (len(images) + cols - 1) // cols
    plot = Plot(rows, cols, size)
    for i, img in enumerate(images):
        plot.image(img, titles[i] if titles else "")
    return plot.to_array()
