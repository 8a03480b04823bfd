"""Pose diagnostics plots (behavioral reference: ``latentfusion/pose/plotting.py``)."""
from __future__ import annotations

import numpy as np


def plot_stat_history(stat_history: dict, keys=None, cols: int = 3,
                      size: float = 3.0):
    """Plot GradientPoseEstimator stat_history time series
    (reference: pose/plotting.py; notebook cell 23)."""
    from ..visualization import Plot

    if keys is None:
        keys = [k for k, v in stat_history.items()
                if np.asarray(v).ndim <= 2]
    rows = (len(keys) + cols - 1) // cols
    plot = Plot(rows, cols, size)
    for k in keys:
        plot.line(np.asarray(stat_history[k]), title=k)
    return plot.to_array()


def plot_ranking_losses(losses, size: float = 3.0):
    from ..visualization import Plot

    plot = Plot(1, 1, size)
    plot.line(np.sort(np.asarray(losses)), title="ranked hypothesis losses")
    return plot.to_array()


def overlay_mask(color, mask, alpha: float = 0.5, channel: int = 0):
    """Blend a predicted mask over an image for qualitative checks."""
    color = np.asarray(color).astype(np.float32).copy()
    if color.ndim == 3 and color.shape[0] == 3:
        color = color.transpose(1, 2, 0)
    m = np.asarray(mask).astype(np.float32).reshape(*color.shape[:2])
    overlay = color.copy()
    overlay[..., channel] = np.clip(overlay[..., channel] + m, 0, 1)
    return (1 - alpha) * color + alpha * overlay
