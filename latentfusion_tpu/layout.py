"""Activation-layout policy: torch ``NC*`` (default) vs channels-last ``N*C``.

Parameters always stay in torch layout (``(O, I, *K)`` conv weights) so
checkpoint conversion remains a pure key rename; only the logical layout of
*activations* flowing between modules changes. On TPU, convolutions are
lowered channels-minor and the volume-sampler matmuls contract over the
voxel axis — with torch-layout activations XLA inserts physical transposes
between the two on every forward AND backward. The round-2 trace measured
~2 ms/iter of such copies in the flagship refinement backward
(docs/ARCHITECTURE.md); running the decoder internals channels-last removes
them at the source.

Usage: the :class:`Photographer` (and other opted-in modules) wrap their
internals in :func:`activations_channels_last`; every layout-sensitive
primitive (EqualizedConv, pixel_norm, interpolate, the volume samplers,
concats) consults :func:`channels_last` at trace time. Public module
boundaries keep the reference's ``NC*`` layout either way.
"""
from __future__ import annotations

import contextlib

_CHANNELS_LAST = False

# Which high-level modules run their internals channels-last. "auto"
# resolves to channels-last on TPU (where the layout win is measured) and
# torch layout elsewhere (CPU XLA favors the torch-order loops it was
# traced for; see bench.py --layout A/B).
_DECODE_MODE = "auto"


def channels_last() -> bool:
    """Are activations currently channels-last? (trace-time policy)"""
    return _CHANNELS_LAST


@contextlib.contextmanager
def activations_channels_last(enabled: bool = True):
    global _CHANNELS_LAST
    prev = _CHANNELS_LAST
    _CHANNELS_LAST = enabled
    try:
        yield
    finally:
        _CHANNELS_LAST = prev


def channel_axis() -> int:
    """Axis of the channel dim in the current layout."""
    return -1 if _CHANNELS_LAST else 1


def set_decode_layout(mode: str) -> None:
    """Select the decoder-internal layout: 'auto' | 'channels_last' |
    'torch' | 'hybrid'. ('auto' = hybrid on TPU.)

    'hybrid' keeps the 3D stage (volume convs + sampler matmuls)
    channels-last but runs the 2D image U-Nets and 1x1 heads in torch
    layout: at 128-256^2 spatial sizes with 48-256 channels XLA prefers
    spatial-minor tilings, and forcing NHWC there costs per-iteration
    relayout copies plus 1/128-lane unit-channel head outputs (profiled,
    docs/ARCHITECTURE.md). As a bonus the factor depth collapse
    (N,C,D,H,W)->(N,C*D,H,W) becomes a free bitcast in torch layout.
    """
    global _DECODE_MODE
    if mode not in ("auto", "channels_last", "torch", "hybrid"):
        raise ValueError(mode)
    _DECODE_MODE = mode


def get_decode_layout() -> str:
    return _DECODE_MODE


def decode_channels_last() -> bool:
    """Resolved 3D-stage layout choice."""
    if _DECODE_MODE == "auto":
        import jax

        return jax.default_backend() == "tpu"
    return _DECODE_MODE in ("channels_last", "hybrid")


def image2d_channels_last() -> bool:
    """Resolved 2D-stage (image U-Net + heads) layout choice."""
    if _DECODE_MODE == "hybrid":
        return False
    return decode_channels_last()


def to_channels_last(x):
    """(N, C, *S) -> (N, *S, C)."""
    return x.transpose(0, *range(2, x.ndim), 1)


def from_channels_last(x):
    """(N, *S, C) -> (N, C, *S)."""
    return x.transpose(0, x.ndim - 1, *range(1, x.ndim - 1))
