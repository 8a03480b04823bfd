"""Video reading/writing.

Behavioral reference: ``latentfusion/videos.py`` (PyAV h264 reader/writer
with moviepy fallback). This rebuild uses imageio-ffmpeg when available and
falls back to an image-sequence writer, so the comparison-video tooling
(tools/poserbpf_comparison.py) works in minimal environments.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Iterator

import numpy as np

logger = logging.getLogger(__name__)


def _to_uint8(frame) -> np.ndarray:
    frame = np.asarray(frame)
    if frame.dtype != np.uint8:
        frame = (np.clip(frame, 0, 1) * 255).astype(np.uint8)
    if frame.ndim == 3 and frame.shape[0] in (1, 3):
        frame = frame.transpose(1, 2, 0)
    if frame.shape[-1] == 1:
        frame = np.repeat(frame, 3, axis=-1)
    return frame


class VideoWriter:
    """h264 writer with image-sequence fallback
    (reference: videos.py writer)."""

    def __init__(self, path, fps: int = 30):
        self.path = Path(path)
        self.fps = fps
        self._writer = None
        self._frames_dir = None
        self._count = 0
        try:
            import imageio.v2 as imageio

            self._writer = imageio.get_writer(str(self.path), fps=fps,
                                              codec="libx264",
                                              macro_block_size=1)
        except Exception as e:
            logger.warning("ffmpeg writer unavailable (%s); writing an "
                           "image sequence", e)
            self._frames_dir = self.path.with_suffix("")
            self._frames_dir.mkdir(parents=True, exist_ok=True)

    def write(self, frame):
        frame = _to_uint8(frame)
        if self._writer is not None:
            self._writer.append_data(frame)
        else:
            import imageio.v2 as imageio

            imageio.imsave(self._frames_dir / f"{self._count:06d}.png", frame)
        self._count += 1

    def close(self):
        if self._writer is not None:
            self._writer.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_video(path) -> Iterator[np.ndarray]:
    """Frame iterator (reference: videos.py reader)."""
    import imageio.v2 as imageio

    reader = imageio.get_reader(str(path))
    try:
        for frame in reader:
            yield np.asarray(frame)
    finally:
        reader.close()


def write_video(path, frames, fps: int = 30):
    with VideoWriter(path, fps=fps) as w:
        for frame in frames:
            w.write(frame)
