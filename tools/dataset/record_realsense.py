#!/usr/bin/env python
"""Realsense capture recorder (hardware tool).

Behavioral reference: ``tools/dataset/`` realsense recorder (298 LoC,
librealsense-based). Records aligned color/depth streams + intrinsics.json
in the layout consumed by ``latentfusion_tpu.data.realsense``.

Requires ``pyrealsense2`` (not part of the TPU image); the capture layout is:

    scene/
      color/NNNNNN.jpg       depth/NNNNNN.png (mm, uint16)
      intrinsics.json        (open3d column-major intrinsic_matrix)
"""
import argparse
import json
import sys
import time
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir", type=Path)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--fps", type=int, default=30)
    parser.add_argument("--seconds", type=float, default=30.0)
    args = parser.parse_args()

    try:
        import pyrealsense2 as rs
    except ImportError:
        print("pyrealsense2 is required for capture (not available in the "
              "TPU image). Captures recorded elsewhere load via "
              "latentfusion_tpu.data.realsense.RealsenseDataset.",
              file=sys.stderr)
        sys.exit(2)

    import imageio.v2 as imageio
    import numpy as np

    (args.out_dir / "color").mkdir(parents=True, exist_ok=True)
    (args.out_dir / "depth").mkdir(parents=True, exist_ok=True)

    pipeline = rs.pipeline()
    config = rs.config()
    config.enable_stream(rs.stream.depth, args.width, args.height,
                         rs.format.z16, args.fps)
    config.enable_stream(rs.stream.color, args.width, args.height,
                         rs.format.rgb8, args.fps)
    profile = pipeline.start(config)
    align = rs.align(rs.stream.color)

    intr = (profile.get_stream(rs.stream.color)
            .as_video_stream_profile().get_intrinsics())
    with open(args.out_dir / "intrinsics.json", "w") as f:
        json.dump({
            "width": intr.width, "height": intr.height,
            # open3d convention: column-major
            "intrinsic_matrix": [intr.fx, 0, 0, 0, intr.fy, 0,
                                 intr.ppx, intr.ppy, 1],
        }, f, indent=2)

    start = time.time()
    i = 0
    try:
        while time.time() - start < args.seconds:
            frames = align.process(pipeline.wait_for_frames())
            depth = np.asanyarray(frames.get_depth_frame().get_data())
            color = np.asanyarray(frames.get_color_frame().get_data())
            imageio.imsave(args.out_dir / "color" / f"{i:06d}.jpg", color)
            imageio.imsave(args.out_dir / "depth" / f"{i:06d}.png",
                           depth.astype(np.uint16))
            i += 1
    finally:
        pipeline.stop()
    print(f"recorded {i} frames")


if __name__ == "__main__":
    main()
