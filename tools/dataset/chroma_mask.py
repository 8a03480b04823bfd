#!/usr/bin/env python
"""Generate foreground masks for captures via chroma keying + GrabCut.

Behavioral reference: ``tools/dataset/`` chroma masking utilities +
``latentfusion/imutils.py`` (chroma mask, grabcut, largest component).
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[2]))

from latentfusion_tpu import imutils  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("scene_dir", type=Path,
                        help="capture dir with color/*.jpg")
    parser.add_argument("--hue", type=float, default=120.0,
                        help="chroma key hue (deg); 120 = green screen")
    parser.add_argument("--tol", type=float, default=30.0)
    parser.add_argument("--grabcut", action="store_true")
    parser.add_argument("--out-dirname", default="mask")
    args = parser.parse_args()

    import imageio.v2 as imageio

    color_dir = args.scene_dir / "color"
    out_dir = args.scene_dir / args.out_dirname
    out_dir.mkdir(exist_ok=True)
    for path in sorted(color_dir.glob("*.jpg")):
        image = np.asarray(imageio.imread(path), dtype=np.float32) / 255.0
        mask = imutils.chroma_mask(image, hue=args.hue, tol=args.tol)
        if args.grabcut:
            mask = imutils.grabcut_mask(image, mask)
        mask = imutils.largest_component(mask)
        imageio.imsave(out_dir / f"{path.stem}.png",
                       (mask * 255).astype(np.uint8))
        print(path.stem)


if __name__ == "__main__":
    main()
