#!/usr/bin/env python
"""Resize texture/background images for fast data-worker loading.

Behavioral reference: ``tools/dataset/`` texture resize utility.
"""
import argparse
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("in_dir", type=Path)
    parser.add_argument("out_dir", type=Path)
    parser.add_argument("--size", type=int, default=640,
                        help="max edge length")
    parser.add_argument("--ext", default=".jpg")
    args = parser.parse_args()

    import cv2
    import imageio.v2 as imageio
    import numpy as np

    paths = sorted(args.in_dir.glob(f"**/*{args.ext}"))
    args.out_dir.mkdir(parents=True, exist_ok=True)
    index = []
    for i, path in enumerate(paths):
        try:
            img = np.asarray(imageio.imread(path))
        except Exception:
            continue
        if img.ndim != 3:
            continue
        h, w = img.shape[:2]
        scale = args.size / max(h, w)
        if scale < 1.0:
            img = cv2.resize(img, (int(w * scale), int(h * scale)))
        rel = path.relative_to(args.in_dir)
        out_path = (args.out_dir / rel).with_suffix(args.ext)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        imageio.imsave(out_path, img[..., :3])
        index.append(str(rel))
        if (i + 1) % 1000 == 0:
            print(f"{i + 1} / {len(paths)}")
    with open(args.out_dir / "paths.txt", "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(index)} images")


if __name__ == "__main__":
    main()
