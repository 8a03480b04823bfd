#!/usr/bin/env python
"""Normalize ShapeNet meshes for training.

Behavioral reference: ``tools/dataset/preprocess_shapenet.py`` (which runs
inside ``blender -P`` to re-export meshes). This rebuild needs no Blender:
meshes are loaded with the in-repo OBJ loader, recentered, normalized to
unit diameter, and re-exported as plain OBJ; a ``paths.txt`` index is
written for fast dataset startup.
"""
import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("preprocess_shapenet")


def export_obj(path, vertices, faces):
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in faces + 1:
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("in_dir", type=Path)
    parser.add_argument("out_dir", type=Path)
    parser.add_argument("--pattern", default="**/model_normalized.obj")
    parser.add_argument("--size", type=float, default=1.0)
    parser.add_argument("--max-bytes", type=float, default=2e7)
    args = parser.parse_args()

    from latentfusion_tpu import meshutils

    paths = sorted(args.in_dir.glob(args.pattern))
    logger.info("found %d meshes", len(paths))
    index = []
    for i, path in enumerate(paths):
        if path.stat().st_size > args.max_bytes:
            logger.warning("skipping oversized %s", path)
            continue
        try:
            obj = meshutils.Object3D(path)
            obj.recenter("bounds")
            obj.resize(args.size, ref="diameter")
        except Exception as e:
            logger.error("failed %s: %s", path, e)
            continue
        rel = path.relative_to(args.in_dir).with_suffix(".obj")
        out_path = args.out_dir / rel
        out_path.parent.mkdir(parents=True, exist_ok=True)
        mesh = obj.meshes[0]
        export_obj(out_path, mesh.vertices, mesh.faces)
        index.append(str(rel))
        if (i + 1) % 500 == 0:
            logger.info("%d / %d", i + 1, len(paths))

    with open(args.out_dir / "paths.txt", "w") as f:
        f.write("\n".join(index) + "\n")
    logger.info("wrote %d normalized meshes + paths.txt", len(index))


if __name__ == "__main__":
    main()
