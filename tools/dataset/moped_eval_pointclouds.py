#!/usr/bin/env python
"""Create evenly-distributed evaluation pointclouds for MOPED objects.

For every object directory under ``--dataset-dir`` that has a
``reference/integrated_raw.obj`` scan, farthest-point-sample 4096 vertices
and write ``reference/pointcloud_eval.ply`` — the pointcloud ADD / ADD-S
metrics are computed against (reference: tools/dataset/
moped_eval_pointclouds.py).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset-dir", type=Path, required=True)
    parser.add_argument("--num-points", type=int, default=4096)
    args = parser.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from latentfusion_tpu.meshutils import Object3D
    from latentfusion_tpu.pointcloud import save_ply
    from latentfusion_tpu.three.utils import farthest_points

    jax.config.update("jax_platforms", "cpu")

    for object_dir in sorted(args.dataset_dir.iterdir()):
        obj_path = object_dir / "reference" / "integrated_raw.obj"
        if not obj_path.exists():
            continue
        points = jnp.asarray(Object3D(obj_path).vertices, dtype=jnp.float32)
        print(f"{object_dir.name}: {points.shape[0]} vertices")

        def dist(a, b):
            return jnp.linalg.norm(a - b, axis=-1)

        _, inds = farthest_points(points, n_clusters=args.num_points,
                                  dist_func=dist,
                                  return_center_indexes=True)
        out = object_dir / "reference" / "pointcloud_eval.ply"
        save_ply(out, np.asarray(points[inds]))
        print(f"  wrote {out} ({args.num_points} points)")


if __name__ == "__main__":
    main()
