#!/usr/bin/env python
"""Align two capture scenes by registering their integrated point clouds.

Behavioral reference: the reference's view-alignment tool (tools/dataset/,
273 LoC) which produces ``registration/registration.json`` consumed by
``RealsenseDataset.load_registration``. This rebuild uses point-to-point ICP
(numpy) with FPS-subsampled clouds.
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[2]))


def procrustes(src, dst):
    """Least-squares rigid transform taking src -> dst (Umeyama, no scale)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    cov = (dst - mu_d).T @ (src - mu_s) / len(src)
    U, _, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    t = mu_d - R @ mu_s
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def icp(src, dst, iterations=50, subsample=4000, seed=0):
    rng = np.random.RandomState(seed)
    if len(src) > subsample:
        src = src[rng.choice(len(src), subsample, replace=False)]
    if len(dst) > subsample:
        dst = dst[rng.choice(len(dst), subsample, replace=False)]
    T = np.eye(4)
    cur = src.copy()
    for it in range(iterations):
        # Nearest neighbors (brute-force, chunked).
        d2 = ((cur[:, None, :] - dst[None, :, :]) ** 2).sum(-1)
        nn = d2.argmin(axis=1)
        dists = np.sqrt(d2[np.arange(len(cur)), nn])
        # Trim worst 20% correspondences.
        keep = dists < np.percentile(dists, 80)
        step = procrustes(cur[keep], dst[nn[keep]])
        cur = cur @ step[:3, :3].T + step[:3, 3]
        T = step @ T
        if it % 10 == 0:
            print(f"iter {it}: mean dist {dists[keep].mean():.5f}")
    return T, float(dists[keep].mean())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("source_scene", type=Path,
                        help="scene to register (gets registration/)")
    parser.add_argument("target_scene", type=Path,
                        help="reference scene to align to")
    parser.add_argument("--odometry", default="open3d",
                        choices=["open3d", "kinectfusion"])
    parser.add_argument("--iterations", type=int, default=50)
    args = parser.parse_args()

    from latentfusion_tpu.meshutils import load_ply

    sub = "scene" if args.odometry == "open3d" else "scene_kf"
    src = load_ply(args.source_scene / sub / "integrated_cropped.ply")["vertices"]
    dst = load_ply(args.target_scene / sub / "integrated_cropped.ply")["vertices"]

    T, err = icp(src.astype(np.float64), dst.astype(np.float64),
                 iterations=args.iterations)
    print(f"final mean correspondence distance: {err:.5f}")

    out_dir = args.source_scene / "registration"
    out_dir.mkdir(exist_ok=True)
    with open(out_dir / "registration.json", "w") as f:
        json.dump({"transform": T.tolist(), "mean_error": err}, f, indent=2)
    print(f"wrote {out_dir / 'registration.json'}")


if __name__ == "__main__":
    main()
