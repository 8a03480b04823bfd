#!/usr/bin/env python
"""Latent reconstruction + novel-view rendering example.

Builds a latent object from synthetic reference views (native rasterizer),
renders novel views with the decoder (`render_full`) and with image-based
rendering (`render_ibr_basic`), and writes a comparison grid image —
the script analog of the reference notebook's reconstruction cells.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=Path)
    parser.add_argument("--mesh", type=Path)
    parser.add_argument("--num-views", type=int, default=6)
    parser.add_argument("--out", type=Path, default=Path("reconstruction.png"))
    parser.add_argument("--input-size", type=int, default=16)
    parser.add_argument("--camera-dist", type=float, default=1.5)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import numpy as np

    import imageio.v2 as imageio
    import jax

    from latentfusion_tpu import visualization as viz
    from pose_estimation import build_model, synthetic_observations

    model = build_model(args)
    ref, target, obj = synthetic_observations(args)

    print(f"building latent object from {len(ref)} views...")
    z_obj = model.build_latent_object(ref)

    print("rendering novel view (decoder)...")
    out = model.render_full(z_obj, target.camera)

    print("rendering novel view (IBR)...")
    try:
        y_ibr, _ = model.render_ibr_basic(
            z_obj, ref, target.camera.zoom(None, model.input_size,
                                           model.camera_dist))
        ibr_color = np.asarray(y_ibr["color"])
    except Exception as e:
        print(f"  (IBR skipped: {e})")
        ibr_color = None

    groups = [
        np.asarray(target.color),                      # GT view
        viz.colorize_depth(np.asarray(target.depth)),  # GT depth
        viz.colorize_depth(np.asarray(out["depth"])),  # predicted depth
        viz.colorize_tensor(np.asarray(out["mask"])),  # predicted mask
    ]
    if ibr_color is not None:
        groups.append(np.clip(ibr_color, 0, 1))
    grid = viz.make_grid(groups, row_size=4, output_size=160)
    imageio.imsave(args.out, (grid.transpose(1, 2, 0) * 255).astype(np.uint8))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
