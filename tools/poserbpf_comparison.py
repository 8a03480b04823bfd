#!/usr/bin/env python
"""MOPED tracking evaluation (PoseRBPF comparison protocol).

Behavioral reference: ``tools/poserbpf_comparison.py`` (231 LoC): for each
MOPED sequence, build the latent object from reference captures, run a
coarse estimate on frame 0, then per-frame gradient refinement warm-started
from the previous frame's pose; report per-frame metrics and optionally
render a comparison video.
"""
import argparse
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("poserbpf_comparison")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--reference-scene", type=Path, required=True,
                        help="MOPED reference capture dir")
    parser.add_argument("--eval-scene", type=Path, required=True,
                        help="MOPED evaluation capture dir")
    parser.add_argument("--num-ref-views", type=int, default=16)
    parser.add_argument("--coarse-config", type=Path,
                        default=Path(__file__).parents[1]
                        / "configs" / "cross_entropy_quick.toml")
    parser.add_argument("--fine-config", type=Path,
                        default=Path(__file__).parents[1]
                        / "configs" / "adam_quick.toml")
    parser.add_argument("--out", type=Path, default=Path("moped_eval"))
    parser.add_argument("--video", action="store_true")
    parser.add_argument("--max-frames", type=int, default=-1)
    args = parser.parse_args()

    from latentfusion_tpu.data.loader import collate
    from latentfusion_tpu.data.realsense import RealsenseDataset
    from latentfusion_tpu.observation import Observation
    from latentfusion_tpu.pose import estimation, metrics
    from latentfusion_tpu.recon.inference import LatentFusionModel

    model = LatentFusionModel.from_checkpoint(args.checkpoint)

    ref_ds = RealsenseDataset(args.reference_scene)
    inds = [int(i) for i in ref_ds.sample_evenly(args.num_ref_views)]
    ref_obs = Observation.from_dict(collate([ref_ds[i] for i in inds]))
    logger.info("building latent object from %d reference views", len(inds))
    z_obj = model.build_latent_object(ref_obs)

    eval_ds = RealsenseDataset(args.eval_scene,
                               ref_points=ref_ds.points)
    coarse = estimation.load_from_config(args.coarse_config, model)
    fine = estimation.load_from_config(args.fine_config, model)

    n_frames = len(eval_ds)
    if args.max_frames > 0:
        n_frames = min(n_frames, args.max_frames)

    results = []
    prev_camera = None
    writer = None
    if args.video:
        from latentfusion_tpu.videos import VideoWriter

        args.out.mkdir(parents=True, exist_ok=True)
        writer = VideoWriter(args.out / "tracking.mp4", fps=15)

    for frame_idx in range(n_frames):
        target = Observation.from_dict(collate([eval_ds[frame_idx]]))
        t0 = time.time()
        if prev_camera is None:
            # Frame 0: full coarse + fine (reference: :113-123).
            coarse_cams = coarse.estimate(z_obj, target)
            best = fine.estimate(z_obj, target,
                                 camera=coarse_cams[:fine.num_samples])
        else:
            # Warm start: refine from the previous frame's pose.
            import latentfusion_tpu.pose.utils as pu
            import jax

            warm = prev_camera.repeat(fine.num_samples)
            warm = pu.perturb_camera(jax.random.PRNGKey(frame_idx), warm,
                                     0.005, 0.02)
            best = fine.estimate(z_obj, target, camera=warm)
        elapsed = time.time() - t0
        prev_camera = best[0]

        m = metrics.camera_metrics(target.camera, best[0], None, 1.0)
        m["frame"] = frame_idx
        m["seconds"] = elapsed
        results.append(m)
        logger.info("frame %d: rot=%.3f trans=%.4f (%.2fs)", frame_idx,
                    m["rotation_dist"], m["translation_dist"], elapsed)

        if writer is not None:
            import numpy as np

            out = model.render_full(z_obj, best[0])
            mask = np.asarray(out["mask"])[0, 0]
            color = np.asarray(target.color[0]).transpose(1, 2, 0)
            from latentfusion_tpu.pose.plotting import overlay_mask

            writer.write(overlay_mask(color, mask))

    if writer is not None:
        writer.close()

    args.out.mkdir(parents=True, exist_ok=True)
    with open(args.out / "results.json", "w") as f:
        json.dump(results, f, indent=2)
    mean_rot = sum(r["rotation_dist"] for r in results) / len(results)
    mean_t = sum(r["translation_dist"] for r in results) / len(results)
    mean_s = sum(r["seconds"] for r in results) / len(results)
    logger.info("tracking done: mean rot=%.4f rad, trans=%.4f, %.3fs/frame",
                mean_rot, mean_t, mean_s)


if __name__ == "__main__":
    main()
