#!/usr/bin/env python
"""End-to-end 6D-pose evaluation on a BOP-layout dataset (LINEMOD / T-LESS).

The accuracy harness behind the headline claim: for each evaluated frame,
build the latent object from N evenly-spaced reference views, run the
coarse (cross-entropy) search, refine the top-K hypotheses with gradient
descent, and score the best pose against the ground-truth extrinsic with
ADD / ADD-S / ADD-sym / Proj2D (the metrics the reference computes in
``latentfusion/pose/metrics.py:19-109``; the reference ships no eval
script — its numbers live in the paper — so this is the missing harness).

Layout expectations match ``latentfusion_tpu.data.bop.BOPDataset``
(reference: datasets/bop.py:49-236): ``<root>/{models_eval,models}`` plus a
scene directory with ``rgb/ depth/ mask_visib/ scene_camera.json
scene_gt.json``.

Example (LINEMOD object 1):

    python tools/evaluate_bop.py \
        --checkpoint model.pth \
        --dataset-path /data/bop/lm --scene-path /data/bop/lm/test/000001 \
        --object-id 1 --num-input-views 16 --num-frames 50 \
        --coarse-config configs/cross_entropy_linemod.toml \
        --fine-config configs/adam_slow.toml --out results.json
"""
import argparse
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

logger = logging.getLogger("evaluate_bop")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--dataset-path", type=Path, required=True,
                        help="BOP dataset root (e.g. .../bop/lm)")
    parser.add_argument("--scene-path", type=Path, required=True,
                        help="scene directory (e.g. .../lm/test/000001)")
    parser.add_argument("--object-id", type=int, required=True)
    parser.add_argument("--num-input-views", type=int, default=16)
    parser.add_argument("--num-frames", type=int, default=0,
                        help="evaluate this many frames, evenly spaced over "
                             "the scene (0 = every non-reference frame)")
    parser.add_argument("--coarse-config", type=Path,
                        default=Path(__file__).parents[1]
                        / "configs/cross_entropy_quick.toml")
    parser.add_argument("--fine-config", type=Path,
                        default=Path(__file__).parents[1]
                        / "configs/adam_quick.toml")
    parser.add_argument("--top-k", type=int, default=8,
                        help="coarse hypotheses refined by the fine stage")
    parser.add_argument("--batch-frames", type=int, default=1,
                        help="estimate this many eval frames jointly via "
                             "estimate_batch (same latent, per-frame "
                             "hypothesis blocks share the decoder batch)")
    parser.add_argument("--center-object", action="store_true")
    parser.add_argument("--out", type=Path,
                        help="write per-frame metrics JSON here")
    parser.add_argument("--seed", type=int, default=0)
    return parser.parse_args(argv)


def select_frames(dataset, ref_inds, num_frames):
    """Evaluation frames: evenly spaced over the scene, excluding the
    reference views used to build the latent object."""
    import numpy as np

    ref = set(int(i) for i in np.asarray(ref_inds))
    candidates = [i for i in range(len(dataset)) if i not in ref]
    if num_frames and num_frames < len(candidates):
        picks = np.linspace(0, len(candidates) - 1, num_frames)
        candidates = [candidates[int(round(p))] for p in picks]
    return candidates


def evaluate_frame(model, coarse, fine, z_obj, obs, top_k, key):
    """Coarse search then gradient refinement; returns the best Camera."""
    coarse_cams = coarse.estimate(z_obj, obs, key=key)
    return fine.estimate(z_obj, obs, camera=coarse_cams[:top_k])


def evaluate_frames_batched(model, coarse, fine, z_obj, observations,
                            top_k, key):
    """Estimate several frames of the same object jointly: the latent is
    shared, each frame owns a contiguous hypothesis block, and both the
    coarse and fine loops run as ONE jitted program over all frames."""
    import jax.numpy as jnp

    from latentfusion_tpu.camera import Camera

    n = len(observations)
    z_objs = jnp.concatenate([z_obj] * n, axis=0)
    coarse_out = coarse.estimate_batch(z_objs, observations, key=key)
    return fine.estimate_batch(
        z_objs, observations,
        cameras=Camera.cat([c[:top_k] for c in coarse_out]))


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    args = parse_args(argv)

    import numpy as np

    import jax

    from latentfusion_tpu.data.bop import BOPDataset
    from latentfusion_tpu.observation import Observation
    from latentfusion_tpu.pose import estimation, format as pf, metrics
    from latentfusion_tpu.recon.inference import LatentFusionModel

    dataset = BOPDataset(args.dataset_path, args.scene_path, args.object_id,
                         center_object=args.center_object)
    points = dataset.load_pointcloud()
    # Normalized object units -> native model units (BOP: millimeters).
    scale_to_native = 1.0 / dataset.object_scale
    diameter = float(dataset.model_info["diameter"])

    model = LatentFusionModel.from_checkpoint(args.checkpoint)
    coarse = estimation.load_from_config(args.coarse_config, model)
    fine = estimation.load_from_config(args.fine_config, model)

    logger.info("building latent object from %d reference views...",
                args.num_input_views)
    ref_inds = dataset.sample_evenly(args.num_input_views)
    ref_obs = Observation.from_dataset(dataset, ref_inds)
    z_obj = model.build_latent_object(ref_obs)

    frame_inds = select_frames(dataset, ref_inds, args.num_frames)
    ids = dataset.get_ids()
    key = jax.random.PRNGKey(args.seed)

    rows = []
    group_size = max(args.batch_frames, 1)
    groups = [frame_inds[i:i + group_size]
              for i in range(0, len(frame_inds), group_size)]
    done = 0
    for group in groups:
        key, sub = jax.random.split(key)
        t0 = time.time()
        if len(group) > 1:
            observations = [Observation.from_dataset(dataset, [i])
                            for i in group]
            bests = evaluate_frames_batched(model, coarse, fine, z_obj,
                                            observations, args.top_k, sub)
        else:
            observations = [Observation.from_dataset(dataset, [group[0]])]
            bests = [evaluate_frame(model, coarse, fine, z_obj,
                                    observations[0], args.top_k, sub)]
        elapsed = (time.time() - t0) / len(group)
        for idx, obs, best in zip(group, observations, bests):
            m = metrics.camera_metrics(obs.camera, best[0], points,
                                       scale_to_meters=scale_to_native)
            m["frame"] = ids[idx]
            m["seconds"] = round(elapsed, 3)
            m["add_01d"] = bool(m["add"] < 0.1 * diameter)
            m["add_s_01d"] = bool(m["add_s"] < 0.1 * diameter)
            rows.append(m)
            done += 1
            logger.info("[%d/%d] frame %s: add=%.2f add_s=%.2f (0.1d=%.2f) "
                        "rot=%.3f rad %.1fs", done, len(frame_inds),
                        ids[idx], m["add"], m["add_s"], 0.1 * diameter,
                        m["rotation_dist"], elapsed)

    summary = metrics.concat_camera_metrics(
        [{k: v for k, v in r.items()
          if isinstance(v, float) and k != "seconds"} for r in rows])
    logger.info("\n%s", pf.metrics_table(
        {k: float(np.mean(v)) for k, v in summary.items()},
        name=f"obj_{args.object_id:06d} mean ({len(rows)} frames)"))
    acc = {
        "add_0.1d": float(np.mean([r["add_01d"] for r in rows])),
        "add_s_0.1d": float(np.mean([r["add_s_01d"] for r in rows])),
    }
    logger.info("%s", pf.metrics_table(acc, name="accuracy"))

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"object_id": args.object_id,
                       "diameter": diameter,
                       "frames": rows, "accuracy": acc}, f, indent=2)
        logger.info("wrote %s", args.out)
    return rows, acc


if __name__ == "__main__":
    main()
