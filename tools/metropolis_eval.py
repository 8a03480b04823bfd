#!/usr/bin/env python
"""Metropolis estimator accuracy artifact (VERDICT r4 weak #5): run the
MetropolisPoseEstimator as the coarse stage on the learned encoder-distill
checkpoint — the same object, targets and refinement as the committed CEM
artifact — and record its gate rate next to CEM's.

Reference: MetropolisPoseEstimator, latentfusion/pose/estimation.py:219-295
(MH chains with exponential annealing; the reference ships no TOML for it,
so the chain budget here is recorded in the artifact).

Run:  python tools/metropolis_eval.py --out artifacts/metropolis
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
sys.path.insert(0, str(Path(__file__).parent))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=Path, default=Path("artifacts/metropolis"))
    parser.add_argument("--checkpoint", type=Path,
                        default=Path("artifacts/encoder_distill/"
                                     "encoder_distill.npz"))
    parser.add_argument("--targets", type=int, default=8)
    parser.add_argument("--chains", type=int, default=128)
    parser.add_argument("--mh-iters", type=int, default=300)
    parser.add_argument("--refine-samples", type=int, default=16)
    parser.add_argument("--refine-iters", type=int, default=150)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--tiny", action="store_true",
                        help="random tiny model (CI smoke of the rig)")
    args = parser.parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from latentfusion_tpu import enable_compilation_cache
        enable_compilation_cache()

    from latentfusion_tpu import dtypes, testing, zoo
    from latentfusion_tpu.pose import estimation, metrics
    from latentfusion_tpu.recon.inference import LatentFusionModel
    from latentfusion_tpu.three import orientation
    from latentfusion_tpu.three import quaternion as quat

    dtypes.set_compute_dtype("bfloat16")
    args.out.mkdir(parents=True, exist_ok=True)

    if args.tiny:
        input_size, camera_dist = 16, 5.78
        sculptor, fuser, photographer = (zoo.tiny_sculptor(),
                                         zoo.tiny_fuser(),
                                         zoo.tiny_photographer())
        params = zoo.init_recon_params(jax.random.PRNGKey(0), sculptor,
                                       fuser, photographer, batch=1, views=2)
    else:
        input_size = zoo.DEMO_INPUT_SIZE
        camera_dist = zoo.DEMO_CAMERA_DIST
        sculptor, fuser, photographer = (zoo.demo_sculptor(),
                                         zoo.demo_fuser(),
                                         zoo.demo_photographer())
        template = zoo.init_recon_params(jax.random.PRNGKey(0), sculptor,
                                         fuser, photographer, batch=1,
                                         views=2)
        params = zoo.load_params_npz(args.checkpoint, template)

    model = LatentFusionModel(
        sculptor=sculptor, sculptor_params=params["sculptor"],
        fuser=fuser, fuser_params=params["fuser"],
        photographer=photographer,
        photographer_params=params["photographer"],
        camera_dist=camera_dist)

    # The encoder-distill training object (bench.py full-acc 'ellipsoid').
    axes = (0.21, 0.36, 0.5)
    diameter = 2 * max(axes)
    oracle = testing.EllipsoidOracleModel(
        input_size=input_size, camera_dist=camera_dist, axes=axes)
    dirs = np.asarray(orientation.evenly_distributed_points(512))
    points = jnp.asarray(dirs * np.asarray(axes))

    ref_cams = zoo.random_view_cameras(jax.random.PRNGKey(7), 16,
                                       input_size, camera_dist)
    ref_obs = jax.jit(lambda c: oracle.make_observation(c, shaded=True))(
        ref_cams)
    z_obj = model.build_latent_object(ref_obs)

    metro = estimation.MetropolisPoseEstimator(
        model=model, num_samples=args.chains, num_iters=args.mh_iters,
        loss_weights={"depth": 1.0}, ranking_size=args.refine_samples)
    cem = estimation.CrossEntropyPoseEstimator(
        model=model, num_gmm_components=6, sample_flipped=True,
        num_samples=128, num_iters=10, num_elites=48, learning_rate=0.75,
        loss_weights={"depth": 1.0}, ranking_size=16)
    fine = estimation.GradientPoseEstimator(
        model=model, ranking_size=min(8, args.refine_samples),
        loss_weights={"depth": 1.0, "ov_depth": 0.3}, learning_rate=0.01,
        num_samples=args.refine_samples, num_iters=args.refine_iters,
        converge_threshold=1e-6, converge_patience=25, optimizer="adam")

    def run(coarse, tag):
        rows = []
        ek = jax.random.PRNGKey(55)
        for t in range(args.targets):
            ek, k1, k2 = jax.random.split(ek, 3)
            gt_cam = testing.make_camera(
                1, z=camera_dist, f=615.0, width=640, height=480,
                quats=quat.random(k1, 1))
            target = jax.jit(oracle.make_observation)(gt_cam)
            t0 = time.time()
            coarse_cams = coarse.estimate(z_obj, target, key=k2)
            best = fine.estimate(z_obj, target,
                                 camera=coarse_cams[:args.refine_samples])
            jax.block_until_ready(best.translation)
            dt = time.time() - t0

            def m_of(c):
                m = metrics.camera_metrics(gt_cam, c, points,
                                           scale_to_meters=1.0)
                return {k: float(m[k]) for k in
                        ("add_s", "rotation_dist", "translation_dist")}

            row = {"target": t, "coarse": m_of(coarse_cams[0]),
                   "refined": m_of(best[0]), "seconds": round(dt, 3),
                   "add_s_01d": bool(m_of(best[0])["add_s"]
                                     < 0.1 * diameter)}
            rows.append(row)
            print(f"[{tag}] target {t}: coarse={row['coarse']['add_s']:.4f} "
                  f"refined={row['refined']['add_s']:.4f} {dt:.1f}s "
                  f"0.1d={row['add_s_01d']}", flush=True)
        acc = float(np.mean([r["add_s_01d"] for r in rows]))
        warm = float(np.mean([r["seconds"] for r in rows[1:]])) \
            if len(rows) > 1 else rows[0]["seconds"]
        return {"targets": rows, "add_s_0.1d": acc,
                "warm_seconds_per_object": round(warm, 3)}

    summary = {
        "checkpoint": str(args.checkpoint),
        "object": "encoder-distill ellipsoid", "diameter": diameter,
        "threshold": 0.1 * diameter,
        "metropolis": {
            "budget": {"chains": args.chains, "mh_iters": args.mh_iters,
                       "refine_samples": args.refine_samples,
                       "refine_iters": args.refine_iters},
            **run(metro, "metropolis")},
        "cem_control": {
            "budget": {"cem_samples": 128, "cem_iters": 10,
                       "cem_elites": 48,
                       "refine_samples": args.refine_samples,
                       "refine_iters": args.refine_iters},
            **run(cem, "cem")},
    }
    (args.out / "pose_eval.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({
        "metropolis_add_s_0.1d": summary["metropolis"]["add_s_0.1d"],
        "cem_add_s_0.1d": summary["cem_control"]["add_s_0.1d"]}))


if __name__ == "__main__":
    main()
