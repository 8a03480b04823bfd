#!/usr/bin/env python
"""Serving + multi-object accuracy artifact (VERDICT r4 weak #4): N learned
objects estimated JOINTLY — through ``estimate_batch`` in-process AND
through the resident ``tools/serve_pose.py`` daemon over its JSON protocol
— with per-object ADD-S and warm latency recorded in one artifact.

Objects are held-out shapes of the pool-128 unseen-objects checkpoint
(never rendered in its training), so this validates the repo's headline
TPU extension (multi-object hypothesis batching + resident serving) at the
same novel-object accuracy gate as the single-object artifacts.

Run:  python tools/serving_accuracy.py --out artifacts/serving
"""
import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
sys.path.insert(0, str(Path(__file__).parent))

ROOT = Path(__file__).parents[1]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=Path, default=Path("artifacts/serving"))
    parser.add_argument("--checkpoint", type=Path,
                        default=Path("artifacts/unseen_objects_pool128/"
                                     "unseen_objects.npz"))
    parser.add_argument("--objects", type=int, default=2,
                        help="held-out objects estimated jointly")
    parser.add_argument("--rounds", type=int, default=3,
                        help="joint estimate rounds (one fresh target pose "
                             "per object per round; round 0 is cold)")
    parser.add_argument("--eval-views", type=int, default=16)
    parser.add_argument("--rank-latent-weight", type=float, default=0.2)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--skip-daemon", action="store_true",
                        help="only the in-process estimate_batch half")
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
    from latentfusion_tpu.camera import Camera
    from latentfusion_tpu.observation import Observation
    from latentfusion_tpu.pose import estimation, metrics
    from latentfusion_tpu.recon.inference import LatentFusionModel
    from latentfusion_tpu.three import quaternion as quat

    dtypes.set_compute_dtype("bfloat16")
    args.out.mkdir(parents=True, exist_ok=True)
    scratch = args.out / "frames"
    scratch.mkdir(exist_ok=True)

    input_size = zoo.DEMO_INPUT_SIZE
    camera_dist = zoo.DEMO_CAMERA_DIST
    sculptor, fuser, photographer = (zoo.demo_sculptor(), zoo.demo_fuser(),
                                     zoo.demo_photographer())
    template = zoo.init_recon_params(jax.random.PRNGKey(0), sculptor, fuser,
                                     photographer, batch=1, views=2)
    params = zoo.load_params_npz(args.checkpoint, template)
    model = LatentFusionModel(
        sculptor=sculptor, sculptor_params=params["sculptor"],
        fuser=fuser, fuser_params=params["fuser"],
        photographer=photographer,
        photographer_params=params["photographer"],
        camera_dist=camera_dist)

    # Held-out objects of the checkpoint's recorded split.
    split = json.loads((args.checkpoint.parent / "pose_eval.json")
                       .read_text())["split"]
    pool, clouds = testing.sample_lobe_shapes(split["heldout_pool_seed"],
                                              args.objects)
    shapes = [testing.index_lobe_shape(jax.device_put(pool), k)
              for k in range(args.objects)]

    def oracle_obs(shape, camera):
        depth, mask, _, onehot = testing.render_lobe_shape(camera, shape)
        color = testing.lobe_shape_color(camera, depth, mask, onehot, shape)
        return Observation(color, depth, mask, camera)

    ref_cams = zoo.random_view_cameras(jax.random.PRNGKey(7),
                                       args.eval_views)
    ref_obs = [jax.jit(lambda c, s=s: oracle_obs(s, c))(ref_cams)
               for s in shapes]

    def save_obs_npz(obs, path):
        np.savez(path,
                 color=np.asarray(obs.color, np.float32),
                 depth=np.asarray(obs.depth, np.float32),
                 mask=np.asarray(obs.mask, np.float32),
                 intrinsic=np.asarray(obs.camera.intrinsic, np.float32),
                 extrinsic=np.asarray(obs.camera.extrinsic, np.float32))
        return str(path)

    # Pre-render every round's targets (shared by both halves).
    ek = jax.random.PRNGKey(55)
    rounds = []
    for r in range(args.rounds):
        row = []
        for k, s in enumerate(shapes):
            ek, k1 = jax.random.split(ek)
            gt_cam = testing.make_camera(
                1, z=camera_dist, f=615.0, width=640, height=480,
                quats=quat.random(k1, 1))
            target = jax.jit(lambda c, s=s: oracle_obs(s, c))(gt_cam)
            row.append((gt_cam, target,
                        save_obs_npz(target,
                                     scratch / f"target_r{r}_o{k}.npz")))
        rounds.append(row)

    extra = ({"latent": args.rank_latent_weight}
             if args.rank_latent_weight > 0 else {})
    coarse = estimation.CrossEntropyPoseEstimator(
        model=model, num_gmm_components=6, sample_flipped=True,
        num_samples=128, num_iters=10, num_elites=48, learning_rate=0.75,
        loss_weights={"depth": 1.0, **extra}, ranking_size=16)
    fine = estimation.GradientPoseEstimator(
        model=model, ranking_size=8,
        loss_weights={"depth": 1.0, "ov_depth": 0.3, **extra},
        learning_rate=0.01, num_samples=16, num_iters=150,
        converge_threshold=1e-6, converge_patience=25, optimizer="adam")

    def add_s_of(gt_cam, est_cam, k):
        m = metrics.camera_metrics(gt_cam, est_cam,
                                   jnp.asarray(clouds[k]),
                                   scale_to_meters=1.0)
        return float(m["add_s"])

    # ---------------------------------------------- in-process joint batch
    print("# estimate_batch (in-process joint)...", file=sys.stderr)
    z_objs = jnp.concatenate([model.build_latent_object(o)
                              for o in ref_obs], axis=0)
    direct_rows = []
    for r, row in enumerate(rounds):
        targets = [t for _, t, _ in row]
        t0 = time.time()
        coarse_out = coarse.estimate_batch(z_objs, targets,
                                           key=jax.random.PRNGKey(100 + r))
        best = fine.estimate_batch(
            z_objs, targets, cameras=Camera.cat([c[:16] for c in coarse_out]))
        jax.block_until_ready(best[0].translation)
        dt = time.time() - t0
        per_obj = [{"object": k,
                    "add_s": round(add_s_of(row[k][0], best[k][:1], k), 5)}
                   for k in range(args.objects)]
        for d in per_obj:
            d["add_s_01d"] = bool(d["add_s"] < 0.1)
        direct_rows.append({"round": r, "cold": r == 0,
                            "seconds_joint": round(dt, 3),
                            "objects": per_obj})
        print(f"# round {r}: {dt:.2f}s "
              f"{[d['add_s'] for d in per_obj]}", file=sys.stderr)

    direct_hits = [d["add_s_01d"] for row in direct_rows
                   for d in row["objects"]]
    direct = {
        "rounds": direct_rows,
        "add_s_0.1d": float(np.mean(direct_hits)),
        "warm_seconds_joint": round(float(np.mean(
            [r["seconds_joint"] for r in direct_rows[1:]])), 3)
        if len(direct_rows) > 1 else None,
        "objects_per_batch": args.objects}

    # ------------------------------------------------------ daemon half
    served = None
    if not args.skip_daemon:
        print("# starting serve_pose daemon...", file=sys.stderr)
        cfg = json.dumps({"type": "cross_entropy",
                          "args": {"num_samples": 128, "num_iters": 10,
                                   "num_elites": 48, "learning_rate": 0.75,
                                   "num_gmm_components": 6,
                                   "sample_flipped": True,
                                   "ranking_size": 16},
                          "loss_weights": {"depth": 1.0, **extra}})
        fcfg = json.dumps({"type": "gradient",
                           "args": {"num_samples": 16, "num_iters": 150,
                                    "learning_rate": 0.01,
                                    "converge_threshold": 1e-6,
                                    "converge_patience": 25,
                                    "optimizer": "adam",
                                    "ranking_size": 8},
                           "loss_weights": {"depth": 1.0, "ov_depth": 0.3,
                                            **extra}})
        cmd = [sys.executable, str(ROOT / "tools/serve_pose.py"), "--stdio",
               "--demo-npz", str(args.checkpoint),
               "--coarse-json", cfg, "--fine-json", fcfg, "--top-k", "16"]
        if args.cpu:
            cmd.append("--cpu")
        proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                stdout=subprocess.PIPE, text=True,
                                bufsize=1)

        def rpc(req):
            proc.stdin.write(json.dumps(req) + "\n")
            proc.stdin.flush()
            return json.loads(proc.stdout.readline())

        ref_paths = [save_obs_npz(o, scratch / f"refs_o{k}.npz")
                     for k, o in enumerate(ref_obs)]
        for k, p in enumerate(ref_paths):
            r = rpc({"cmd": "register", "object": f"obj{k}", "npz": p})
            assert r["ok"], r

        served_rows = []
        for r, row in enumerate(rounds):
            t0 = time.time()
            resp = rpc({"cmd": "estimate",
                        "object": [f"obj{k}" for k in range(args.objects)],
                        "npz": [p for _, _, p in row],
                        "seed": 100 + r, "top_k": 16})
            dt = time.time() - t0
            assert resp["ok"], resp
            per_obj = []
            for k, pose in enumerate(resp["poses"]):
                gt_cam, target, _ = row[k]
                est = Camera(
                    target.camera.intrinsic,
                    jnp.asarray(pose["extrinsic"], jnp.float32)[None],
                    z_span=target.camera.z_span,
                    width=target.camera.width,
                    height=target.camera.height)
                a = add_s_of(gt_cam, est, k)
                per_obj.append({"object": k, "add_s": round(a, 5),
                                "add_s_01d": bool(a < 0.1)})
            served_rows.append({"round": r, "cold": r == 0,
                                "seconds_joint": round(dt, 3),
                                "server_seconds": resp["seconds"],
                                "objects": per_obj})
            print(f"# served round {r}: {dt:.2f}s "
                  f"{[d['add_s'] for d in per_obj]}", file=sys.stderr)
        rpc({"cmd": "shutdown"})
        proc.wait(timeout=60)

        hits = [d["add_s_01d"] for row in served_rows for d in row["objects"]]
        served = {
            "rounds": served_rows,
            "add_s_0.1d": float(np.mean(hits)),
            "warm_seconds_joint": round(float(np.mean(
                [r["seconds_joint"] for r in served_rows[1:]])), 3)
            if len(served_rows) > 1 else None}

    summary = {
        "checkpoint": str(args.checkpoint),
        "objects": args.objects, "rounds": args.rounds,
        "heldout_pool_seed": split["heldout_pool_seed"],
        "rank_latent_weight": args.rank_latent_weight,
        "estimate_batch": direct,
        "served": served,
        "note": "objects are HELD-OUT shapes of the pool-128 checkpoint's "
                "recorded split; per-round joint latency covers N objects "
                "through ONE compiled coarse loop + ONE compiled "
                "refinement loop",
    }
    (args.out / "accuracy.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({
        "estimate_batch_add_s_0.1d": direct["add_s_0.1d"],
        "served_add_s_0.1d": served["add_s_0.1d"] if served else None}))


if __name__ == "__main__":
    main()
