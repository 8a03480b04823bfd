#!/usr/bin/env python
"""Encoder-in-the-loop distillation: the FULL learned pipeline through the
ADD-S gate (VERDICT r3 missing #1 / next #1).

Round 3's oracle-distill control passed ADD-S 0.1d = 8/8 with a *free
latent code* — no encoder. This rig closes the contract: the latent is
produced by ``Sculptor.encode`` + GRU fuser over rendered reference views
(exactly ``LatentFusionModel.build_latent_object``,
reference: recon/inference.py:73-84, recon/models.py:226-258), trained
jointly with the photographer on dense depth/mask distillation from the
analytic ellipsoid oracle at fresh random cameras every step.

Per training step (one jitted program, fresh data every step):
  1. render V_in full-frame reference observations of the oracle
     (shaded/textured color + depth + mask) at random cameras;
  2. zoom -> prepare -> normalize -> Sculptor.encode -> GRUFuser -> z_obj
     (the reference's build_latent_object pipeline, gradients on);
  3. decode z_obj at V_out fresh zoomed cameras; dense depth L1 + mask BCE
     against the oracle, plus the full-frame estimator-objective term
     (see train_oracle_distill.py for why that term matters).

Eval: ``model.build_latent_object(ref_obs)`` over held-out reference views
-> CEM coarse -> gradient refine -> ADD-S 0.1d gate. Optionally snapshots
params at intermediate budgets and evaluates each one -> the training-
compute scaling curve (VERDICT r3 next #7).

Run:  python tools/train_encoder_distill.py --steps 20000 \
          --out artifacts/encoder_distill
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

INPUT_SIZE = 128
# Reference-canonical rig (see train_oracle_distill.py for the derivation):
# unit-diameter object, auto camera distance for the 128^2 zoom crop.
CAMERA_DIST = 5.78
AXES = (0.21, 0.36, 0.5)
DIAMETER = 2 * max(AXES)

# Mid-size flagship-family stack (zoo.demo_*: 6 downs / 2 ups image
# encoder -> 8^3 x 128ch latent for 128^2 input).


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20000)
    parser.add_argument("--views-in", type=int, default=8,
                        help="reference views encoded per step")
    parser.add_argument("--views-out", type=int, default=8,
                        help="fresh supervision cameras per step")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--out", type=Path,
                        default=Path("artifacts/encoder_distill"))
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--eval-targets", type=int, default=8)
    parser.add_argument("--eval-views", type=int, default=16,
                        help="reference views for the eval latent build")
    parser.add_argument("--skip-train", action="store_true",
                        help="load <out>/encoder_distill.npz and only eval")
    parser.add_argument("--init-photographer", type=Path, default=None,
                        help="warm-start the decoder from an oracle-distill "
                             "npz (e.g. artifacts/oracle_distill/"
                             "distilled.npz)")
    parser.add_argument("--frame-loss-weight", type=float, default=2.0)
    parser.add_argument("--input-depth", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="feed normalized depth to the encoder (the "
                             "RGB-D observation contract, "
                             "reference: observation.py:90-110)")
    parser.add_argument("--snapshot-steps", default="",
                        help="comma-separated intermediate budgets to "
                             "snapshot + evaluate (scaling curve)")
    parser.add_argument("--curve-targets", type=int, default=6,
                        help="eval targets per snapshot on the curve")
    parser.add_argument("--coarse-config", default="quick",
                        choices=["quick", "slow"])
    args = parser.parse_args()

    import numpy as np

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from latentfusion_tpu import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import optax

    from latentfusion_tpu import dtypes, testing, zoo
    from latentfusion_tpu.pose import estimation, metrics
    from latentfusion_tpu.recon import models
    from latentfusion_tpu.recon.inference import LatentFusionModel
    from latentfusion_tpu.three import quaternion as quat

    dtypes.set_compute_dtype("bfloat16")
    args.out.mkdir(parents=True, exist_ok=True)
    snapshot_steps = sorted(int(s) for s in args.snapshot_steps.split(",")
                            if s.strip())

    sculptor = zoo.demo_sculptor(input_depth=args.input_depth)
    fuser = zoo.demo_fuser()
    photographer = zoo.demo_photographer()

    oracle = testing.EllipsoidOracleModel(input_size=INPUT_SIZE,
                                          camera_dist=CAMERA_DIST, axes=AXES)
    key = jax.random.PRNGKey(0)

    def random_full_cameras(key, n):
        return zoo.random_view_cameras(key, n, INPUT_SIZE, CAMERA_DIST)

    def build_latent(train_params, key):
        """The build_latent_object pipeline with gradients on."""
        cam_in = random_full_cameras(key, args.views_in)
        obs = oracle.make_observation(cam_in, shaded=True)
        obs = jax.lax.stop_gradient(obs)  # observations are data
        obs = obs.zoom(CAMERA_DIST, INPUT_SIZE).prepare().normalize()
        z_obj, _ = models.encode(
            sculptor, train_params["sculptor"], fuser, train_params["fuser"],
            obs.camera, obs.color[None], obs.depth[None], obs.mask[None])
        return z_obj

    def distill_loss(train_params, key):
        k_in, k_out = jax.random.split(key)
        z_obj = build_latent(train_params, k_in)

        cam_full = random_full_cameras(k_out, args.views_out)
        cam = cam_full.zoom(None, INPUT_SIZE, CAMERA_DIST)
        y_o, _, _ = oracle.decode_latent(None, cam)
        o_depth = y_o["depth"][0]
        o_mask = (y_o["mask"][0] > 0.5).astype(jnp.float32)

        y, _, _ = models.decode(photographer, train_params["photographer"],
                                z_obj, cam, interpret=True)
        pred_depth = y["depth"][0]
        pred_mask_logits = y["mask_logits"][0]
        depth_l1 = jnp.abs(pred_depth - o_depth).mean()
        mask_bce = estimation._bce_with_logits(pred_mask_logits,
                                               o_mask).mean()

        loss = 25.0 * depth_l1 + 25.0 * mask_bce
        frame_depth = jnp.zeros(())
        if args.frame_loss_weight > 0.0:
            target = oracle.make_observation(cam_full)
            z_depth = cam.denormalize_depth(pred_depth)
            frame_ld = estimation.default_pose_loss(target, z_depth,
                                                    pred_mask_logits, cam)
            frame_depth = frame_ld["depth"].mean()
            loss = loss + args.frame_loss_weight * (
                frame_depth + 0.3 * frame_ld["ov_depth"].mean())
        return loss, {"depth_l1": depth_l1, "mask_bce": mask_bce,
                      "frame_depth": frame_depth}

    def save_npz(train_params, path_stem):
        host = jax.device_get(train_params)
        flat = {"/".join(map(str, path)): np.asarray(leaf)
                for path, leaf in
                jax.tree_util.tree_flatten_with_path(host)[0]}
        np.savez(args.out / f"{path_stem}.npz", **{
            str(i): v for i, v in enumerate(flat.values())})
        (args.out / f"{path_stem}_keys.json").write_text(
            json.dumps(list(flat.keys())))

    def init_params(key):
        params = zoo.init_recon_params(key, sculptor, fuser, photographer,
                                       batch=1, views=2)
        if args.init_photographer is not None:
            # Unflatten the oracle-distill npz against its own template
            # {photographer, z_obj} and graft the photographer subtree.
            cam0 = random_full_cameras(jax.random.PRNGKey(1), 2).zoom(
                None, INPUT_SIZE, CAMERA_DIST)
            z0 = jnp.zeros((2, LATENT_CHANNELS, LATENT_SIZE, LATENT_SIZE,
                            LATENT_SIZE))
            template = {
                "photographer": jax.jit(photographer.init)(key, z0, cam0),
                "z_obj": jnp.zeros((1, 1, LATENT_CHANNELS, LATENT_SIZE,
                                    LATENT_SIZE, LATENT_SIZE)),
            }
            data = np.load(args.init_photographer)
            leaves = [jnp.asarray(data[str(i)])
                      for i in range(len(data.files))]
            loaded = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(template), leaves)
            params["photographer"] = loaded["photographer"]
            print(f"# decoder warm-started from {args.init_photographer}",
                  file=sys.stderr)
        return params

    history = []
    snapshots = {}
    if not args.skip_train:
        train_params = init_params(key)
        n_params = sum(int(np.prod(p.shape)) for p in
                       jax.tree_util.tree_leaves(train_params))
        print(f"# {n_params / 1e6:.1f}M trainable params", file=sys.stderr)

        schedule = optax.cosine_decay_schedule(args.lr, args.steps,
                                               alpha=0.01)
        opt = optax.adam(schedule, b1=0.9, b2=0.99)
        opt_state = opt.init(train_params)

        @jax.jit
        def step(train_params, opt_state, key):
            (loss, aux), grads = jax.value_and_grad(
                distill_loss, has_aux=True)(train_params, key)
            updates, opt_state = opt.update(grads, opt_state, train_params)
            train_params = optax.apply_updates(train_params, updates)
            return train_params, opt_state, loss, aux

        print("# compiling distillation step...", file=sys.stderr)
        t0 = time.time()
        train_params, opt_state, loss, aux = step(train_params, opt_state,
                                                  key)
        jax.block_until_ready(loss)
        print(f"# compile+first: {time.time() - t0:.0f}s "
              f"loss={float(loss):.3f}", file=sys.stderr)

        t0 = time.time()
        for i in range(1, args.steps):
            key, sub = jax.random.split(key)
            train_params, opt_state, loss, aux = step(train_params,
                                                      opt_state, sub)
            if i in snapshot_steps:
                snapshots[i] = jax.device_get(train_params)
                print(f"# snapshot at step {i}", file=sys.stderr)
            if i % 500 == 0 or i == args.steps - 1:
                row = {"step": i, "loss": float(loss),
                       "depth_l1": float(aux["depth_l1"]),
                       "mask_bce": float(aux["mask_bce"]),
                       "frame_depth": float(aux["frame_depth"])}
                history.append(row)
                print(f"step {i}: loss={row['loss']:.4f} "
                      f"d={row['depth_l1']:.4f} m={row['mask_bce']:.4f} "
                      f"f={row['frame_depth']:.4f} "
                      f"({i / (time.time() - t0):.1f} steps/s)",
                      file=sys.stderr, flush=True)

        (args.out / "history.json").write_text(json.dumps(history))
        save_npz(train_params, "encoder_distill")

        # Reference-schema .pth (loadable by both frameworks).
        try:
            import torch

            from latentfusion_tpu.recon import checkpoint as ckpt

            host_params = jax.device_get(train_params)
            modules = {
                "sculptor": {"args": sculptor.checkpoint_args(),
                             "params": host_params["sculptor"]},
                "photographer": {"args": photographer.checkpoint_args(),
                                 "params": host_params["photographer"]},
                "fuser": {"type": type(fuser).__name__,
                          "args": {"in_channels": fuser.in_channels,
                                   "cube_size": fuser.cube_size},
                          "params": host_params["fuser"]},
            }
            for mod in modules.values():
                params_tree = mod.pop("params")
                mod["state_dict"] = {
                    k: torch.from_numpy(np.asarray(v)) for k, v in
                    ckpt.export_torch_state_dict(params_tree).items()}
            torch.save({"name": "encoder_distill", "epoch": 0,
                        "meter_hists": {},
                        "args": {"camera_dist": CAMERA_DIST},
                        "modules": modules},
                       args.out / "checkpoint.pth")
            print(f"# wrote {args.out / 'checkpoint.pth'}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 - .pth export is best-effort
            print(f"# checkpoint.pth export failed: {e}", file=sys.stderr)
    else:
        template = init_params(key)
        data = np.load(args.out / "encoder_distill.npz")
        leaves = [jnp.asarray(data[str(i)]) for i in range(len(data.files))]
        train_params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), leaves)

    # --------------------------------------------------------------- eval
    from latentfusion_tpu.three import orientation

    dirs = np.asarray(orientation.evenly_distributed_points(512))
    points = jnp.asarray(dirs * np.asarray(AXES))

    if args.coarse_config == "slow":
        coarse_kw = dict(num_samples=200, num_iters=30, num_elites=64,
                         learning_rate=0.3,
                         loss_weights={"depth": 1.0, "ov_depth": 0.2},
                         ranking_size=64)
    else:
        coarse_kw = dict(num_samples=128, num_iters=10, num_elites=48,
                         learning_rate=0.75, loss_weights={"depth": 1.0},
                         ranking_size=16)

    def evaluate(params, n_targets, tag=""):
        model = LatentFusionModel(
            sculptor=sculptor, sculptor_params=params["sculptor"],
            fuser=fuser, fuser_params=params["fuser"],
            photographer=photographer,
            photographer_params=params["photographer"],
            camera_dist=CAMERA_DIST)

        # Latent built by the ENCODER from held-out reference views — the
        # full build_latent_object contract.
        ref_cams = random_full_cameras(jax.random.PRNGKey(7),
                                       args.eval_views)
        ref_obs = jax.jit(lambda c: oracle.make_observation(
            c, shaded=True))(ref_cams)
        z_obj = model.build_latent_object(ref_obs)

        coarse = estimation.CrossEntropyPoseEstimator(
            model=model, num_gmm_components=6, sample_flipped=True,
            **coarse_kw)
        fine = estimation.GradientPoseEstimator(
            model=model, ranking_size=8,
            loss_weights={"depth": 1.0, "ov_depth": 0.3},
            learning_rate=0.01, num_samples=16, num_iters=150,
            converge_threshold=1e-6, converge_patience=25, optimizer="adam")

        rows = []
        ek = jax.random.PRNGKey(55)
        for t in range(n_targets):
            ek, k1, k2 = jax.random.split(ek, 3)
            gt_cam = testing.make_camera(
                1, z=CAMERA_DIST, f=615.0, width=640, height=480,
                quats=quat.random(k1, 1))
            target = jax.jit(oracle.make_observation)(gt_cam)

            coarse_cams = coarse.estimate(z_obj, target, key=k2)
            best = fine.estimate(z_obj, target, camera=coarse_cams[:16])

            def cam_metrics(c):
                m = metrics.camera_metrics(gt_cam, c, points,
                                           scale_to_meters=1.0)
                return {k: float(m[k]) for k in
                        ("add_s", "rotation_dist", "translation_dist")}

            row = {"target": t,
                   "coarse": cam_metrics(coarse_cams[0]),
                   "refined": cam_metrics(best[0]),
                   "add_s_01d": bool(cam_metrics(best[0])["add_s"]
                                     < 0.1 * DIAMETER)}
            rows.append(row)
            print(f"{tag}target {t}: "
                  f"coarse add_s={row['coarse']['add_s']:.4f} "
                  f"refined={row['refined']['add_s']:.4f} "
                  f"rot={row['refined']['rotation_dist']:.3f} "
                  f"trans={row['refined']['translation_dist']:.4f} "
                  f"0.1d={row['add_s_01d']}", flush=True)
        acc = float(np.mean([r["add_s_01d"] for r in rows]))
        return rows, acc

    curve = []
    for s in sorted(snapshots):
        rows, acc = evaluate(snapshots[s], args.curve_targets,
                             tag=f"[step {s}] ")
        curve.append({
            "step": s, "add_s_0.1d": acc,
            "mean_add_s": float(np.mean([r["refined"]["add_s"]
                                         for r in rows])),
            "mean_rotation_dist": float(np.mean(
                [r["refined"]["rotation_dist"] for r in rows])),
            "targets": rows})
        print(json.dumps({"curve_step": s, "add_s_0.1d": acc}), flush=True)

    rows, acc = evaluate(train_params, args.eval_targets)
    if snapshot_steps and not args.skip_train:
        curve.append({
            "step": args.steps, "add_s_0.1d": acc,
            "mean_add_s": float(np.mean([r["refined"]["add_s"]
                                         for r in rows])),
            "mean_rotation_dist": float(np.mean(
                [r["refined"]["rotation_dist"] for r in rows])),
            "targets": rows})
        (args.out / "scaling_curve.json").write_text(
            json.dumps(curve, indent=2))

    summary = {
        "targets": rows, "add_s_0.1d": acc,
        "diameter": DIAMETER, "threshold": 0.1 * DIAMETER,
        "history": history[-5:],
        "eval_views": args.eval_views,
        "trained_with": "encoder-in-the-loop distillation (latent from "
                        "Sculptor.encode + GRUFuser over rendered reference "
                        "views via build_latent_object; dense depth/mask "
                        "regression at fresh cameras; decoder "
                        f"{'warm-started' if args.init_photographer else 'from scratch'})",
    }
    (args.out / "pose_eval.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({"add_s_0.1d": acc,
                      "mean_refined_add_s": float(np.mean(
                          [r["refined"]["add_s"] for r in rows]))}))


if __name__ == "__main__":
    main()
