#!/usr/bin/env python
"""Unseen-object generalization: train the full pipeline on a POOL of
procedural multi-lobe objects, then estimate pose on HELD-OUT objects never
seen in training (VERDICT r3 missing #2 / next #2).

The paper's headline capability is pose for *novel* objects with no
per-object fine-tuning (reference README.md:3-15: train on ShapeNet,
evaluate LINEMOD/MOPED). Round 3's accuracy artifacts all trained and
evaluated on the same single object; this rig is the first in-repo evidence
of the latent representation generalizing across objects.

Setup (TPU-native analog of the ShapeNet synthetic stream,
reference datasets/training/shapenet.py:92-125 + pyrender.py:302-342):
  * objects are analytic multi-lobe shapes (union of rotated ellipsoid
    lobes, ``testing.sample_lobe_shapes``) — an object IS a parameter
    vector, so the whole train pool lives on device as stacked (K, ...)
    arrays and each jitted training step gathers a random object index;
    no host rendering, no mesh I/O, fresh cameras every step.
  * per step: render V_in reference views of object k (shaded color +
    depth + mask) -> zoom/prepare/normalize -> Sculptor.encode + GRUFuser
    (= build_latent_object, gradients on) -> decode at V_out fresh cameras
    -> dense depth L1 + mask BCE vs the analytic oracle + the full-frame
    estimator-objective term.
  * eval: for each HELD-OUT object, build the latent from reference views
    with the trained encoder, run CEM coarse + gradient refinement against
    rendered targets, gate ADD-S at 0.1 x diameter vs the object's surface
    point cloud. An in-distribution control evaluates a TRAIN object the
    same way to separate "can't generalize" from "can't fit".

Run:  python tools/train_unseen_objects.py --steps 40000 \
          --out artifacts/unseen_objects
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
sys.path.insert(0, str(Path(__file__).parent))

INPUT_SIZE = 128   # == zoo.DEMO_INPUT_SIZE (demo-scale family)
CAMERA_DIST = 5.78  # == zoo.DEMO_CAMERA_DIST
DIAMETER = 1.0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=40000)
    parser.add_argument("--train-objects", type=int, default=10)
    parser.add_argument("--heldout-objects", type=int, default=2)
    parser.add_argument("--pool-seed", type=int, default=0,
                        help="train pool shapes = seeds [0, K); held-out "
                             "shapes drawn from an independent seed stream")
    parser.add_argument("--views-in", type=int, default=6)
    parser.add_argument("--views-out", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--out", type=Path,
                        default=Path("artifacts/unseen_objects"))
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--eval-targets", type=int, default=6,
                        help="pose targets per evaluated object")
    parser.add_argument("--eval-views", type=int, default=16)
    parser.add_argument("--skip-train", action="store_true")
    parser.add_argument("--init-params", type=Path, default=None,
                        help="warm-start all modules from an "
                             "encoder-distill npz (same architecture)")
    parser.add_argument("--frame-loss-weight", type=float, default=2.0)
    parser.add_argument("--snapshot-steps", default="")
    parser.add_argument("--max-seconds", type=float, default=0.0,
                        help="wall-clock training budget; when exceeded the "
                             "loop stops at the next 500-step boundary and "
                             "saves whatever it reached (the cosine LR "
                             "schedule stays sized for --steps; the actual "
                             "stop step is recorded in the artifact)")
    parser.add_argument("--curve-targets", type=int, default=4)
    # Eval search budgets (defaults = the published-artifact budgets; the
    # CPU smoke test, tests/test_unseen_objects_smoke.py, shrinks them with
    # --tiny to keep the rig's plumbing under test).
    parser.add_argument("--cem-samples", type=int, default=128)
    parser.add_argument("--cem-iters", type=int, default=10)
    parser.add_argument("--cem-elites", type=int, default=48)
    parser.add_argument("--refine-samples", type=int, default=16)
    parser.add_argument("--refine-iters", type=int, default=150)
    # Extra ranking terms for the eval-time objective. Depth alone cannot
    # disambiguate near-flip basins on weakly textured geometry; the
    # reference's own answer is the latent loss (encode the target view at
    # the proposal camera, cosine distance in latent space — reference
    # configs/pose/adam_latent.toml: depth 1.0 + latent 0.2) and the
    # silhouette terms of default_pose_loss (estimation.py:70-118).
    parser.add_argument("--rank-latent-weight", type=float, default=0.0,
                        help="latent cosine-distance weight added to BOTH "
                             "estimators' loss (reference adam_latent: 0.2)")
    parser.add_argument("--rank-mask-weight", type=float, default=0.0,
                        help="mask BCE weight added to both estimators")
    parser.add_argument("--rank-iou-weight", type=float, default=0.0,
                        help="IoU loss weight added to both estimators")
    parser.add_argument("--eval-out", type=Path, default=None,
                        help="directory for pose_eval.json/"
                             "scaling_curve.json (default: --out; lets a "
                             "--skip-train re-eval at another search "
                             "budget keep the original artifact)")
    parser.add_argument("--family", choices=["demo", "mid", "tiny"],
                        default="demo",
                        help="model family: demo = the 16.9M 128^2 family "
                             "of the committed checkpoints; mid = flagship "
                             "channel widths at 128^2 (~4x params — the "
                             "model-scale probe); tiny = 16^2 CI smoke")
    parser.add_argument("--tiny", action="store_true",
                        help="alias for --family tiny")
    args = parser.parse_args(argv)
    if args.tiny:
        args.family = "tiny"

    import numpy as np

    import jax

    if args.cpu:
        # No persistent compile cache on CPU: sandbox hosts differ in CPU
        # features and stale AOT entries spam feature-mismatch errors.
        jax.config.update("jax_platforms", "cpu")
    else:
        from latentfusion_tpu import enable_compilation_cache
        enable_compilation_cache()
    import jax.numpy as jnp
    import optax

    from latentfusion_tpu import dtypes, testing, zoo
    from latentfusion_tpu.pose import estimation
    from latentfusion_tpu.recon import models
    from latentfusion_tpu.recon.inference import LatentFusionModel
    from latentfusion_tpu.three import quaternion as quat

    dtypes.set_compute_dtype("bfloat16")
    args.out.mkdir(parents=True, exist_ok=True)
    eval_out = args.eval_out or args.out
    eval_out.mkdir(parents=True, exist_ok=True)
    snapshot_steps = sorted(int(s) for s in args.snapshot_steps.split(",")
                            if s.strip())

    # ----------------------------------------------------------- objects
    # The held-out shapes come from a disjoint seed stream, so they are
    # novel geometry AND novel texture. The split is recorded in the
    # artifact.
    pool, train_clouds = testing.sample_lobe_shapes(
        args.pool_seed, args.train_objects, diameter=DIAMETER)
    heldout_pool, heldout_clouds = testing.sample_lobe_shapes(
        args.pool_seed + 7919, args.heldout_objects, diameter=DIAMETER)

    if args.family == "tiny":
        input_size = 16
        sculptor = zoo.tiny_sculptor()
        fuser = zoo.tiny_fuser()
        photographer = zoo.tiny_photographer()
    elif args.family == "mid":
        input_size = zoo.MID_INPUT_SIZE
        sculptor = zoo.mid_sculptor()
        fuser = zoo.mid_fuser()
        photographer = zoo.mid_photographer()
    else:
        input_size = INPUT_SIZE
        sculptor = zoo.demo_sculptor()
        fuser = zoo.demo_fuser()
        photographer = zoo.demo_photographer()

    key = jax.random.PRNGKey(0)

    def random_full_cameras(key, n):
        return zoo.random_view_cameras(key, n, input_size, CAMERA_DIST)

    def oracle_observation(shape, camera):
        depth, mask, _, lobe_onehot = testing.render_lobe_shape(camera,
                                                                shape)
        color = testing.lobe_shape_color(camera, depth, mask, lobe_onehot,
                                         shape)
        from latentfusion_tpu.observation import Observation
        return Observation(color, depth, mask, camera)

    def build_latent(train_params, shape, key):
        cam_in = random_full_cameras(key, args.views_in)
        obs = jax.lax.stop_gradient(oracle_observation(shape, cam_in))
        obs = obs.zoom(CAMERA_DIST, input_size).prepare().normalize()
        z_obj, _ = models.encode(
            sculptor, train_params["sculptor"], fuser, train_params["fuser"],
            obs.camera, obs.color[None], obs.depth[None], obs.mask[None])
        return z_obj

    def distill_loss(train_params, key):
        k_obj, k_in, k_out = jax.random.split(key, 3)
        obj = jax.random.randint(k_obj, (), 0, args.train_objects)
        shape = testing.index_lobe_shape(pool_dev, obj)
        z_obj = build_latent(train_params, shape, k_in)

        cam_full = random_full_cameras(k_out, args.views_out)
        cam = cam_full.zoom(None, input_size, CAMERA_DIST)
        o_depth_m, o_mask, _, _ = testing.render_lobe_shape(
            cam, shape, input_size)
        o_depth = jnp.where(o_mask > 0.5, cam.normalize_depth(o_depth_m),
                            -1.0)

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
            target = jax.lax.stop_gradient(
                oracle_observation(shape, cam_full))
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
        if args.init_params is not None:
            data = np.load(args.init_params)
            leaves = [jnp.asarray(data[str(i)])
                      for i in range(len(data.files))]
            params = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(params), leaves)
            print(f"# warm-started from {args.init_params}",
                  file=sys.stderr)
        return params

    pool_dev = jax.device_put(pool)
    history = []
    snapshots = {}
    stats_steps = None
    if not args.skip_train:
        train_params = init_params(key)
        n_params = sum(int(np.prod(p.shape)) for p in
                       jax.tree_util.tree_leaves(train_params))
        print(f"# {n_params / 1e6:.1f}M trainable params | "
              f"{args.train_objects} train objects, "
              f"{args.heldout_objects} held out", file=sys.stderr)

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
        stop_step = args.steps - 1
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
                if args.max_seconds and time.time() - t0 > args.max_seconds:
                    stop_step = i
                    print(f"# wall-clock budget {args.max_seconds:.0f}s "
                          f"exceeded; stopping at step {i}", file=sys.stderr)
                    break
        stats_steps = stop_step + 1

        (args.out / "history.json").write_text(json.dumps(history))
        save_npz(train_params, "unseen_objects")
    else:
        template = init_params(key)
        data = np.load(args.out / "unseen_objects.npz")
        leaves = [jnp.asarray(data[str(i)]) for i in range(len(data.files))]
        train_params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), leaves)

    # --------------------------------------------------------------- eval
    import unseen_eval

    budget = {"cem_samples": args.cem_samples, "cem_iters": args.cem_iters,
              "cem_elites": args.cem_elites,
              "refine_samples": args.refine_samples,
              "refine_iters": args.refine_iters}
    extra_weights = unseen_eval.extra_weights_from_args(args)

    def evaluate_object(params, shape_pool, obj_idx, cloud, n_targets,
                        tag=""):
        """Full-contract estimate on one object: encoder latent from
        reference views -> CEM coarse -> gradient refine -> ADD-S
        (tools/unseen_eval.py; oracle-rendered observations)."""
        shape = testing.index_lobe_shape(jax.device_put(shape_pool),
                                         obj_idx)
        model = LatentFusionModel(
            sculptor=sculptor, sculptor_params=params["sculptor"],
            fuser=fuser, fuser_params=params["fuser"],
            photographer=photographer,
            photographer_params=params["photographer"],
            camera_dist=CAMERA_DIST)

        ref_cams = random_full_cameras(jax.random.PRNGKey(7),
                                       args.eval_views)
        ref_obs = jax.jit(lambda c: oracle_observation(shape, c))(ref_cams)

        def make_target(k1):
            gt_cam = testing.make_camera(
                1, z=CAMERA_DIST, f=615.0, width=640, height=480,
                quats=quat.random(k1, 1))
            target = jax.jit(
                lambda c: oracle_observation(shape, c))(gt_cam)
            return gt_cam, target

        return unseen_eval.evaluate_object(
            model, ref_obs, make_target, cloud, n_targets, budget,
            extra_weights=extra_weights, diameter=DIAMETER, tag=tag)

    def evaluate_split(params, n_targets, tag=""):
        out = {"heldout": [], "train_control": []}
        for h in range(args.heldout_objects):
            rows, acc = evaluate_object(
                params, heldout_pool, h, heldout_clouds[h], n_targets,
                tag=f"{tag}[heldout {h}] ")
            out["heldout"].append({"object": h, "add_s_0.1d": acc,
                                   "targets": rows})
        rows, acc = evaluate_object(params, pool, 0, train_clouds[0],
                                    n_targets, tag=f"{tag}[train 0] ")
        out["train_control"].append({"object": 0, "add_s_0.1d": acc,
                                     "targets": rows})
        return out

    curve = []
    for s in sorted(snapshots):
        res = evaluate_split(snapshots[s], args.curve_targets,
                             tag=f"[step {s}] ")
        held = [t for o in res["heldout"] for t in o["targets"]]
        curve.append({
            "step": s,
            "heldout_add_s_0.1d": float(np.mean(
                [t["add_s_01d"] for t in held])),
            "heldout_mean_add_s": float(np.mean(
                [t["refined"]["add_s"] for t in held])),
            "heldout_mean_rotation_dist": float(np.mean(
                [t["refined"]["rotation_dist"] for t in held])),
            "train_add_s_0.1d": res["train_control"][0]["add_s_0.1d"],
            "detail": res})
        print(json.dumps({k: v for k, v in curve[-1].items()
                          if k != "detail"}), flush=True)

    res = evaluate_split(train_params, args.eval_targets)
    held = [t for o in res["heldout"] for t in o["targets"]]
    heldout_acc = float(np.mean([t["add_s_01d"] for t in held]))
    if snapshot_steps and not args.skip_train:
        curve.append({
            "step": stats_steps,
            "heldout_add_s_0.1d": heldout_acc,
            "heldout_mean_add_s": float(np.mean(
                [t["refined"]["add_s"] for t in held])),
            "heldout_mean_rotation_dist": float(np.mean(
                [t["refined"]["rotation_dist"] for t in held])),
            "train_add_s_0.1d": res["train_control"][0]["add_s_0.1d"],
            "detail": res})
        (eval_out / "scaling_curve.json").write_text(
            json.dumps(curve, indent=2))

    summary = {
        "heldout": res["heldout"],
        "train_control": res["train_control"],
        "heldout_add_s_0.1d": heldout_acc,
        "train_add_s_0.1d": res["train_control"][0]["add_s_0.1d"],
        "diameter": DIAMETER, "threshold": 0.1 * DIAMETER,
        "split": {
            "train_objects": args.train_objects,
            "train_pool_seed": args.pool_seed,
            "heldout_objects": args.heldout_objects,
            "heldout_pool_seed": args.pool_seed + 7919,
            "note": "held-out shapes come from a disjoint RNG stream: "
                    "novel lobe geometry AND novel texture, never rendered "
                    "during training",
        },
        "history": history[-5:],
        "family": args.family,
        "steps": stats_steps,
        "steps_requested": args.steps,
        "eval_views": args.eval_views,
        "search_budget": unseen_eval.search_budget_record(args),
        "trained_with": "multi-object encoder-in-the-loop distillation "
                        "(one random pool object per step; latent from "
                        "Sculptor.encode + GRUFuser via "
                        "build_latent_object)",
    }
    (eval_out / "pose_eval.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({"heldout_add_s_0.1d": heldout_acc,
                      "train_add_s_0.1d":
                          res["train_control"][0]["add_s_0.1d"]}))


if __name__ == "__main__":
    main()
