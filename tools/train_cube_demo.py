#!/usr/bin/env python
"""Demo/evidence run: train a mid-size LatentFusion stack on synthetic
renders of one object, then run the FULL pose pipeline (latent build ->
CEM coarse -> gradient refinement -> ADD-S) with the trained decoder.

This is the trained-network counterpart of the oracle accuracy gate
(tests/test_bop_accuracy.py): every stage runs on learned weights. The
model is a 128^2-input flagship variant (same architecture family, one
fewer upsample in the image decoder); data is an in-memory pool of
rasterizer-rendered multi-view batches of a textured cube.

Writes <out>/checkpoint.pth (reference schema), <out>/history.json
(loss curve) and <out>/pose_eval.json (per-target ADD-S before/after).

Run:  python tools/train_cube_demo.py --steps 8000 --out artifacts/cube_demo
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

W, H, F = 160, 120, 120.0
CAMERA_DIST = 1.5
INPUT_SIZE = 128

SCULPTOR_IMAGE_CONFIG = (
    (32, "D", 64, "D", 96, "D", 128, "D", 256, "D", 256, "D", 256),
    (256, "U", 256, "U", 128),
)
SCULPTOR_CAMERA_CONFIG = (32, 64, 128)
SCULPTOR_OBJECT_CONFIG = (128, 128)
PHOTOGRAPHER_CAMERA_CONFIG = (128, 128)
# 2 downs + 6 ups: renders (in_size=8) x 2^(6-2) = 128^2.
PHOTOGRAPHER_IMAGE_CONFIG = (
    (128, "D", 256, "D", 256),
    (256, "U", 256, "U", 256, "U", 128, "U", 96, "U", 64, "U", 48),
)


def make_models():
    from latentfusion_tpu.recon import fusion, models

    sculptor = models.Sculptor(
        in_size=INPUT_SIZE,
        image_config=SCULPTOR_IMAGE_CONFIG,
        camera_config=SCULPTOR_CAMERA_CONFIG,
        object_config=SCULPTOR_OBJECT_CONFIG,
        projection_type="factor", cube_size=1.0, scale_mode="nearest")
    photographer = models.Photographer(
        in_size=INPUT_SIZE // 16,
        image_config=PHOTOGRAPHER_IMAGE_CONFIG,
        camera_config=PHOTOGRAPHER_CAMERA_CONFIG,
        object_config=None, projection_type="factor",
        predict_color=False, predict_depth=True, predict_mask=True,
        cube_size=1.0, scale_mode="nearest")
    fuser = fusion.GRUFuser(in_channels=128, cube_size=1.0)
    return sculptor, fuser, photographer


def make_cube_obj(tmp_dir: Path, size=0.5):
    s = size / 2
    verts = [(-s, -s, -s), (s, -s, -s), (s, s, -s), (-s, s, -s),
             (-s, -s, s), (s, -s, s), (s, s, s), (-s, s, s)]
    faces = [(1, 2, 3), (1, 3, 4), (5, 7, 6), (5, 8, 7), (1, 5, 6),
             (1, 6, 2), (2, 6, 7), (2, 7, 3), (3, 7, 8), (3, 8, 4),
             (5, 1, 4), (5, 4, 8)]
    path = tmp_dir / "cube.obj"
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")
    return path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=8000)
    parser.add_argument("--pool", type=int, default=24,
                        help="pre-rendered batch pool size")
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--views-in", type=int, default=4)
    parser.add_argument("--views-out", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--lr-cosine", action="store_true",
                        help="cosine-decay the learning rate to lr/100 over "
                             "--steps")
    parser.add_argument("--out", type=Path, default=Path("artifacts/cube_demo"))
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--eval-targets", type=int, default=4)
    parser.add_argument("--skip-train", action="store_true",
                        help="load <out>/checkpoint.pth and only eval")
    args = parser.parse_args()

    import numpy as np

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from latentfusion_tpu import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from latentfusion_tpu import dtypes, three, zoo
    from latentfusion_tpu.camera import Camera
    from latentfusion_tpu.data import rendering, synthetic
    from latentfusion_tpu.data.loader import collate
    from latentfusion_tpu.observation import Observation
    from latentfusion_tpu.pose import estimation, metrics
    from latentfusion_tpu.recon import checkpoint as ckpt
    from latentfusion_tpu.recon.inference import LatentFusionModel
    from latentfusion_tpu.three import quaternion as quat
    from latentfusion_tpu.train.step import (init_gan_train_state,
                                             make_optimizer,
                                             make_recon_train_step)

    dtypes.set_compute_dtype("bfloat16")
    args.out.mkdir(parents=True, exist_ok=True)
    mesh_path = make_cube_obj(args.out)

    sculptor, fuser, photographer = make_models()
    key = jax.random.PRNGKey(0)

    history = []
    if not args.skip_train:
        print("# rendering batch pool...", file=sys.stderr)
        ds = synthetic.SyntheticDataset(
            [mesh_path], num_input_views=args.views_in,
            num_output_views=args.views_out, width=W, height=H,
            random_materials=True, seed=0)
        ds.worker_init_fn(0)
        it = iter(ds)
        t0 = time.time()
        pool = [collate([next(it) for _ in range(args.batch)])
                for _ in range(args.pool)]
        print(f"# pool of {args.pool} batches in {time.time() - t0:.0f}s",
              file=sys.stderr)

        params = zoo.init_recon_params(key, sculptor, fuser, photographer,
                                       batch=1, views=2)
        n_params = sum(np.prod(p.shape) for p in
                       jax.tree_util.tree_leaves(params))
        print(f"# {n_params / 1e6:.1f}M params", file=sys.stderr)
        if args.lr_cosine:
            import optax

            schedule = optax.cosine_decay_schedule(
                args.lr, args.steps, alpha=0.01)
            opt = optax.adam(schedule, b1=0.0, b2=0.99)
        else:
            opt = make_optimizer("adam", args.lr)
        state = init_gan_train_state(params, opt)
        step = make_recon_train_step(
            sculptor, fuser, photographer, opt,
            config={"camera_dist": CAMERA_DIST, "random_orientation": True,
                    "remat": True,
                    "g_depth_recon_loss_type": "hard_smooth_l1",
                    "g_depth_recon_loss_k": 4096,
                    "g_depth_recon_loss_weight": 25.0,
                    "g_mask_recon_loss_weight": 25.0})

        pool_dev = [jax.device_put(b) for b in pool]
        print("# compiling train step...", file=sys.stderr)
        t0 = time.time()
        state, aux = step(state, pool_dev[0], key)
        print(f"# compile+first: {time.time() - t0:.0f}s "
              f"loss={float(aux['loss/generator/total']):.3f}",
              file=sys.stderr)

        t0 = time.time()
        for i in range(1, args.steps):
            key, sub = jax.random.split(key)
            state, aux = step(state, pool_dev[i % len(pool_dev)], sub)
            if i % 200 == 0 or i == args.steps - 1:
                loss = float(aux["loss/generator/total"])
                rate = i / (time.time() - t0)
                history.append({"step": i, "loss": loss})
                print(f"step {i}: loss={loss:.4f} ({rate:.1f} steps/s)",
                      file=sys.stderr, flush=True)

        (args.out / "history.json").write_text(json.dumps(history))
        # Reference-schema .pth checkpoint (loadable by both frameworks).
        import torch

        host_params = jax.device_get(state.params)
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
                k: torch.from_numpy(np.asarray(v))
                for k, v in ckpt.export_torch_state_dict(params_tree).items()
            }
        torch.save({"name": "cube_demo", "epoch": 0, "meter_hists": {},
                    "args": {"camera_dist": CAMERA_DIST},
                    "modules": modules}, args.out / "checkpoint.pth")
        print(f"# wrote {args.out / 'checkpoint.pth'}", file=sys.stderr)
        model = LatentFusionModel(
            sculptor, state.params["sculptor"], fuser, state.params["fuser"],
            photographer, state.params["photographer"],
            camera_dist=CAMERA_DIST)
    else:
        model = LatentFusionModel.from_checkpoint(args.out / "checkpoint.pth")

    # ------------------------------------------------------------- pose eval
    intrinsic = np.asarray([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1.0]],
                           np.float32)
    obj, _ = rendering.load_object(mesh_path, size=1.0)

    def render_obs(extrinsic):
        ctx = rendering.SceneContext(obj, intrinsic)
        ctx.set_pose_from_extrinsic(np.asarray(extrinsic))
        ctx.lights = [(np.asarray([0.0, 0.0, -2.0], np.float32),
                       np.ones(3, np.float32), 5.0)]
        color, depth, mask = rendering.Renderer(W, H).render(ctx)
        cam = Camera(intrinsic[None], np.asarray(extrinsic)[None],
                     width=W, height=H)
        return Observation(jnp.asarray(color).transpose(2, 0, 1)[None],
                           jnp.asarray(depth)[None, None],
                           jnp.asarray(mask)[None, None], cam)

    def pose(k):
        q = quat.random(k, 1)
        return np.asarray(three.to_extrinsic_matrix(
            jnp.asarray([[0.0, 0.0, CAMERA_DIST]]), q))[0]

    ref_obs = Observation.collate(
        [render_obs(pose(k))
         for k in jax.random.split(jax.random.PRNGKey(7), 8)])
    z_obj = model.build_latent_object(ref_obs)

    coarse = estimation.CrossEntropyPoseEstimator(
        model=model, ranking_size=8, loss_weights={"depth": 1.0},
        num_samples=64, num_iters=10, num_elites=24, num_gmm_components=4,
        learning_rate=0.75, sample_flipped=True)
    fine = estimation.GradientPoseEstimator(
        model=model, ranking_size=8,
        loss_weights={"depth": 1.0, "ov_depth": 0.3},  # adam_quick weights (mask=0: the reference ships no mask-weighted config; the mask term through the border-padded uncrop is pathological)
        learning_rate=0.01, num_samples=8, num_iters=100,
        converge_threshold=1e-6, converge_patience=20, optimizer="adam")

    points = jnp.asarray(obj.vertices)
    rows = []
    ek = jax.random.PRNGKey(55)
    for t in range(args.eval_targets):
        ek, k1, k2 = jax.random.split(ek, 3)
        gt_ext = pose(k1)
        target = render_obs(gt_ext)
        gt_cam = target.camera

        coarse_cams = coarse.estimate(z_obj, target, key=k2)
        best = fine.estimate(z_obj, target, camera=coarse_cams[:8])

        def add_s(c):
            return metrics.camera_metrics(gt_cam, c, points,
                                          scale_to_meters=1.0)["add_s"]

        row = {"target": t,
               "coarse_add_s": add_s(coarse_cams[0]),
               "refined_add_s": add_s(best[0]),
               "add_s_01d": bool(add_s(best[0]) < 0.1)}
        rows.append(row)
        print(f"target {t}: coarse add_s={row['coarse_add_s']:.3f} "
              f"refined={row['refined_add_s']:.3f} "
              f"0.1d={row['add_s_01d']}", flush=True)

    acc = float(np.mean([r["add_s_01d"] for r in rows]))
    summary = {"targets": rows, "add_s_0.1d": acc, "history": history[-5:]}
    (args.out / "pose_eval.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({"add_s_0.1d": acc,
                      "mean_refined_add_s": float(np.mean(
                          [r["refined_add_s"] for r in rows]))}))


if __name__ == "__main__":
    main()
