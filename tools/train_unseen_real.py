#!/usr/bin/env python
"""Unseen-object generalization on the REAL data path (VERDICT r4 missing
#1 / next #2): procedural lobe MESHES rendered by the in-repo C++
rasterizer through the synthetic training stream — random PBR-style
materials and procedural textures, random color backgrounds, per-view
light randomization, color noise, mask corruption (BASELINE config #5
conditions) — supervised with the RECONSTRUCTION objective (decode at
held-out output cameras from encoded input views; depth hard-pixel +
mask BCE — the train_reconstruct loss stack), then evaluated on HELD-OUT
objects with the standard estimator stack.

This replaces tools/train_unseen_objects.py's on-device analytic-oracle
distillation with the reference's actual training conditions
(reference datasets/training/pyrender.py:302-445 + tools/train/train.sh:
28-66): meshes -> z-buffer renders -> augmentation chain -> reconstruction
loss. The object pool is still procedural (``testing.sample_lobe_shapes``
triangulated by ``testing.lobe_shape_meshes``) so the train/held-out split
stays exactly reproducible with zero external assets.

Evaluation runs twice per held-out object:
  * ``rasterizer``: reference views AND pose targets rendered by the same
    C++ rasterizer from the held-out mesh with clean materials (the
    real-capture proxy — the pipeline that trained is the pipeline that
    estimates);
  * ``oracle``: the analytic renderer of the original rig (cross-RENDERER
    generalization: novel object and novel image formation).

Data flow: spawn loader workers own the rasterizer and stream items
through a replay ring buffer (this container has ONE host core; the
buffer lets the TPU step faster than the host renders while every sample
still originates from the rasterizer+augmentation chain — the fresh-item
rate and reuse factor are recorded in the artifact).

Run:  python tools/train_unseen_real.py --steps 60000 \
          --out artifacts/unseen_real
"""
import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
sys.path.insert(0, str(Path(__file__).parent))

CAMERA_DIST = 5.78  # == zoo.DEMO_CAMERA_DIST
DIAMETER = 1.0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=60000)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--train-objects", type=int, default=128)
    parser.add_argument("--heldout-objects", type=int, default=4)
    parser.add_argument("--pool-seed", type=int, default=0)
    parser.add_argument("--views-in", type=int, default=6)
    parser.add_argument("--views-out", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--out", type=Path,
                        default=Path("artifacts/unseen_real"))
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--family", choices=["demo", "mid", "tiny"],
                        default="demo")
    parser.add_argument("--render-width", type=int, default=256)
    parser.add_argument("--render-height", type=int, default=192)
    parser.add_argument("--workers", type=int, default=1,
                        help="loader worker processes (each owns a "
                             "rasterizer)")
    parser.add_argument("--buffer-items", type=int, default=256,
                        help="DEVICE-resident replay ring-buffer capacity "
                             "(quantized items, ~4 MB each at 256x192)")
    parser.add_argument("--chunk-steps", type=int, default=200,
                        help="train steps per compiled dispatch "
                             "(lax.fori_loop over the device buffer)")
    parser.add_argument("--min-buffer", type=int, default=24,
                        help="items required before training starts")
    parser.add_argument("--mask-noise-p", type=float, default=0.25,
                        help="mask-corruption probability "
                             "(reference train.sh: 0.25)")
    parser.add_argument("--color-noise-level", type=float, default=0.05,
                        help="reference train.sh: 0.05")
    parser.add_argument("--depth-noise-level", type=float, default=0.0)
    parser.add_argument("--depth-k", type=int, default=4096,
                        help="hard-pixel top-k for the depth loss (the "
                             "reference's 16384 at 256^2 = 25%% of pixels; "
                             "4096 is the same fraction at 128^2)")
    parser.add_argument("--max-seconds", type=float, default=0.0,
                        help="wall-clock training budget; when exceeded the "
                             "loop stops at the next 500-step boundary and "
                             "saves whatever it reached")
    parser.add_argument("--save-every", type=int, default=10000,
                        help="periodic unseen_real.npz saves so an external "
                             "timeout cannot lose the run")
    parser.add_argument("--eval-targets", type=int, default=6)
    parser.add_argument("--eval-views", type=int, default=16)
    parser.add_argument("--skip-train", action="store_true")
    parser.add_argument("--resume-npz", type=Path, default=None,
                        help="warm-start params from a previous run's "
                             "unseen_real.npz (fresh optimizer state + LR "
                             "schedule: a cosine warm restart)")
    parser.add_argument("--cem-samples", type=int, default=128)
    parser.add_argument("--cem-iters", type=int, default=10)
    parser.add_argument("--cem-elites", type=int, default=48)
    parser.add_argument("--refine-samples", type=int, default=16)
    parser.add_argument("--refine-iters", type=int, default=150)
    parser.add_argument("--rank-latent-weight", type=float, default=0.2,
                        help="latent ranking weight (reference "
                             "adam_latent: 0.2; the committed latent_rank "
                             "artifact's winning config)")
    parser.add_argument("--rank-mask-weight", type=float, default=0.0)
    parser.add_argument("--rank-iou-weight", type=float, default=0.0)
    parser.add_argument("--eval-out", type=Path, default=None)
    parser.add_argument("--assets-dir", type=Path,
                        default=Path("/tmp/lobe_real_assets"),
                        help="procedural textures/backgrounds + mesh cache "
                             "(deterministic; regenerated when missing)")
    args = parser.parse_args(argv)

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
    import optax  # noqa: F401

    import unseen_eval
    from latentfusion_tpu import dtypes, testing, zoo
    from latentfusion_tpu.data import rendering, synthetic
    from latentfusion_tpu.data.loader import (IterableLoader, collate,  # noqa: F401
                                              decode_transport)
    from latentfusion_tpu.observation import Observation
    from latentfusion_tpu.recon.inference import LatentFusionModel
    from latentfusion_tpu.three import quaternion as quat
    from latentfusion_tpu.train.step import (init_gan_train_state,
                                             make_optimizer,
                                             make_recon_train_step)

    dtypes.set_compute_dtype("bfloat16")
    args.out.mkdir(parents=True, exist_ok=True)
    eval_out = args.eval_out or args.out
    eval_out.mkdir(parents=True, exist_ok=True)

    # ----------------------------------------------------------- objects
    pool, train_clouds = testing.sample_lobe_shapes(
        args.pool_seed, args.train_objects, diameter=DIAMETER)
    heldout_pool, heldout_clouds = testing.sample_lobe_shapes(
        args.pool_seed + 7919, args.heldout_objects, diameter=DIAMETER)

    if args.family == "tiny":
        input_size = 16
        sculptor, fuser, photographer = (zoo.tiny_sculptor(),
                                         zoo.tiny_fuser(),
                                         zoo.tiny_photographer())
    elif args.family == "mid":
        input_size = zoo.MID_INPUT_SIZE
        sculptor, fuser, photographer = (zoo.mid_sculptor(), zoo.mid_fuser(),
                                         zoo.mid_photographer())
    else:
        input_size = zoo.DEMO_INPUT_SIZE
        sculptor, fuser, photographer = (zoo.demo_sculptor(),
                                         zoo.demo_fuser(),
                                         zoo.demo_photographer())

    # ------------------------------------------------- meshes + assets
    mesh_dir = args.assets_dir / f"meshes_s{args.pool_seed}" \
        f"_k{args.train_objects}"
    if not (mesh_dir / f"lobes_{args.train_objects - 1:04d}.obj").exists():
        print("# triangulating train pool...", file=sys.stderr)
        testing.lobe_shape_meshes(pool, mesh_dir)
    mesh_paths = sorted(mesh_dir.glob("lobes_*.obj"))
    heldout_mesh_dir = args.assets_dir / f"meshes_heldout_s" \
        f"{args.pool_seed + 7919}_k{args.heldout_objects}"
    if not (heldout_mesh_dir /
            f"lobes_{args.heldout_objects - 1:04d}.obj").exists():
        testing.lobe_shape_meshes(heldout_pool, heldout_mesh_dir, lat=48,
                                  lon=96)
    heldout_mesh_paths = sorted(heldout_mesh_dir.glob("lobes_*.obj"))

    tex_dir = args.assets_dir / "textures"
    if not (tex_dir / "tex_000.jpg").exists():
        print("# generating procedural textures/backgrounds...",
              file=sys.stderr)
        synthetic.make_procedural_textures(tex_dir)
    bg_dir = args.assets_dir / "backgrounds"
    if not (bg_dir / "bg_000.jpg").exists():
        synthetic.make_procedural_backgrounds(bg_dir)

    dataset = synthetic.SyntheticDataset(
        mesh_paths, num_input_views=args.views_in,
        num_output_views=args.views_out,
        width=args.render_width, height=args.render_height,
        size_jitter=(0.6, 1.0),
        random_materials=True, use_textures=True, textures_dir=tex_dir,
        color_random_background=True, color_background_dir=bg_dir,
        mask_noise_p=args.mask_noise_p,
        color_noise_level=args.color_noise_level,
        depth_noise_level=args.depth_noise_level,
        seed=args.pool_seed,
        # The reconstruction step never reads the clean input-view group
        # (reconstruct_input=False); dropping it cuts queue bytes ~30% on
        # this single-core host.
        emit_in_gt=False)

    # ------------------------------------------------------- train step
    config = {
        # train.sh recipe at 128^2 (reference tools/train/train.sh:28-66).
        "camera_dist": CAMERA_DIST, "cube_size": 1.0,
        "random_orientation": True,
        "g_depth_recon_loss_type": "hard_smooth_l1",
        "g_depth_recon_loss_weight": 25.0,
        "g_depth_recon_loss_k": args.depth_k,
        "g_mask_recon_loss_type": "binary_cross_entropy",
        "g_mask_recon_loss_weight": 25.0,
        "color_random_background": True,
        "crop_random_background": True,
        "generator_input_depth": True,
    }
    opt = make_optimizer("adam", optax.cosine_decay_schedule(
        args.lr, max(args.steps, 1), alpha=0.01))
    # Unjitted step: it runs INSIDE the chunked fori_loop below (one
    # dispatch per --chunk-steps, not per step — per-step dispatches with
    # megabyte numpy operands leak host memory on the tunneled backend;
    # an earlier 80k-step run was OOM-killed at 129 GB RSS after ~30k
    # single-step dispatches).
    step = make_recon_train_step(sculptor, fuser, photographer, opt,
                                 config=config, jit=False)

    def save_npz(train_params, path_stem):
        host = jax.device_get(train_params)
        flat = jax.tree_util.tree_leaves(host)
        np.savez(args.out / f"{path_stem}.npz", **{
            str(i): np.asarray(v) for i, v in enumerate(flat)})

    def load_npz(path, template):
        data = np.load(path)
        leaves = [jnp.asarray(data[str(i)]) for i in range(len(data.files))]
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), leaves)

    key = jax.random.PRNGKey(0)
    params = zoo.init_recon_params(key, sculptor, fuser, photographer,
                                   batch=1, views=2)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print(f"# {n_params / 1e6:.1f}M params ({args.family}) | "
          f"{args.train_objects} train meshes, {args.heldout_objects} "
          f"held out", file=sys.stderr)

    history = []
    stats = {"fresh_items": 0, "steps": 0}
    if not args.skip_train:
        from functools import partial

        if args.resume_npz is not None:
            params = load_npz(args.resume_npz, params)
            print(f"# warm-start from {args.resume_npz}", file=sys.stderr)
        state = init_gan_train_state(params, opt)

        # DEVICE-RESIDENT replay ring buffer + K-steps-per-dispatch runner.
        # The first version of this rig sampled a host-side buffer and
        # dispatched one jitted step per batch; on the tunneled backend
        # every dispatch with megabyte numpy operands leaks host memory
        # (~4 MB/step), and the 80k-step run was OOM-killed at 129 GB RSS
        # around step 30k. Keeping the quantized ring buffer in HBM
        # (uint8 color/mask + f16 depth, ~4 MB/item) means the host only
        # ships FRESH renders (~the render rate, not the step rate) and
        # the train loop runs as a lax.fori_loop of --chunk-steps steps
        # per dispatch: 80k steps = a few hundred dispatches, not 80k.
        loader = IterableLoader(dataset, batch_size=1,
                                num_workers=args.workers,
                                device_put=False, prefetch=8,
                                transport="quantized", decode=False)
        pending = []
        pend_lock = threading.Lock()
        pump_stop = threading.Event()

        def pump():
            for item in loader:
                with pend_lock:
                    pending.append(item)
                    if len(pending) > 512:  # ring buffer is the reservoir
                        pending.pop(0)
                stats["fresh_items"] += 1
                if pump_stop.is_set():
                    return

        pump_thread = threading.Thread(target=pump, daemon=True)
        pump_thread.start()
        print("# waiting for the render buffer...", file=sys.stderr)
        while True:
            with pend_lock:
                if len(pending) >= args.min_buffer:
                    break
            time.sleep(1.0)

        def strip(item):  # drop the loader's leading batch-1 axis
            return jax.tree_util.tree_map(lambda x: np.asarray(x)[0], item)

        with pend_lock:
            fresh = [strip(i) for i in pending]
            pending.clear()
        cap = args.buffer_items
        buffer = jax.tree_util.tree_map(
            lambda x: jnp.zeros((cap,) + x.shape, x.dtype), fresh[0])

        @partial(jax.jit, donate_argnums=0)
        def buffer_write(buffer, item, pos):
            return jax.tree_util.tree_map(
                lambda b, f: b.at[pos].set(f), buffer, item)

        written = 0

        def drain_pending():
            nonlocal buffer, written, fresh
            with pend_lock:
                fresh += [strip(i) for i in pending]
                pending.clear()
            for it in fresh:
                buffer = buffer_write(buffer, it, written % cap)
                written += 1
            fresh = []

        drain_pending()

        # Aux (loss-scalar) structure without tracing the full forward.
        probe_batch = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct((1,) + x.shape[1:], x.dtype),
            buffer)
        dec_shape = jax.eval_shape(decode_transport, probe_batch)
        _, aux_shape = jax.eval_shape(step, state, dec_shape,
                                      jax.random.PRNGKey(0))
        zero_aux = jax.tree_util.tree_map(
            lambda s: jnp.zeros((), jnp.float32), aux_shape)

        chunk = max(1, args.chunk_steps)

        @partial(jax.jit, donate_argnums=0)
        def run_chunk(state, buffer, filled, key):
            def body(_, carry):
                state, key, acc = carry
                key, k_idx, k_step = jax.random.split(key, 3)
                idx = jax.random.randint(k_idx, (), 0, filled)
                item = jax.tree_util.tree_map(
                    lambda b: jax.lax.dynamic_index_in_dim(
                        b, idx, axis=0, keepdims=True), buffer)
                state, aux = step(state, decode_transport(item), k_step)
                acc = jax.tree_util.tree_map(jnp.add, acc, aux)
                return (state, key, acc)

            state, key, acc = jax.lax.fori_loop(0, chunk, body,
                                                (state, key, zero_aux))
            return state, jax.tree_util.tree_map(lambda v: v / chunk, acc)

        print("# compiling chunked train loop...", file=sys.stderr)
        t0 = time.time()
        key, sub = jax.random.split(key)
        state, aux = run_chunk(state, buffer, jnp.int32(min(written, cap)),
                               sub)
        jax.block_until_ready(aux["loss/generator/total"])
        print(f"# compile+first chunk ({chunk} steps): "
              f"{time.time() - t0:.0f}s "
              f"loss={float(aux['loss/generator/total']):.3f}",
              file=sys.stderr)

        t0 = time.time()
        done = chunk
        while done < args.steps:
            drain_pending()
            key, sub = jax.random.split(key)
            state, aux = run_chunk(state, buffer,
                                   jnp.int32(min(written, cap)), sub)
            done += chunk
            row = {"step": done,
                   "loss": float(aux["loss/generator/total"]),
                   "depth": float(aux["loss/generator/depth"]),
                   "mask": float(aux["loss/generator/mask"]),
                   "fresh_items": stats["fresh_items"],
                   "steps_per_s": (done - chunk) / max(time.time() - t0,
                                                       1e-9)}
            history.append(row)
            print(f"step {done}: loss={row['loss']:.4f} "
                  f"d={row['depth']:.4f} m={row['mask']:.4f} "
                  f"fresh={row['fresh_items']} "
                  f"({row['steps_per_s']:.1f} steps/s)",
                  file=sys.stderr, flush=True)
            if args.save_every and done % args.save_every < chunk:
                save_npz(state.params, "unseen_real")
                (args.out / "history.json").write_text(json.dumps(history))
            if args.max_seconds and time.time() - t0 > args.max_seconds:
                print(f"# wall-clock budget {args.max_seconds:.0f}s "
                      f"exceeded; stopping at step {done}", file=sys.stderr)
                break
        stats["steps"] = done
        params = state.params
        # Orderly pump shutdown BEFORE loader teardown: the inline
        # (workers=0) path renders inside the pump thread, and killing a
        # daemon thread mid-rasterize at interpreter exit aborts in C++.
        pump_stop.set()
        pump_thread.join(timeout=120)
        loader.shutdown()
        (args.out / "history.json").write_text(json.dumps(history))
        save_npz(params, "unseen_real")
    else:
        params = load_npz(args.out / "unseen_real.npz", params)

    # --------------------------------------------------------------- eval
    model = LatentFusionModel(
        sculptor=sculptor, sculptor_params=params["sculptor"],
        fuser=fuser, fuser_params=params["fuser"],
        photographer=photographer,
        photographer_params=params["photographer"],
        camera_dist=CAMERA_DIST)

    budget = {"cem_samples": args.cem_samples, "cem_iters": args.cem_iters,
              "cem_elites": args.cem_elites,
              "refine_samples": args.refine_samples,
              "refine_iters": args.refine_iters}
    extra_weights = unseen_eval.extra_weights_from_args(args)

    eval_renderer = rendering.Renderer(width=640, height=480)
    intrinsic_full = np.array([[615.0, 0, 320], [0, 615.0, 240], [0, 0, 1]],
                              np.float32)

    def rasterize_observation(mesh_path, camera):
        """Render an Observation of a held-out mesh at the given cameras
        with the SAME C++ rasterizer that produced the training stream
        (clean default material — the real-capture proxy)."""
        obj, _ = rendering.load_object(mesh_path, recenter=False,
                                       resize=False)
        ctx = rendering.SceneContext(obj, intrinsic_full)
        colors, depths, masks = [], [], []
        ext = np.asarray(camera.extrinsic)
        for i in range(camera.length):
            q = np.asarray(quat.mat_to_quat(jnp.asarray(ext[i, :3, :3])))
            t = ext[i, :3, 3]
            ctx.set_pose(t, q)
            c, d, m = eval_renderer.render(ctx)
            colors.append(c.transpose(2, 0, 1))
            depths.append(d[None])
            masks.append(m[None])
        return Observation(jnp.asarray(np.stack(colors)),
                           jnp.asarray(np.stack(depths)),
                           jnp.asarray(np.stack(masks)), camera)

    def oracle_observation(shape, camera):
        depth, mask, _, lobe_onehot = testing.render_lobe_shape(camera,
                                                                shape)
        color = testing.lobe_shape_color(camera, depth, mask, lobe_onehot,
                                         shape)
        return Observation(color, depth, mask, camera)

    def evaluate(source, shape_pool, mesh_paths_, obj_idx, cloud, tag=""):
        shape = testing.index_lobe_shape(jax.device_put(shape_pool),
                                         obj_idx)
        ref_cams = zoo.random_view_cameras(jax.random.PRNGKey(7),
                                           args.eval_views)

        if source == "rasterizer":
            ref_obs = rasterize_observation(mesh_paths_[obj_idx], ref_cams)

            def make_target(k1):
                gt_cam = testing.make_camera(
                    1, z=CAMERA_DIST, f=615.0, width=640, height=480,
                    quats=quat.random(k1, 1))
                return gt_cam, rasterize_observation(mesh_paths_[obj_idx],
                                                     gt_cam)
        else:
            ref_obs = jax.jit(
                lambda c: oracle_observation(shape, c))(ref_cams)

            def make_target(k1):
                gt_cam = testing.make_camera(
                    1, z=CAMERA_DIST, f=615.0, width=640, height=480,
                    quats=quat.random(k1, 1))
                target = jax.jit(
                    lambda c: oracle_observation(shape, c))(gt_cam)
                return gt_cam, target

        return unseen_eval.evaluate_object(
            model, ref_obs, make_target, cloud, args.eval_targets, budget,
            extra_weights=extra_weights, diameter=DIAMETER,
            tag=f"{tag}[{source}] ")

    summary = {"split": {
        "train_objects": args.train_objects,
        "train_pool_seed": args.pool_seed,
        "heldout_objects": args.heldout_objects,
        "heldout_pool_seed": args.pool_seed + 7919,
        "note": "held-out meshes come from a disjoint RNG stream: novel "
                "lobe geometry, never rendered during training"},
        "search_budget": unseen_eval.search_budget_record(args),
        "family": args.family,
        "params_m": round(n_params / 1e6, 2),
        "trained_with": "REAL data path: lobe meshes -> native C++ "
                        "rasterizer -> synthetic stream (procedural "
                        "textures, random backgrounds, lights, color "
                        f"noise {args.color_noise_level}, mask corruption "
                        f"p={args.mask_noise_p}) -> reconstruction "
                        "objective (hard-pixel smooth-l1 depth "
                        f"k={args.depth_k} + mask BCE on output-camera "
                        "renders), replay ring buffer",
        "data": {"render_width": args.render_width,
                 "render_height": args.render_height,
                 "workers": args.workers,
                 "buffer_items": args.buffer_items,
                 "fresh_items": stats["fresh_items"],
                 "steps": stats["steps"],
                 "reuse_factor": (round(stats["steps"] * args.batch
                                        / max(stats["fresh_items"], 1), 2)
                                  if stats["steps"] else None)},
        "history": history[-5:]}

    for source in ("rasterizer", "oracle"):
        held = []
        for h in range(args.heldout_objects):
            rows, acc = evaluate(source, heldout_pool, heldout_mesh_paths,
                                 h, heldout_clouds[h], tag=f"[heldout {h}] ")
            held.append({"object": h, "add_s_0.1d": acc, "targets": rows})
        rows, acc = evaluate(source, pool, mesh_paths, 0, train_clouds[0],
                             tag="[train 0] ")
        hits = [t["add_s_01d"] for o in held for t in o["targets"]]
        summary[source] = {
            "heldout": held,
            "train_control": [{"object": 0, "add_s_0.1d": acc,
                               "targets": rows}],
            "heldout_add_s_0.1d": float(np.mean(hits)),
            "train_add_s_0.1d": acc}
        print(json.dumps({f"{source}_heldout_add_s_0.1d":
                          summary[source]["heldout_add_s_0.1d"],
                          f"{source}_train_add_s_0.1d": acc}), flush=True)

    summary["heldout_add_s_0.1d"] = summary["rasterizer"][
        "heldout_add_s_0.1d"]
    summary["train_add_s_0.1d"] = summary["rasterizer"]["train_add_s_0.1d"]
    summary["diameter"] = DIAMETER
    summary["threshold"] = 0.1 * DIAMETER
    (eval_out / "pose_eval.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({
        "heldout_add_s_0.1d": summary["heldout_add_s_0.1d"],
        "oracle_heldout_add_s_0.1d":
            summary["oracle"]["heldout_add_s_0.1d"]}))


if __name__ == "__main__":
    main()
