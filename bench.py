#!/usr/bin/env python
"""Benchmark: pose hypotheses/sec/chip in the gradient-refinement inner loop.

This measures the BASELINE.json north-star axis: hypothesis renders per
second through the flagship latent decoder inside the jitted
render-compare-refine loop (the reference's estimation.py:601-677 inner loop,
which interleaves Python per-hypothesis optimizers with GPU renders).

One JSON line is printed:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is measured throughput divided by an *estimated* RTX 2080 Ti
reference throughput, computed from the decoder's actual forward FLOPs
(jax cost analysis): ref = PEAK_2080TI_FP32 * UTIL / (3 * fwd_flops) —
the reference runs pose refinement in fp32 (autocast only during training,
reference: recon/models.py:199,405), fwd+bwd ~ 3x fwd, and we credit it a
generous 40% sustained utilization while ignoring its CPU<->GPU GMM/optimizer
ping-pong. >1.0 means faster than the estimated baseline; the >=5.0 goal is
the BASELINE.json target.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

PEAK_2080TI_FP32 = 13.45e12
ASSUMED_REF_UTILIZATION = 0.40


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="force CPU")
    parser.add_argument("--fp32", action="store_true",
                        help="disable bf16 conv compute")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny model (smoke test)")
    parser.add_argument("--hypotheses", type=int, default=8,
                        help="adam_quick uses 8 (reference config)")
    parser.add_argument("--objects", type=int, default=1,
                        help="gradient mode: refine N objects jointly via "
                             "estimate_batch (N x hypotheses per iter)")
    parser.add_argument("--noisy-masks", action="store_true",
                        help="full mode: corrupt the target mask with the "
                             "training mask-noise chain (MOPED real-capture "
                             "conditions, BASELINE config #4)")
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--batch", type=int, default=1,
                        help="train mode: total batch size (published "
                             "recipe: 8)")
    parser.add_argument("--batch-groups", type=int, default=1,
                        help="train mode: gradient-accumulation groups "
                             "(published recipe: 2)")
    parser.add_argument("--remat", action="store_true",
                        help="train mode: rematerialize encode/decode "
                             "(needed for the published batch at 256^2)")
    parser.add_argument("--volume-backend", default=None,
                        choices=["auto", "gather", "matmul", "pallas"],
                        help="3D warp backend A/B (transforms."
                             "set_volume_sample_backend)")
    parser.add_argument("--mode", default="gradient",
                        choices=["gradient", "cem", "full", "train"],
                        help="gradient = adam_quick refinement (fwd+bwd); "
                             "cem = cross_entropy_quick coarse search "
                             "(512 hypothesis renders/iter); full = 16-view "
                             "reconstruction + coarse + adam_slow "
                             "(seconds/object end-to-end); train = flagship "
                             "reconstruction training step (steps/s)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

    import jax.numpy as jnp

    from latentfusion_tpu import dtypes

    if not args.fp32:
        dtypes.set_compute_dtype("bfloat16")

    if args.volume_backend:
        from latentfusion_tpu import transforms

        transforms.set_volume_sample_backend(args.volume_backend)

    from latentfusion_tpu import testing, zoo
    from latentfusion_tpu.pose import estimation
    from latentfusion_tpu.pose import utils as pu
    from latentfusion_tpu.recon.inference import LatentFusionModel

    key = jax.random.PRNGKey(0)

    if args.tiny:
        photographer = zoo.tiny_photographer()
        latent_shape = (1, 1, 4, 8, 8, 8)
        input_size = 16
    else:
        photographer = zoo.flagship_photographer()
        latent_shape = (1, 1, 256, 16, 16, 16)
        input_size = zoo.FLAGSHIP_INPUT_SIZE

    camera_dist = 1.5

    # Everything below is wrapped in jit: on the tunneled TPU backend each
    # eager op is a remote-compile round trip (see .claude/skills/verify).
    @jax.jit
    def setup(key):
        cam0 = zoo.canonical_camera(1, input_size, camera_dist=camera_dist,
                                    key=jax.random.PRNGKey(3))
        z_obj = jax.random.normal(key, latent_shape) * 0.1
        return cam0, z_obj

    print("# setup...", file=sys.stderr)
    cam0, z_obj = setup(key)
    z = jnp.zeros((args.hypotheses, latent_shape[2], *latent_shape[3:]))
    print("# init params...", file=sys.stderr)
    ph_params = jax.jit(photographer.init)(
        key, z, cam0.repeat(args.hypotheses).zoom(None, input_size,
                                                  camera_dist))

    model = LatentFusionModel(
        sculptor=zoo.flagship_sculptor(input_size) if not args.tiny
        else zoo.tiny_sculptor(),
        sculptor_params={}, fuser=zoo.flagship_fuser() if not args.tiny
        else zoo.tiny_fuser(), fuser_params={},
        photographer=photographer, photographer_params=ph_params,
        camera_dist=camera_dist)
    # Avoid initializing unused encoder params for the decode-only benchmark.
    model.input_size = input_size

    # Synthetic full-frame target observation (analytic ellipsoid).
    oracle = testing.EllipsoidOracleModel(input_size=input_size,
                                          camera_dist=camera_dist)
    print("# target observation...", file=sys.stderr)
    target_obs = jax.jit(oracle.make_observation)(cam0)

    if args.mode == "full":
        return bench_full_pipeline(args, model, oracle, cam0, input_size,
                                   camera_dist)
    if args.mode == "train":
        return bench_train_step(args, input_size, camera_dist)

    if args.mode == "cem":
        # cross_entropy_quick: 128 GMM samples x 4 flips = 512 forward
        # hypothesis renders per iteration (reference config).
        est = estimation.CrossEntropyPoseEstimator(
            model=model, ranking_size=16, loss_weights={"depth": 1.0},
            num_samples=128, num_iters=args.iters, num_elites=48,
            num_gmm_components=6, learning_rate=0.9, sample_flipped=True)
        hyp_per_iter = 512
        bwd_factor = 1.0  # forward-only scoring
    else:
        # adam_quick-shaped refinement, early stop disabled for timing.
        est = estimation.GradientPoseEstimator(
            model=model, ranking_size=args.hypotheses,
            loss_weights={"depth": 1.0, "ov_depth": 0.3},
            learning_rate=0.01, num_samples=args.hypotheses,
            num_iters=args.iters, converge_threshold=-1.0,
            converge_patience=args.iters + 1, optimizer="adam")
        hyp_per_iter = args.hypotheses
        bwd_factor = 3.0  # fwd + bwd

    print("# hypothesis cameras...", file=sys.stderr)
    init_cam = jax.jit(lambda: pu.sample_cameras_with_estimate(
        args.hypotheses, cam0, key=jax.random.PRNGKey(1)))()

    # Forward FLOPs of one decode for the baseline estimate.
    zoom_cam = jax.jit(
        lambda c: c.zoom(None, input_size, camera_dist))(init_cam)
    decode_jit = jax.jit(lambda p, zo, c: model.decode_latent(zo, c)[0]["depth"])
    try:
        # Pre-compile HLO cost analysis (compiling here costs minutes on the
        # remote-compile TPU backend and is not needed for a FLOP count).
        lowered = decode_jit.lower(ph_params, z_obj, zoom_cam)
        fwd_flops_per_hyp = lowered.cost_analysis()["flops"] / args.hypotheses
    except Exception:
        # Recorded from compiled XLA cost analysis of the flagship decoder
        # (8 hypotheses, 256^2): 40.3 GFLOP per hypothesis forward.
        fwd_flops_per_hyp = 40.3e9 if not args.tiny else float("nan")

    if args.objects > 1 and args.mode == "gradient":
        # Multi-object batched refinement: every object owns a block of
        # `hypotheses` cameras; all blocks share one decoder batch.
        from latentfusion_tpu.camera import Camera
        from latentfusion_tpu.observation import Observation

        z_objs = jnp.concatenate([z_obj] * args.objects, axis=0)
        targets = Observation.collate([target_obs] * args.objects)
        batch_cams = jax.jit(lambda: Camera.cat([
            pu.sample_cameras_with_estimate(
                args.hypotheses, cam0, key=jax.random.PRNGKey(10 + i))
            for i in range(args.objects)]))()
        hyp_per_iter = args.hypotheses * args.objects

        def run_estimate():
            res = est.estimate_batch(z_objs, targets, cameras=batch_cams)
            return res[-1].translation
    else:
        def run_estimate():
            if args.mode == "cem":
                return est.estimate(z_obj, target_obs,
                                    key=jax.random.PRNGKey(2)).translation
            return est.estimate(z_obj, target_obs,
                                camera=init_cam).translation

    # Warmup (compile).
    print("# compiling refinement loop...", file=sys.stderr)
    t0 = time.time()
    jax.block_until_ready(run_estimate())
    print(f"# compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    jax.block_until_ready(run_estimate())
    elapsed = time.time() - t0

    hyp_renders = hyp_per_iter * args.iters
    hyp_per_sec = hyp_renders / elapsed

    if fwd_flops_per_hyp == fwd_flops_per_hyp:  # not nan
        ref_hyp_per_sec = (PEAK_2080TI_FP32 * ASSUMED_REF_UTILIZATION
                           / (bwd_factor * fwd_flops_per_hyp))
        vs_baseline = hyp_per_sec / ref_hyp_per_sec
    else:
        ref_hyp_per_sec = float("nan")
        vs_baseline = float("nan")

    desc = ("fwd+bwd, flagship decoder" if args.mode == "gradient"
            else "fwd scoring, flagship decoder, cem")
    if args.objects > 1 and args.mode == "gradient":
        desc += f", {args.objects} objects batched"
    print(json.dumps({
        "metric": "pose_hypotheses_per_sec_per_chip",
        "value": round(hyp_per_sec, 2),
        "unit": f"hypothesis-renders/s ({desc}, "
                f"{hyp_per_iter} hyp x {args.iters} iters)",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline == vs_baseline
        else None,
    }))
    print(f"# elapsed={elapsed:.3f}s fwd_flops/hyp={fwd_flops_per_hyp} "
          f"est_2080ti={ref_hyp_per_sec:.2f} hyp/s", file=sys.stderr)


def bench_full_pipeline(args, model, oracle, cam0, input_size, camera_dist):
    """BASELINE config #3: 16-view latent reconstruction + cross-entropy
    coarse search + adam_slow refinement; reports seconds/object."""
    import jax
    import jax.numpy as jnp

    from latentfusion_tpu import zoo
    from latentfusion_tpu.pose import estimation
    from latentfusion_tpu.pose import utils as pu

    # Real encoder params for the 16-view reconstruction.
    sculptor = model.sculptor
    fuser = model.fuser
    key = jax.random.PRNGKey(0)
    print("# init encoder params...", file=sys.stderr)
    n_views = 16
    cam_in = jax.jit(lambda: pu.sample_cameras_with_estimate(
        n_views, cam0, key=jax.random.PRNGKey(11)))()
    x = jnp.zeros((n_views, sculptor.in_channels, input_size, input_size))
    zoom_in = jax.jit(lambda c: c.zoom(None, input_size, camera_dist))(cam_in)
    model.sculptor_params = jax.jit(sculptor.init)(key, x, zoom_in)
    s = sculptor.out_size
    c = sculptor.out_channels
    model.fuser_params = jax.jit(fuser.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, n_views, c, s, s, s)), [], [],
        zoom_in)

    print("# reference observations...", file=sys.stderr)
    ref_obs = jax.jit(lambda: oracle.make_observation(cam_in))()
    target_obs = jax.jit(oracle.make_observation)(cam0)

    if args.noisy_masks:
        # MOPED-conditions variant: the real captures come with imperfect
        # segmentation masks; corrupt the target mask with the training
        # mask-noise chain (reference: pyrender.py:177-184).
        import numpy as np

        from latentfusion_tpu.augment.masks import default_mask_corruption
        from latentfusion_tpu.observation import Observation

        corrupt = default_mask_corruption()
        np.random.seed(0)
        noisy = np.stack([corrupt(np.asarray(m[0]) > 0.5)
                          for m in np.asarray(target_obs.mask)])
        target_obs = Observation(
            target_obs.color, target_obs.depth,
            jnp.asarray(noisy[:, None].astype(np.float32)),
            target_obs.camera, **target_obs.meta)

    coarse = estimation.CrossEntropyPoseEstimator(
        model=model, ranking_size=16, loss_weights={"depth": 1.0},
        num_samples=128, num_iters=10, num_elites=48, num_gmm_components=6,
        learning_rate=0.9, sample_flipped=True)
    fine = estimation.GradientPoseEstimator(
        model=model, ranking_size=16,
        loss_weights={"depth": 1.0, "ov_depth": 0.3}, learning_rate=0.01,
        num_samples=16, num_iters=150, converge_threshold=1e-6,
        converge_patience=25, optimizer="adam")

    n_obj = max(args.objects, 1)
    if n_obj > 1:
        # Amortized multi-object serving: K objects through the batched
        # coarse + fine estimators (one jitted loop each).
        from latentfusion_tpu.camera import Camera
        from latentfusion_tpu.observation import Observation

        targets = Observation.collate([target_obs] * n_obj)

        def run_object():
            z_obj = model.build_latent_object(ref_obs)
            z_objs = jnp.concatenate([z_obj] * n_obj, axis=0)
            coarse_out = coarse.estimate_batch(z_objs, targets,
                                               key=jax.random.PRNGKey(2))
            best = fine.estimate_batch(z_objs, targets,
                                       cameras=Camera.cat(coarse_out))
            return best[-1].translation
    else:
        def run_object():
            z_obj = model.build_latent_object(ref_obs)
            coarse_cams = coarse.estimate(z_obj, target_obs,
                                          key=jax.random.PRNGKey(2))
            best = fine.estimate(z_obj, target_obs, camera=coarse_cams[:16])
            return best.translation

    print("# compiling full pipeline...", file=sys.stderr)
    t0 = time.time()
    jax.block_until_ready(run_object())
    print(f"# compile+first object: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    jax.block_until_ready(run_object())
    elapsed = time.time() - t0

    unit = ("s (16-view reconstruction + cross_entropy_quick + adam_slow, "
            "flagship)")
    if args.noisy_masks:
        unit += ", corrupted target masks (MOPED conditions)"
    if n_obj > 1:
        unit += f", amortized over {n_obj} objects batched"
    print(json.dumps({
        "metric": "seconds_per_object_end_to_end",
        "value": round(elapsed / n_obj, 3),
        "unit": unit,
        "vs_baseline": None,
    }))


def bench_train_step(args, input_size, camera_dist):
    """BASELINE config #5 shape: flagship reconstruction training step
    (published recipe views: 8 input / 24 output at 256^2) on synthetic
    batch data; reports steps/sec (views-rendered/sec in stderr)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from latentfusion_tpu import zoo
    from latentfusion_tpu.train.step import (init_gan_train_state,
                                             make_optimizer,
                                             make_recon_train_step)

    v_in, v_out = (8, 24) if not args.tiny else (2, 2)
    b = args.batch
    sculptor = (zoo.flagship_sculptor(input_size) if not args.tiny
                else zoo.tiny_sculptor())
    photographer = (zoo.flagship_photographer(input_size) if not args.tiny
                    else zoo.tiny_photographer())
    fuser = zoo.flagship_fuser() if not args.tiny else zoo.tiny_fuser()

    print("# init params...", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    params = zoo.init_recon_params(key, sculptor, fuser, photographer,
                                   batch=1, views=2)
    optimizer = make_optimizer("adam", 7.5e-4)
    state = init_gan_train_state(params, optimizer)
    config = {"camera_dist": camera_dist, "random_orientation": True,
              "g_depth_recon_loss_type": "hard_smooth_l1",
              "g_depth_recon_loss_k": 16384,
              "g_depth_recon_loss_weight": 25.0,
              "g_mask_recon_loss_weight": 25.0,
              "remat": args.remat}
    step = make_recon_train_step(sculptor, fuser, photographer, optimizer,
                                 config=config,
                                 num_microbatches=args.batch_groups)

    print("# synthetic batch...", file=sys.stderr)
    rng = np.random.RandomState(0)
    w, h = 640, 480

    def group(v):
        intr = np.tile(np.asarray(
            [[615.0, 0, w / 2, 0], [0, 615.0, h / 2, 0], [0, 0, 1, 0]],
            np.float32)[None], (b, v, 1, 1))
        extr = np.tile(np.eye(4, dtype=np.float32)[None, None], (b, v, 1, 1))
        extr[..., 2, 3] = 1.5
        return {
            "render": rng.rand(b, v, 3, h, w).astype(np.float32),
            "mask": (rng.rand(b, v, h, w) > 0.5).astype(np.float32),
            "depth": rng.rand(b, v, h, w).astype(np.float32) + 1.0,
            "extrinsic": extr, "intrinsic": intr,
        }

    batch = jax.device_put({"in": group(v_in), "in_gt": group(v_in),
                            "out_gt": group(v_out)})

    # NOTE: block_until_ready can return early on the tunneled backend;
    # force a host transfer of the final scalar for honest timing.
    def sync(aux):
        return float(jax.device_get(aux["loss/generator/total"]))

    print("# compiling train step...", file=sys.stderr)
    t0 = time.time()
    state, aux = step(state, batch, key)
    sync(aux)
    print(f"# compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)

    iters = max(args.iters // 5, 3)
    t0 = time.time()
    for _ in range(iters):
        state, aux = step(state, batch, key)
    sync(aux)
    per_step = (time.time() - t0) / iters

    print(json.dumps({
        "metric": "train_steps_per_sec_per_chip",
        "value": round(1.0 / per_step, 3),
        "unit": f"steps/s (flagship recon training, batch {b}, "
                f"{v_in} in / {v_out} out views, {input_size}^2)",
        "vs_baseline": None,
    }))
    print(f"# {per_step * 1e3:.1f} ms/step = "
          f"{(v_in + v_out) * b / per_step:.1f} views/s", file=sys.stderr)


if __name__ == "__main__":
    main()
