#!/usr/bin/env python
"""Benchmark: pose hypotheses/sec/chip in the gradient-refinement inner loop.

This measures the BASELINE.json north-star axis: hypothesis renders per
second through the flagship latent decoder inside the jitted
render-compare-refine loop (the reference's estimation.py:601-677 inner loop,
which interleaves Python per-hypothesis optimizers with GPU renders).

One JSON line is printed:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

FLOPs accounting (rewritten round 3 — VERDICT r2 found the old model
physically impossible):

* Two distinct FLOPs bases are probed per mode, both from the
  **post-optimization compiled executable at the benchmark's actual
  batch** (``jit(f).lower(...).compile().cost_analysis()``), never from
  pre-optimization HLO at a different batch:

  - ``tpu mix``: the per-iteration work this framework actually executes
    (incl. the one-hot MXU sampling matmuls, and fwd+bwd for gradient
    mode). Used only for the achieved-TF/s / %-of-peak sanity line — it
    must never exceed the chip's bf16 peak.
  - ``reference mix``: the same decode+loss compiled with the *gather*
    volume backend (plain convs + 8-tap trilinear lerp — the op mix the
    reference's ``F.grid_sample`` executes, reference:
    modules/geometry.py:16-17, recon/models.py:397-453), forward only.
    This is the basis for crediting the 2080 Ti baseline; it excludes the
    deliberately FLOP-inflated one-hot matmuls that only exist here.

* ``vs_baseline`` = measured hyp/s divided by an *estimated* RTX 2080 Ti
  reference throughput: ref = PEAK_2080TI_FP32 * UTIL / (bwd_factor *
  ref_mix_fwd_flops_per_hyp). The reference runs pose refinement in fp32
  (autocast only during training, reference: recon/models.py:199,405),
  fwd+bwd ~ 3x fwd, and we credit it a generous 40% sustained utilization
  while ignoring its CPU<->GPU GMM/optimizer ping-pong. >1.0 means faster
  than the estimated baseline; the >=5.0 goal is the BASELINE.json target.

* Timing ends with a forced host transfer of a result scalar (not just
  ``block_until_ready``, which can lie on the tunneled TPU backend).

``--json-out PATH`` appends a full accounting record (both FLOPs bases,
elapsed, cold-compile seconds, device) as one JSON line to PATH — the
per-round artifact (artifacts/bench_r3.json).
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

PEAK_2080TI_FP32 = 13.45e12
ASSUMED_REF_UTILIZATION = 0.40

# bf16 systolic-array peak by device_kind, for the %-of-peak sanity line.
TPU_BF16_PEAK = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _compiled_flops(fn, args_, label, dead_pallas_tags=()):
    """FLOPs of the optimized executable at the actual batch.

    ``lowered.cost_analysis()`` (what round <=2 used) reports
    *pre-optimization* HLO flops; after XLA hoists hypothesis-invariant
    work (e.g. the object-space conv blocks on the shared latent) out and
    CSEs the rest, the executed count at a large hypothesis batch is much
    lower per hypothesis. Only the compiled executable's count is honest.

    Pallas custom calls report 0 FLOPs to ``cost_analysis``, so the fused
    sampler's work is added back from its trace-time analytic count
    (ops/pallas_fused_sample.record_flops). ``dead_pallas_tags`` names
    kernels the caller knows XLA DCEs for its differentiation pattern
    (``fused_bwd_vol`` in pose refinement: the volume is a constant, and
    the vol-cotangent kernel is a separate pallas_call feeding only that
    dead output).
    """
    import jax

    from latentfusion_tpu.ops.pallas_fused_sample import record_flops

    try:
        t0 = time.time()
        with record_flops() as pallas_trace:
            compiled = jax.jit(fn).lower(*args_).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
        pallas_flops = sum(f for tag, f in pallas_trace
                           if tag not in dead_pallas_tags)
        msg = f"# flops probe [{label}]: {flops / 1e9:.2f} GF"
        if pallas_flops:
            msg += (f" + {pallas_flops / 1e9:.2f} GF pallas-analytic "
                    f"({len(pallas_trace)} kernels traced)")
        print(msg + f" (compile {time.time() - t0:.1f}s)", file=sys.stderr)
        return flops + pallas_flops
    except Exception as exc:  # pragma: no cover - backend-dependent
        print(f"# flops probe [{label}] failed: {exc!r}", file=sys.stderr)
        return float("nan")


def _sync_scalar(x):
    """Force a host transfer — honest end-of-timing on the tunneled
    backend (block_until_ready alone can return early there)."""
    import jax
    import numpy as np

    jax.block_until_ready(x)
    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "ravel")]
    return float(np.asarray(jax.device_get(leaves[0])).ravel()[0])


def _append_json(path, record):
    if not path:
        return
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def _knobs(args):
    """Every flag that changes what a mode measures — recorded in each
    JSON record so the per-round artifact is self-describing."""
    return {"fp32": bool(args.fp32), "objects": args.objects,
            "refine_remat": bool(args.refine_remat),
            "refine_unroll": args.refine_unroll,
            "layout": args.layout,
            "volume_backend": args.volume_backend,
            "lrelu_pnorm_backend": args.lrelu_pnorm_backend,
            "compiler_options": args.compiler_option or None}


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
    parser.add_argument("--iters", type=int, default=100,
                        help="loop iterations (adam_quick runs 100, "
                             "reference: configs/adam_quick.toml)")
    parser.add_argument("--batch", type=int, default=1,
                        help="train mode: total batch size (published "
                             "recipe: 8)")
    parser.add_argument("--batch-groups", type=int, default=1,
                        help="train mode: gradient-accumulation groups "
                             "(published recipe: 2)")
    parser.add_argument("--real-data", action="store_true",
                        help="train mode: pull batches from the REAL "
                             "synthetic-render loader (spawn workers + "
                             "procedural meshes) instead of a fixed random "
                             "batch — measures end-to-end steps/s incl. "
                             "the data pipeline")
    parser.add_argument("--loader-workers", type=int, default=4,
                        help="--real-data: loader worker processes")
    parser.add_argument("--transport", choices=["quantized"], default=None,
                        help="--real-data: loader transport codec")
    parser.add_argument("--remat", action="store_true",
                        help="train mode: rematerialize encode/decode "
                             "(needed for the published batch at 256^2)")
    parser.add_argument("--layout", default=None,
                        choices=["auto", "torch", "channels_last", "hybrid"],
                        help="decoder-internal activation layout A/B "
                             "(layout.set_decode_layout; auto = "
                             "channels-last on TPU)")
    parser.add_argument("--json-out", default=None,
                        help="append the full accounting record as one JSON "
                             "line to this file (per-round artifact)")
    parser.add_argument("--skip-breakdown", action="store_true",
                        help="skip the warm per-phase breakdown in full "
                             "mode (it reruns the warm pipeline, roughly "
                             "doubling wall-clock for large --objects runs)")
    parser.add_argument("--skip-flops-probe", action="store_true",
                        help="skip the compiled-executable FLOPs probes "
                             "(vs_baseline and %%-peak become null)")
    parser.add_argument("--volume-backend", default=None,
                        choices=["auto", "gather", "matmul", "pallas", "taps",
                                 "fused"],
                        help="3D warp backend A/B (transforms."
                             "set_volume_sample_backend)")
    parser.add_argument("--lrelu-pnorm-backend", default=None,
                        choices=["xla", "pallas", "unfused"],
                        help="fused leaky_relu+PixelNorm backend A/B "
                             "(modules.set_lrelu_pnorm_backend)")
    parser.add_argument("--compiler-option", action="append", default=[],
                        metavar="KEY=VAL",
                        help="per-compile XLA option for the hot estimator "
                             "loops (repeatable; e.g. "
                             "xla_tpu_scoped_vmem_limit_kib=65536). The "
                             "only way to reach server-side TPU compiler "
                             "knobs on tunneled backends, where XLA_FLAGS "
                             "is parsed locally and aborts on TPU-only "
                             "flags (dtypes.set_compiler_options)")
    parser.add_argument("--refine-remat", action="store_true",
                        help="rematerialize the refinement decode in the "
                             "backward (estimation.set_refine_remat)")
    parser.add_argument("--refine-unroll", type=int, default=1,
                        help="unroll the refinement while-body N iterations "
                             "per loop step (bit-exact masked unroll; "
                             "estimation.set_refine_unroll)")
    parser.add_argument("--mode", default="gradient",
                        choices=["gradient", "cem", "full", "full-acc",
                                 "train"],
                        help="gradient = adam_quick refinement (fwd+bwd); "
                             "cem = cross_entropy_quick coarse search "
                             "(128 hypothesis renders/iter); full = 16-view "
                             "reconstruction + coarse + adam_slow "
                             "(seconds/object end-to-end); full-acc = same "
                             "pipeline on the committed LEARNED demo-scale "
                             "checkpoint, reporting s/object AND the ADD-S "
                             "it achieves in one record (BASELINE.json's "
                             "actual metric); train = flagship "
                             "reconstruction training step (steps/s)")
    parser.add_argument("--acc-checkpoint", default=None,
                        help="learned demo-scale params npz for --mode "
                             "full-acc (default: the committed checkpoint "
                             "matching --acc-object)")
    parser.add_argument("--acc-targets", type=int, default=6,
                        help="pose targets to estimate+gate in --mode "
                             "full-acc")
    parser.add_argument("--acc-object", default="ellipsoid",
                        choices=["ellipsoid", "heldout-lobe"],
                        help="full-acc target object: 'ellipsoid' = the "
                             "encoder-distill training object; "
                             "'heldout-lobe' = a multi-lobe object from the "
                             "unseen-objects rig's DISJOINT seed stream, "
                             "never rendered while training that checkpoint "
                             "(s/object at accuracy on a NOVEL object). The "
                             "held-out seed is read from the checkpoint's "
                             "sibling pose_eval.json split block when "
                             "present (else pool_seed=0 is assumed, i.e. "
                             "held-out stream 7919 — the committed "
                             "checkpoints' convention)")
    parser.add_argument("--rank-latent-weight", type=float, default=0.0,
                        help="full-acc: latent cosine-distance weight added "
                             "to both estimators' loss (the reference's "
                             "flip-basin disambiguator, adam_latent: 0.2)")
    parser.add_argument("--rank-mask-weight", type=float, default=0.0,
                        help="full-acc: mask BCE ranking weight")
    parser.add_argument("--rank-iou-weight", type=float, default=0.0,
                        help="full-acc: IoU ranking weight")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from latentfusion_tpu import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp

    from latentfusion_tpu import dtypes

    if not args.fp32:
        dtypes.set_compute_dtype("bfloat16")

    if args.compiler_option:
        dtypes.set_compiler_options(dict(
            kv.split("=", 1) for kv in args.compiler_option))

    if args.mode == "full-acc":
        return bench_full_at_accuracy(args)

    if args.volume_backend:
        from latentfusion_tpu import transforms

        transforms.set_volume_sample_backend(args.volume_backend)

    if args.layout:
        from latentfusion_tpu import layout

        layout.set_decode_layout(args.layout)

    if args.lrelu_pnorm_backend:
        from latentfusion_tpu import modules

        modules.set_lrelu_pnorm_backend(args.lrelu_pnorm_backend)

    from latentfusion_tpu import testing, zoo
    from latentfusion_tpu.pose import estimation
    from latentfusion_tpu.pose import utils as pu

    if args.refine_remat:
        estimation.set_refine_remat(True)
    if args.refine_unroll != 1:
        estimation.set_refine_unroll(args.refine_unroll)
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
        # cross_entropy_quick: num_samples=128 TOTAL renders per iteration.
        # With sample_flipped the reference draws num_samples//4 = 32 from
        # the GMM and appends 3 axis-flipped copies — flips are part OF the
        # 128, not on top of it (reference: estimation.py:378-389).
        # NOTE (round-3 correction): earlier rounds published CEM rates
        # computed with hyp_per_iter=512 — a 4x overcount of the actual
        # renders; those numbers (r2 "3700-4000", r3 "6773") are inflated
        # 4x and superseded by this accounting.
        est = estimation.CrossEntropyPoseEstimator(
            model=model, ranking_size=16, loss_weights={"depth": 1.0},
            num_samples=128, num_iters=args.iters, num_elites=48,
            num_gmm_components=6, learning_rate=0.9, sample_flipped=True)
        hyp_per_iter = 128
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

    # ---- FLOPs accounting (see module docstring). Probed per mode at the
    # mode's ACTUAL hypothesis batch, from the compiled executable.
    from latentfusion_tpu import transforms

    def fwd_score_sum(z, tgt, cam):
        loss, _ = est._score_hypotheses(z, tgt, cam)
        return loss.sum()

    if args.mode == "cem":
        # The CEM body renders hyp_per_iter (=num_samples) fresh cameras
        # per iteration and scores them forward-only. Probe the score at
        # the ACTUAL render batch directly. (An earlier probe lax.map'd
        # over 64-hyp chunks to bound the one-hot tap matrix; XLA's
        # cost_analysis counts a loop body ONCE regardless of trip count,
        # so that probe under-reported flops 8x — round-3 audit.)
        probe_cam = jax.jit(lambda: pu.sample_cameras_with_estimate(
            hyp_per_iter, cam0, key=jax.random.PRNGKey(7)))()
        probe_iter_fn, probe_iter_args = (
            fwd_score_sum, (z_obj, target_obs, probe_cam))
        probe_note = (f"fwd score at {hyp_per_iter} hyp "
                      "(GMM EM excluded)")
    else:
        # The gradient body differentiates decode+loss w.r.t. the camera
        # params; the adam/plateau/ranking updates are O(N*10) and omitted.
        zoom_probe_cam = jax.jit(
            lambda c: c.zoom(None, input_size, camera_dist))(init_cam)
        params0 = pu.camera_params(zoom_probe_cam, optimize_viewport=True)

        def grad_iter(params, z, tgt):
            def loss_fn(p):
                cam = zoom_probe_cam.replace(**p)
                z_depth, _, z_mask_logits, z_lat = est._render_zoomed(z, cam)
                ld = est.loss_func(tgt, z_depth, z_mask_logits, cam,
                                   z_pred_latent=z_lat)
                return sum(estimation.weigh_losses(
                    ld, est.loss_weights).values()).sum()

            return jax.grad(loss_fn)(params)

        probe_iter_fn, probe_iter_args = grad_iter, (params0, z_obj,
                                                     target_obs)
        probe_note = (f"fwd+bwd decode+loss at {args.hypotheses} hyp "
                      "(adam/ranking updates excluded)")

    if args.skip_flops_probe:
        tpu_flops_per_hyp = float("nan")
        ref_flops_per_hyp = float("nan")
    else:
        n_probe = hyp_per_iter if args.mode == "cem" else args.hypotheses
        # In gradient mode only the camera params are differentiated; the
        # latent volume is constant, so the fused sampler's vol-cotangent
        # kernel is DCE'd and must not be counted.
        dead = ("fused_bwd_vol",) if args.mode == "gradient" else ()
        tpu_flops_per_hyp = _compiled_flops(
            probe_iter_fn, probe_iter_args,
            f"{args.mode} tpu mix: {probe_note}",
            dead_pallas_tags=dead) / n_probe
        # Reference op mix: identical decode+loss, forward-only, with the
        # gather volume backend (convs + 8-tap trilinear lerp; no one-hot
        # matmuls). This is what the 2080 Ti is credited with.
        prev_backend = transforms.get_volume_sample_backend()
        transforms.set_volume_sample_backend("gather")
        try:
            ref_cam = (probe_cam if args.mode == "cem" else init_cam)
            ref_flops_per_hyp = _compiled_flops(
                fwd_score_sum, (z_obj, target_obs, ref_cam),
                f"{args.mode} reference mix: gather fwd at "
                f"{ref_cam.length} hyp") / ref_cam.length
        finally:
            transforms.set_volume_sample_backend(prev_backend)

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
    _sync_scalar(run_estimate())
    cold_s = time.time() - t0
    print(f"# compile+first run: {cold_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    _sync_scalar(run_estimate())
    elapsed = time.time() - t0

    hyp_renders = hyp_per_iter * args.iters
    hyp_per_sec = hyp_renders / elapsed

    if ref_flops_per_hyp == ref_flops_per_hyp:  # not nan
        ref_hyp_per_sec = (PEAK_2080TI_FP32 * ASSUMED_REF_UTILIZATION
                           / (bwd_factor * ref_flops_per_hyp))
        vs_baseline = hyp_per_sec / ref_hyp_per_sec
    else:
        ref_hyp_per_sec = float("nan")
        vs_baseline = float("nan")

    # Achieved-TF/s sanity line (tpu mix). Must never exceed the chip's
    # bf16 peak — that was VERDICT r2's smoking gun for the old model.
    device_kind = jax.devices()[0].device_kind
    peak = TPU_BF16_PEAK.get(device_kind)
    achieved_tflops = hyp_per_sec * tpu_flops_per_hyp / 1e12
    if achieved_tflops == achieved_tflops:
        pct = (100.0 * achieved_tflops * 1e12 / peak) if peak else None
        print(f"# achieved {achieved_tflops:.1f} TF/s (tpu mix, "
              f"{tpu_flops_per_hyp / 1e9:.2f} GF/hyp)"
              + (f" = {pct:.1f}% of {device_kind} bf16 peak" if peak else ""),
              file=sys.stderr)
        if peak and achieved_tflops * 1e12 > peak:
            print("# WARNING: implied TF/s exceeds peak — FLOPs model or "
                  "timing is wrong; do not publish this number",
                  file=sys.stderr)
    else:
        pct = None

    family = "tiny decoder" if args.tiny else "flagship decoder"
    desc = (f"fwd+bwd, {family}" if args.mode == "gradient"
            else f"fwd scoring, {family}, cem")
    if args.objects > 1 and args.mode == "gradient":
        desc += f", {args.objects} objects batched"
    vs_ok = vs_baseline == vs_baseline
    print(json.dumps({
        "metric": "pose_hypotheses_per_sec_per_chip",
        "value": round(hyp_per_sec, 2),
        "unit": f"hypothesis-renders/s ({desc}, "
                f"{hyp_per_iter} hyp x {args.iters} iters)",
        "vs_baseline": round(vs_baseline, 3) if vs_ok else None,
    }))
    print(f"# elapsed={elapsed:.3f}s ref_mix_fwd={ref_flops_per_hyp / 1e9:.2f}"
          f" GF/hyp est_2080ti={ref_hyp_per_sec:.2f} hyp/s", file=sys.stderr)
    _append_json(args.json_out, {
        "mode": args.mode, "metric": "pose_hypotheses_per_sec_per_chip",
        "value": round(hyp_per_sec, 2), "hyp_per_iter": hyp_per_iter,
        "iters": args.iters, "elapsed_s": round(elapsed, 3),
        "cold_compile_s": round(cold_s, 1),
        "device_kind": device_kind,
        "knobs": _knobs(args),
        "tpu_mix_flops_per_hyp": (None if tpu_flops_per_hyp
                                  != tpu_flops_per_hyp
                                  else round(tpu_flops_per_hyp)),
        "ref_mix_fwd_flops_per_hyp": (None if ref_flops_per_hyp
                                      != ref_flops_per_hyp
                                      else round(ref_flops_per_hyp)),
        "achieved_tflops_tpu_mix": (None if achieved_tflops
                                    != achieved_tflops
                                    else round(achieved_tflops, 1)),
        "pct_of_bf16_peak": None if pct is None else round(pct, 1),
        "baseline_model": {
            "gpu": "RTX 2080 Ti", "peak_fp32": PEAK_2080TI_FP32,
            "assumed_utilization": ASSUMED_REF_UTILIZATION,
            "bwd_factor": bwd_factor,
            "flops_basis": "reference op mix (gather fwd), compiled "
                           "executable at actual batch"},
        "est_2080ti_hyp_per_sec": (None if ref_hyp_per_sec
                                   != ref_hyp_per_sec
                                   else round(ref_hyp_per_sec, 2)),
        "vs_baseline": round(vs_baseline, 3) if vs_ok else None,
    })


def bench_full_at_accuracy(args):
    """BASELINE.json's actual metric — seconds/object end-to-end AT ADD(-S)
    accuracy (VERDICT r3 next #5). Runs the config-#3 pipeline (16-view
    latent build by the ENCODER + cross_entropy_quick coarse search +
    adam_slow refinement; reference: inference.py:73-84, configs/
    cross_entropy_quick.toml, configs/adam_slow.toml) on a committed
    learned demo-scale checkpoint and reports warm s/object AND the ADD-S
    gate the very same runs achieve, in one record. --acc-object picks the
    target: the encoder-distill ellipsoid (in-distribution) or a held-out
    multi-lobe object the unseen-objects checkpoint NEVER saw in training
    (speed at accuracy on a novel object — the paper's headline setting)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from latentfusion_tpu import testing, zoo
    from latentfusion_tpu.pose import estimation, metrics
    from latentfusion_tpu.recon.inference import LatentFusionModel
    from latentfusion_tpu.three import orientation
    from latentfusion_tpu.three import quaternion as quat

    input_size = zoo.DEMO_INPUT_SIZE
    camera_dist = zoo.DEMO_CAMERA_DIST

    sculptor = zoo.demo_sculptor()
    fuser = zoo.demo_fuser()
    photographer = zoo.demo_photographer()
    print("# init param template + load checkpoint...", file=sys.stderr)
    template = zoo.init_recon_params(jax.random.PRNGKey(0), sculptor, fuser,
                                     photographer, batch=1, views=2)
    checkpoint = args.acc_checkpoint or {
        "ellipsoid": "artifacts/encoder_distill/encoder_distill.npz",
        "heldout-lobe": "artifacts/unseen_objects/unseen_objects.npz",
    }[args.acc_object]
    params = zoo.load_params_npz(checkpoint, template)
    model = LatentFusionModel(
        sculptor=sculptor, sculptor_params=params["sculptor"],
        fuser=fuser, fuser_params=params["fuser"],
        photographer=photographer,
        photographer_params=params["photographer"],
        camera_dist=camera_dist)

    if args.acc_object == "heldout-lobe":
        # Held-out object 0 of the unseen-objects rig. The rig derives the
        # held-out stream as pool_seed + 7919 (tools/train_unseen_objects.py);
        # shape i of a stream is identical regardless of how many shapes are
        # drawn. To keep the "never seen in training" guarantee for
        # non-default checkpoints, read the recorded split from the
        # checkpoint's sibling pose_eval.json when it exists (ADVICE r4 #2).
        heldout_seed = 7919  # == pool_seed 0 + 7919, committed convention
        split_file = Path(checkpoint).parent / "pose_eval.json"
        if split_file.exists():
            try:
                split = json.loads(split_file.read_text()).get("split", {})
                heldout_seed = int(split.get(
                    "heldout_pool_seed",
                    split.get("train_pool_seed", 0) + 7919))
            except (ValueError, KeyError, TypeError) as exc:
                print(f"# split read failed ({exc!r}); assuming "
                      f"pool_seed=0", file=sys.stderr)
        print(f"# held-out seed stream: {heldout_seed}", file=sys.stderr)
        pool, clouds = testing.sample_lobe_shapes(heldout_seed, 1)
        shape = testing.index_lobe_shape(jax.device_put(pool), 0)
        oracle = testing.MultiLobeOracleModel(shape, input_size=input_size,
                                              camera_dist=camera_dist)
        points = jnp.asarray(clouds[0])
        diameter = 1.0
    else:
        axes = (0.21, 0.36, 0.5)  # the checkpoint's training object
        diameter = 2 * max(axes)
        oracle = testing.EllipsoidOracleModel(
            input_size=input_size, camera_dist=camera_dist, axes=axes)
        dirs = np.asarray(orientation.evenly_distributed_points(512))
        points = jnp.asarray(dirs * np.asarray(axes))
    ref_cams = zoo.random_view_cameras(jax.random.PRNGKey(7), 16)
    print("# reference observations...", file=sys.stderr)
    ref_obs = jax.jit(lambda c: oracle.make_observation(c, shaded=True))(
        ref_cams)

    extra_weights = {
        k: w for k, w in (("latent", args.rank_latent_weight),
                          ("mask", args.rank_mask_weight),
                          ("iou", args.rank_iou_weight)) if w > 0.0}
    coarse = estimation.CrossEntropyPoseEstimator(
        model=model, num_gmm_components=6, sample_flipped=True,
        num_samples=128, num_iters=10, num_elites=48, learning_rate=0.75,
        loss_weights={"depth": 1.0, **extra_weights}, ranking_size=16)
    fine = estimation.GradientPoseEstimator(
        model=model, ranking_size=8,
        loss_weights={"depth": 1.0, "ov_depth": 0.3, **extra_weights},
        learning_rate=0.01,
        num_samples=16, num_iters=150, converge_threshold=1e-6,
        converge_patience=25, optimizer="adam")

    corrupt = None
    if args.noisy_masks:
        # MOPED conditions AT accuracy (VERDICT r4 next #3, BASELINE config
        # #4): real captures come with imperfect segmentation; corrupt the
        # TARGET mask with the training mask-noise chain (reference:
        # augment/masks.py:178-283, train.sh mask-noise p=0.25) and add
        # depth sensor noise, THEN estimate on the learned checkpoint.
        from latentfusion_tpu.augment import add_depth_noise
        from latentfusion_tpu.augment.masks import default_mask_corruption
        from latentfusion_tpu.observation import Observation

        corrupt = default_mask_corruption()
        np.random.seed(0)
        import random as _pyrandom  # add_depth_noise draws its std from
        _pyrandom.seed(0)           # the stdlib RNG (augment/__init__.py)

        def corrupt_target(target):
            noisy = np.stack([corrupt(np.asarray(m[0]) > 0.5)
                              for m in np.asarray(target.mask)])
            depth = np.stack([add_depth_noise(np.asarray(d[0]), 0.01)
                              for d in np.asarray(target.depth)])
            return Observation(
                target.color, jnp.asarray(depth[:, None]),
                jnp.asarray(noisy[:, None].astype(np.float32)),
                target.camera, **target.meta)

    def run_object(gt_key, est_key):
        gt_cam = testing.make_camera(1, z=camera_dist, f=615.0, width=640,
                                     height=480,
                                     quats=quat.random(gt_key, 1))
        target = jax.jit(oracle.make_observation)(gt_cam)
        if corrupt is not None:
            target = corrupt_target(target)
        z_obj = model.build_latent_object(ref_obs)
        coarse_cams = coarse.estimate(z_obj, target, key=est_key)
        best = fine.estimate(z_obj, target, camera=coarse_cams[:16])
        jax.block_until_ready(best.translation)
        return gt_cam, best

    rows = []
    warm_times = []
    ek = jax.random.PRNGKey(55)
    print("# running targets (first is cold: jit compiles)...",
          file=sys.stderr)
    for t in range(max(args.acc_targets, 2)):
        ek, k1, k2 = jax.random.split(ek, 3)
        t0 = time.time()
        gt_cam, best = run_object(k1, k2)
        dt = time.time() - t0
        m = metrics.camera_metrics(gt_cam, best[0], points,
                                   scale_to_meters=1.0)
        add_s = float(m["add_s"])
        row = {"target": t, "add_s": round(add_s, 5),
               "add_s_01d": bool(add_s < 0.1 * diameter),
               "seconds": round(dt, 3), "cold": t == 0}
        rows.append(row)
        if t > 0:
            warm_times.append(dt)
        print(f"# target {t}: {dt:.2f}s add_s={add_s:.4f} "
              f"0.1d={row['add_s_01d']}", file=sys.stderr, flush=True)

    acc = float(np.mean([r["add_s_01d"] for r in rows]))
    warm = float(np.mean(warm_times))
    record = {
        "metric": "seconds_per_object_end_to_end_at_accuracy",
        "value": round(warm, 3),
        "unit": ("s/object warm (16-view ENCODER latent build + "
                 "cross_entropy_quick + adam_slow, learned demo-scale "
                 "checkpoint"
                 + (", HELD-OUT object never seen in training"
                    if args.acc_object == "heldout-lobe" else "")
                 + (", latent ranking " + str(args.rank_latent_weight)
                    if args.rank_latent_weight > 0.0 else "")
                 + (", CORRUPTED target mask+depth (MOPED conditions)"
                    if args.noisy_masks else "")
                 + f") at ADD-S 0.1d = {acc:.2f} over {len(rows)} targets"),
        "vs_baseline": None,
        "add_s_0.1d": acc,
        "mean_add_s": round(float(np.mean([r["add_s"] for r in rows])), 5),
    }
    print(json.dumps(record))
    _append_json(args.json_out, {
        "mode": "full-acc", **record, "targets": rows,
        "checkpoint": str(checkpoint), "object": args.acc_object,
        "rank_weights": extra_weights, "noisy_masks": bool(args.noisy_masks),
        "cold_compile_plus_first_object_s": rows[0]["seconds"],
        "device_kind": jax.devices()[0].device_kind,
        "knobs": _knobs(args)})


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
    _sync_scalar(run_object())
    cold_s = time.time() - t0
    print(f"# compile+first object: {cold_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    _sync_scalar(run_object())
    elapsed = time.time() - t0

    # Warm per-phase breakdown (VERDICT r2 item 6): time latent build /
    # coarse CEM / gradient refinement separately with a host sync between
    # phases. Phase syncs add a little dispatch latency, so the breakdown
    # run is timed independently of the headline number above. It reruns
    # the whole warm pipeline (~doubles warm wall-clock), so large
    # --objects runs can skip it with --skip-breakdown (ADVICE r3).
    breakdown = None
    if not args.skip_breakdown:
        def _sync_tree(tree):
            jax.block_until_ready(tree)
            return tree

        t0 = time.time()
        z_obj = _sync_tree(model.build_latent_object(ref_obs))
        t_latent = time.time() - t0
        if n_obj > 1:
            z_objs = jnp.concatenate([z_obj] * n_obj, axis=0)
            t0 = time.time()
            coarse_out = _sync_tree(coarse.estimate_batch(
                z_objs, targets, key=jax.random.PRNGKey(2)))
            t_coarse = time.time() - t0
            t0 = time.time()
            _sync_tree(fine.estimate_batch(z_objs, targets,
                                           cameras=Camera.cat(coarse_out)))
            t_fine = time.time() - t0
        else:
            t0 = time.time()
            coarse_cams = _sync_tree(coarse.estimate(
                z_obj, target_obs, key=jax.random.PRNGKey(2)))
            t_coarse = time.time() - t0
            t0 = time.time()
            _sync_tree(fine.estimate(z_obj, target_obs,
                                     camera=coarse_cams[:16]))
            t_fine = time.time() - t0
        breakdown = {"latent_build_s": round(t_latent / n_obj, 3),
                     "coarse_cem_s": round(t_coarse / n_obj, 3),
                     "gradient_refine_s": round(t_fine / n_obj, 3)}
        print(f"# warm phase breakdown (s/object): {breakdown}",
              file=sys.stderr)

    unit = ("s (16-view reconstruction + cross_entropy_quick + adam_slow, "
            "flagship, warm jit cache)")
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
    _append_json(args.json_out, {
        "mode": "full", "metric": "seconds_per_object_end_to_end",
        "value": round(elapsed / n_obj, 3), "objects": n_obj,
        "knobs": _knobs(args),
        "cold_compile_plus_first_object_s": round(cold_s, 1),
        "warm_phase_breakdown_s_per_object": breakdown,
        "noisy_masks": bool(args.noisy_masks),
        "device_kind": jax.devices()[0].device_kind,
        "note": "warm-cache steady state; cold first object includes jit "
                "compilation (amortized by the persistent compilation "
                "cache across processes)"})


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

    loader_it = None
    loader = None
    if args.real_data:
        # End-to-end: batches stream from the actual render loader (the
        # fixed-random-batch path measures device compute only).
        import tempfile

        from latentfusion_tpu.data.loader import IterableLoader
        from latentfusion_tpu.data.synthetic import (SyntheticDataset,
                                                     make_procedural_blobs)

        paths = make_procedural_blobs(tempfile.mkdtemp(), n_objs=4)
        ds = SyntheticDataset(paths, num_input_views=v_in,
                              num_output_views=v_out, width=w, height=h,
                              random_materials=True)
        loader = IterableLoader(ds, batch_size=b,
                                num_workers=args.loader_workers,
                                transport=args.transport)
        loader_it = iter(loader)
        print(f"# real-data loader: {args.loader_workers} workers, "
              f"transport={args.transport or 'f32'}", file=sys.stderr)
        batch = next(loader_it)
    else:
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
    cold_s = time.time() - t0
    print(f"# compile+first step: {cold_s:.1f}s", file=sys.stderr)

    iters = max(args.iters // 5, 3)
    if loader_it is not None:
        # Workers filled the prefetch queue during the minutes-long cold
        # compile; drain that backlog so the timed loop measures the
        # steady-state production rate, not buffered renders.
        print("# draining prefetch backlog...", file=sys.stderr)
        for _ in range(loader.prefetch + 1):
            next(loader_it)
    t0 = time.time()
    for _ in range(iters):
        if loader_it is not None:
            batch = next(loader_it)  # fresh renders every step
        state, aux = step(state, batch, key)
    sync(aux)
    per_step = (time.time() - t0) / iters
    if loader is not None:
        loader.shutdown()

    tag = " end-to-end w/ render loader" if args.real_data else ""
    print(json.dumps({
        "metric": "train_steps_per_sec_per_chip",
        "value": round(1.0 / per_step, 3),
        "unit": f"steps/s (flagship recon training, batch {b}, "
                f"{v_in} in / {v_out} out views, {input_size}^2{tag})",
        "vs_baseline": None,
    }))
    print(f"# {per_step * 1e3:.1f} ms/step = "
          f"{(v_in + v_out) * b / per_step:.1f} views/s", file=sys.stderr)
    _append_json(args.json_out, {
        "mode": "train", "metric": "train_steps_per_sec_per_chip",
        "value": round(1.0 / per_step, 3), "knobs": _knobs(args), "batch": b,
        "batch_groups": args.batch_groups, "views_in": v_in,
        "views_out": v_out, "input_size": input_size,
        "remat": bool(args.remat), "cold_compile_s": round(cold_s, 1),
        "device_kind": jax.devices()[0].device_kind,
        "real_data": bool(args.real_data),
        "loader_workers": args.loader_workers if args.real_data else None,
        "transport": args.transport if args.real_data else None,
        "views_per_sec": round((v_in + v_out) * b / per_step, 1)})


if __name__ == "__main__":
    main()
