#!/usr/bin/env python
"""Capture a device trace of the pose-refinement loop and print the top ops.

Usage: python tools/profile_refinement.py [--trace-dir /tmp/lf_refine_trace]

Parses the XSpace protobuf with tensorboard_plugin_profile and aggregates
device-lane op durations — the round-2 optimization worklist generator.
"""
import argparse
import collections
import glob
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))


def top_ops(trace_dir, k=25):
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not pbs:
        print("no xplane.pb found", file=sys.stderr)
        return
    space = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        metas = {m.id: m.name for m in plane.event_metadata.values()}
        durations = collections.Counter()
        counts = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = metas.get(ev.metadata_id, "?")
                durations[name] += ev.duration_ps / 1e9  # ms
                counts[name] += 1
        total = sum(durations.values())
        print(f"\n== plane: {plane.name} (total {total:.2f} ms) ==")
        for name, dur in durations.most_common(k):
            print(f"{dur:9.3f} ms  {100 * dur / max(total, 1e-9):5.1f}%  "
                  f"x{counts[name]:<5d} {name[:90]}")
        return durations


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trace-dir", default="/tmp/lf_refine_trace")
    parser.add_argument("--parse-only", action="store_true")
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    if not args.parse_only:
        import jax
        import jax.numpy as jnp

        from latentfusion_tpu import enable_compilation_cache
        enable_compilation_cache()

        from latentfusion_tpu import dtypes, testing, zoo
        from latentfusion_tpu.pose import estimation
        from latentfusion_tpu.pose import utils as pu
        from latentfusion_tpu.recon.inference import LatentFusionModel

        dtypes.set_compute_dtype("bfloat16")
        INPUT, DIST, N = 256, 1.5, 8
        photographer = zoo.flagship_photographer()
        key = jax.random.PRNGKey(0)

        @jax.jit
        def setup(key):
            cam0 = zoo.canonical_camera(1, INPUT, camera_dist=DIST,
                                        key=jax.random.PRNGKey(3))
            z_obj = jax.random.normal(key, (1, 1, 256, 16, 16, 16)) * 0.1
            return cam0, z_obj

        cam0, z_obj = setup(key)
        zoomN = jax.jit(lambda c: c.repeat(N).zoom(None, INPUT, DIST))(cam0)
        params = jax.jit(photographer.init)(
            key, jnp.zeros((N, 256, 16, 16, 16)), zoomN)
        oracle = testing.EllipsoidOracleModel(input_size=INPUT,
                                              camera_dist=DIST)
        target_obs = jax.jit(oracle.make_observation)(cam0)
        init_cam = jax.jit(lambda: pu.sample_cameras_with_estimate(
            N, cam0, key=jax.random.PRNGKey(1)))()
        model = LatentFusionModel(
            zoo.flagship_sculptor(INPUT), {}, zoo.flagship_fuser(), {},
            photographer, params, camera_dist=DIST)
        est = estimation.GradientPoseEstimator(
            model=model, ranking_size=N,
            loss_weights={"depth": 1.0, "ov_depth": 0.3},
            learning_rate=0.01, num_samples=N, num_iters=args.iters,
            converge_threshold=-1.0, converge_patience=args.iters + 1,
            optimizer="adam")

        # Warm up (compile), then trace one estimate call.
        est.estimate(z_obj, target_obs, camera=init_cam)
        with jax.profiler.trace(args.trace_dir):
            r = est.estimate(z_obj, target_obs, camera=init_cam)
            jax.block_until_ready(r.translation)

    top_ops(args.trace_dir)


if __name__ == "__main__":
    main()
