#!/usr/bin/env python
"""Capture a device trace of the CEM coarse-search loop and print top ops.

Companion to tools/profile_refinement.py (same xplane parsing); targets the
cross_entropy_quick shape (128 hypotheses/iter) where the per-hypothesis
rate (~0.8 ms/hyp) is ~3x the raw decode forward — this locates the
non-render cost (GMM EM scan, argsort, full-frame loss, ranking).

Usage: python tools/profile_cem.py [--samples 128] [--iters 10]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

from profile_refinement import top_ops  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trace-dir", default="/tmp/lf_cem_trace")
    parser.add_argument("--parse-only", action="store_true")
    parser.add_argument("--samples", type=int, default=128)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--top", type=int, default=30)
    args = parser.parse_args()

    if not args.parse_only:
        import jax
        import jax.numpy as jnp

        from latentfusion_tpu import enable_compilation_cache
        enable_compilation_cache()

        from latentfusion_tpu import dtypes, testing, zoo
        from latentfusion_tpu.pose import estimation
        from latentfusion_tpu.recon.inference import LatentFusionModel

        dtypes.set_compute_dtype("bfloat16")
        INPUT, DIST = 256, 1.5
        photographer = zoo.flagship_photographer()
        key = jax.random.PRNGKey(0)

        @jax.jit
        def setup(key):
            cam0 = zoo.canonical_camera(1, INPUT, camera_dist=DIST,
                                        key=jax.random.PRNGKey(3))
            z_obj = jax.random.normal(key, (1, 1, 256, 16, 16, 16)) * 0.1
            return cam0, z_obj

        cam0, z_obj = setup(key)
        zoom1 = jax.jit(lambda c: c.zoom(None, INPUT, DIST))(cam0)
        params = jax.jit(photographer.init)(
            key, jnp.zeros((1, 256, 16, 16, 16)), zoom1)
        oracle = testing.EllipsoidOracleModel(input_size=INPUT,
                                              camera_dist=DIST)
        target_obs = jax.jit(oracle.make_observation)(cam0)
        model = LatentFusionModel(
            zoo.flagship_sculptor(INPUT), {}, zoo.flagship_fuser(), {},
            photographer, params, camera_dist=DIST)
        est = estimation.CrossEntropyPoseEstimator(
            model=model, ranking_size=16, loss_weights={"depth": 1.0},
            num_samples=args.samples, num_iters=args.iters, num_elites=48,
            num_gmm_components=6, learning_rate=0.75, sample_flipped=True)

        # Warm up (compile), then trace one estimate call.
        est.estimate(z_obj, target_obs, key=jax.random.PRNGKey(5))
        with jax.profiler.trace(args.trace_dir):
            r = est.estimate(z_obj, target_obs, key=jax.random.PRNGKey(6))
            jax.block_until_ready(r.translation)

    top_ops(args.trace_dir, k=args.top)


if __name__ == "__main__":
    main()
