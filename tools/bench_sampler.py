#!/usr/bin/env python
"""Microbenchmark the 3D volume sampler backends at flagship decode shapes.

Times N loop iterations INSIDE one jit (fori_loop) and divides — per-call
timing on the tunneled TPU backend is unreliable (see .claude/skills/verify).

Modes: fwd (sampling only) and fwd+bwd w.r.t. the grid (the pose-refinement
cotangent; d/dvol is dead in refinement and should DCE away).
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8, help="batch (hypotheses)")
    p.add_argument("--c", type=int, default=256)
    p.add_argument("--size", type=int, default=16)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--backends", default="matmul,pallas,gather")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp

    from latentfusion_tpu import dtypes
    from latentfusion_tpu.ops.gather_matmul import grid_sample_3d_matmul
    from latentfusion_tpu.ops.grid_sample import grid_sample_3d
    from latentfusion_tpu.ops.pallas_volume import grid_sample_3d_pallas

    dtypes.set_compute_dtype("bfloat16")
    n, c, s = args.n, args.c, args.size
    key = jax.random.PRNGKey(0)
    vol = jax.random.normal(key, (n, c, s, s, s))
    grid0 = jax.random.uniform(jax.random.PRNGKey(1), (n, s, s, s, 3),
                               minval=-1.0, maxval=1.0)

    fns = {
        "matmul": lambda v, g: grid_sample_3d_matmul(v, g,
                                                     padding_mode="border"),
        "pallas": lambda v, g: grid_sample_3d_pallas(v, g, "border"),
        "gather": lambda v, g: grid_sample_3d(v, g, padding_mode="border"),
    }

    matmul_flops = 2 * n * c * (s ** 3) * (s ** 3)

    for name in args.backends.split(","):
        fn = fns[name]

        @jax.jit
        def loop_fwd(vol, grid, fn=fn):
            def body(i, acc):
                out = fn(vol, grid + acc * 1e-9)
                return acc + out.mean()

            return jax.lax.fori_loop(0, args.iters, body, 0.0)

        @jax.jit
        def loop_bwd(vol, grid, fn=fn):
            def loss(g):
                return fn(vol, g).sum()

            def body(i, carry):
                g, acc = carry
                val, dg = jax.value_and_grad(loss)(g)
                return (g - 1e-9 * dg, acc + val)

            return jax.lax.fori_loop(0, args.iters, body, (grid, 0.0))[1]

        for mode, loop in (("fwd", loop_fwd), ("fwd+bwd", loop_bwd)):
            # block_until_ready can return early on the tunneled backend;
            # force a host transfer of the final scalar for honest timing.
            float(jax.device_get(loop(vol, grid0)))
            t0 = time.perf_counter()
            float(jax.device_get(loop(vol, grid0)))
            dt = (time.perf_counter() - t0) / args.iters
            eff = matmul_flops / dt / 1e12
            print(f"{name:7s} {mode:7s}: {dt * 1e3:8.3f} ms/call "
                  f"({eff:6.1f} TFLOP/s dense-matmul-equivalent)")


if __name__ == "__main__":
    main()
