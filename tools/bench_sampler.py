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
    from latentfusion_tpu import enable_compilation_cache
    enable_compilation_cache()
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

    def matmul_cl(v, g):
        """Channels-last one-hot matmul (what the decode uses under the
        layout policy): v arrives NCDHW, transposed once outside timing
        relevance (the loop hoists it)."""
        vcl = v.transpose(0, 2, 3, 4, 1)
        out = grid_sample_3d_matmul(vcl, g, padding_mode="border",
                                    channels_last=True)
        return out.transpose(0, 4, 1, 2, 3)

    def gather_cl(v, g):
        """Channels-last 8-corner gather: each tap pulls a C-contiguous
        row from the flattened (N, J, C) volume (take_along_axis), so the
        gathers vectorize over lanes instead of the scalar loads the
        NCDHW gather lowers to. d/dgrid flows through the 8 tap weights
        (cheap); d/dvol would be a scatter (dead in pose refinement)."""
        from latentfusion_tpu.ops.grid_sample import _unnormalize

        N, C, D, H, W = v.shape
        flat = v.transpose(0, 2, 3, 4, 1).reshape(N, -1, C)
        gg = g.reshape(N, -1, 3)
        x = jnp.clip(_unnormalize(gg[..., 0], W), 0.0, W - 1)
        y = jnp.clip(_unnormalize(gg[..., 1], H), 0.0, H - 1)
        z = jnp.clip(_unnormalize(gg[..., 2], D), 0.0, D - 1)
        x0 = jnp.floor(x); y0 = jnp.floor(y); z0 = jnp.floor(z)
        fx = x - x0; fy = y - y0; fz = z - z0
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        z0i = z0.astype(jnp.int32)
        out = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    xi = jnp.minimum(x0i + dx, W - 1)
                    yi = jnp.minimum(y0i + dy, H - 1)
                    zi = jnp.minimum(z0i + dz, D - 1)
                    j = (zi * H + yi) * W + xi
                    w = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                         * (fz if dz else 1 - fz))
                    taps = jnp.take_along_axis(flat, j[..., None], axis=1)
                    out = out + w[..., None] * taps
        return out.reshape(N, *g.shape[1:4], C).transpose(0, 4, 1, 2, 3)

    from latentfusion_tpu.ops.pallas_fused_sample import grid_sample_3d_fused

    fns = {
        "fused": lambda v, g: grid_sample_3d_fused(v, g,
                                                   padding_mode="border"),
        "matmul": lambda v, g: grid_sample_3d_matmul(v, g,
                                                     padding_mode="border"),
        "matmul_cl": matmul_cl,
        "gather_cl": gather_cl,
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
