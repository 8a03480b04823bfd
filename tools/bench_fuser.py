#!/usr/bin/env python
"""A/B: recurrent fuser view-fold as unrolled cell chain vs nn.scan.

Measures trace+compile time and steady-state step time at flagship fuser
shapes (C=256, 16^3 voxels) for 8/16/24 views (VERDICT r1 item #8). Honest
timing: forced host transfer of a scalar (see .claude/skills/verify).
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--channels", type=int, default=256)
    p.add_argument("--size", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from latentfusion_tpu import dtypes
    from latentfusion_tpu.recon import fusion
    from latentfusion_tpu.testing import make_camera

    dtypes.set_compute_dtype("bfloat16")
    C, S = args.channels, args.size
    key = jax.random.PRNGKey(0)

    unroll = fusion.GRUFuser(in_channels=C)
    scan = fusion.GRUFuser(in_channels=C, scan_views=True)
    z0 = jax.random.normal(key, (1, 2, C, S, S, S))
    params = jax.jit(unroll.init)(key, z0, [], [], make_camera(2, key=key))

    for v in (8, 16, 24):
        zv = jax.random.normal(key, (1, v, C, S, S, S))
        camv = make_camera(v, key=key)
        for name, mod in (("unroll", unroll), ("scan", scan)):

            @jax.jit
            def run(p, z, mod=mod, camv=camv):
                def body(i, acc):
                    out = mod.apply(p, z + acc * 1e-9, [], [], camv)[0]
                    return acc + out.mean()

                return jax.lax.fori_loop(0, args.iters, body, 0.0)

            t0 = time.perf_counter()
            float(jax.device_get(run(params, zv)))
            compile_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jax.device_get(run(params, zv)))
            step_t = (time.perf_counter() - t0) / args.iters
            print(f"V={v:2d} {name:6s}: compile+1st {compile_t:6.2f}s  "
                  f"fold {step_t * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
