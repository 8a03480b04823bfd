#!/usr/bin/env python
"""Benchmark the synthetic-data pipeline (host side, no TPU needed).

Measures, for the training item shape (default 8 input / 24 output views
at 640x480, the reference train.sh configuration):

- renders/s for the raw rasterizer (geometry + shading only),
- items/s and renders/s for the full dataset chain (materials, lights,
  augmentation, packing) on one inline worker,
- batches/s through IterableLoader with N spawn workers (queue + collate
  + optional quantized transport), and the implied steps/s ceiling for a
  given train batch size.

Prints one JSON line per stage. The loader requirement for the published
batch (--batch 8 --batch-groups 2: 16 items/step) is ~517 renders/s at
the measured 1.01 steps/s/chip — use --workers to find the worker count
that clears it on a given host.

Reference behavior this feeds: latentfusion train.sh +
datasets/training/pyrender.py (the reference renders on a GPU via
pyrender/EGL; here CPU workers own the native rasterizer).
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")




def bench_rasterizer(paths, width, height, iters=32):
    from latentfusion_tpu.data import rendering

    obj, _ = rendering.load_object(paths[0], size=0.35)
    ctx = rendering.SceneContext(
        obj, np.array([[500.0 * width / 640, 0, width / 2],
                       [0, 500.0 * width / 640, height / 2],
                       [0, 0, 1]], np.float32))
    ctx.randomize_lights(3, 8)
    ctx.specular = 0.3
    ctx.roughness = 0.4
    renderer = rendering.Renderer(width, height)
    rng = np.random.RandomState(0)
    ctx.set_pose(np.array([0, 0, 1.0], np.float32),
                 np.array([1, 0, 0, 0], np.float32))
    renderer.render(ctx)  # warm (geometry merge cache)
    t0 = time.perf_counter()
    for _ in range(iters):
        q = rng.randn(4).astype(np.float32)
        ctx.set_pose(np.array([0, 0, 1.0], np.float32), q)
        renderer.render(ctx)
    dt = (time.perf_counter() - t0) / iters
    return {"stage": "rasterizer", "ms_per_render": round(dt * 1e3, 2),
            "renders_per_s": round(1.0 / dt, 1)}


def bench_dataset(ds, n_items=4):
    views = ds.num_inputs * 2 + ds.num_outputs
    it = iter(ds)
    next(it)  # warm
    t0 = time.perf_counter()
    for _ in range(n_items):
        next(it)
    dt = (time.perf_counter() - t0) / n_items
    return {"stage": "dataset_inline", "s_per_item": round(dt, 3),
            "renders_per_s_per_worker": round(views / dt, 1)}


def bench_loader(ds, workers, transport, batch_size, n_batches=3):
    from latentfusion_tpu.data.loader import IterableLoader

    loader = IterableLoader(ds, batch_size=batch_size, num_workers=workers,
                            device_put=False, transport=transport)
    views = ds.num_inputs * 2 + ds.num_outputs
    try:
        it = iter(loader)
        next(it)  # warm (worker spawn + first fills)
        t0 = time.perf_counter()
        for _ in range(n_batches):
            next(it)
        dt = (time.perf_counter() - t0) / n_batches
    finally:
        loader.shutdown()
    return {"stage": "loader", "workers": workers,
            "transport": transport or "f32",
            "s_per_batch": round(dt, 3),
            "renders_per_s": round(batch_size * views / dt, 1),
            "steps_per_s_ceiling": round(1.0 / dt, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--in-views", type=int, default=8)
    ap.add_argument("--out-views", type=int, default=24)
    ap.add_argument("--verts", type=int, default=2000,
                    help="mesh complexity of the procedural blobs")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--batch", type=int, default=2,
                    help="loader batch (items/step; train.sh uses 16)")
    ap.add_argument("--transport", choices=["quantized"], default=None)
    args = ap.parse_args()

    from latentfusion_tpu.data.synthetic import (SyntheticDataset,
                                                 make_procedural_blobs)

    tmp = Path(tempfile.mkdtemp())
    paths = make_procedural_blobs(tmp, 4, args.verts)

    print(json.dumps(bench_rasterizer(paths, args.width, args.height)),
          flush=True)

    ds = SyntheticDataset(paths, num_input_views=args.in_views,
                          num_output_views=args.out_views,
                          width=args.width, height=args.height,
                          random_materials=True)
    ds.worker_init_fn(0)
    print(json.dumps(bench_dataset(ds)), flush=True)

    # Workers re-init their own renderer AND PRNG key; the parent's
    # worker_init_fn(0) above set a live jax.Array on ds, which must not
    # be pickled into spawn children (see
    # tests/test_data.py::test_dataset_pickles_without_jax_arrays).
    ds._renderer = None
    ds._key = None
    print(json.dumps(bench_loader(ds, args.workers, args.transport,
                                  args.batch)), flush=True)


if __name__ == "__main__":
    main()
