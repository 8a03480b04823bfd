#!/usr/bin/env python
"""Decompose the pose-refinement step time on TPU: decode fwd, fwd+bwd,
loss-only, full refinement step. Guides kernel optimization."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax
import jax.numpy as jnp

from latentfusion_tpu import enable_compilation_cache
enable_compilation_cache()

from latentfusion_tpu import dtypes, testing, zoo
from latentfusion_tpu.pose import estimation
from latentfusion_tpu.pose import utils as pu
from latentfusion_tpu import transforms

dtypes.set_compute_dtype("bfloat16")

N = 8
INPUT = zoo.FLAGSHIP_INPUT_SIZE
DIST = 1.5

key = jax.random.PRNGKey(0)
photographer = zoo.flagship_photographer()


@jax.jit
def setup(key):
    cam0 = zoo.canonical_camera(1, INPUT, camera_dist=DIST,
                                key=jax.random.PRNGKey(3))
    z_obj = jax.random.normal(key, (1, 1, 256, 16, 16, 16)) * 0.1
    return cam0, z_obj


cam0, z_obj = setup(key)
zoom1 = jax.jit(lambda c: c.repeat(N).zoom(None, INPUT, DIST))(cam0)
params = jax.jit(photographer.init)(key, jnp.zeros((N, 256, 16, 16, 16)), zoom1)

oracle = testing.EllipsoidOracleModel(input_size=INPUT, camera_dist=DIST)
target_obs = jax.jit(oracle.make_observation)(cam0)
init_cam = jax.jit(lambda: pu.sample_cameras_with_estimate(
    N, cam0, key=jax.random.PRNGKey(1)))()
zoom_cam = jax.jit(lambda c: c.zoom(None, INPUT, DIST))(init_cam)


def timeit(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:40s} {dt * 1e3:9.2f} ms")
    return dt


from latentfusion_tpu.recon import models


@jax.jit
def decode_fwd(p, zo, c):
    y, _, _ = models.decode(photographer, p, zo, c)
    return y["depth"]


@jax.jit
def o2c_only(zo, c):
    return transforms.object_to_camera(
        jnp.broadcast_to(zo[0], (c.length, *zo.shape[2:])), c)


@jax.jit
def decode_loss(p, zo, c, obs):
    y, zl, _ = models.decode(photographer, p, zo, c, return_latent=True)
    z_depth = c.denormalize_depth(y["depth"].squeeze(0))
    ld = estimation.default_pose_loss(obs, z_depth,
                                      y["mask_logits"].squeeze(0), c)
    return sum(v.sum() for v in ld.values())


@jax.jit
def decode_loss_grad(p, zo, params_cam, obs):
    def f(pc):
        c = zoom_cam.replace(**pc)
        y, _, _ = models.decode(photographer, p, zo, c)
        z_depth = c.denormalize_depth(y["depth"].squeeze(0))
        ld = estimation.default_pose_loss(obs, z_depth,
                                          y["mask_logits"].squeeze(0), c)
        return sum(v.mean() for v in ld.values())

    return jax.grad(f)(params_cam)


cam_params = pu.camera_params(zoom_cam, optimize_viewport=True)

timeit("decode fwd (8 hyp)", decode_fwd, params, z_obj, zoom_cam)
timeit("object_to_camera warp only", o2c_only, z_obj, zoom_cam)
timeit("decode + pose loss", decode_loss, params, z_obj, zoom_cam, target_obs)
timeit("decode + loss + grad (full step core)", decode_loss_grad, params,
       z_obj, cam_params, target_obs)
