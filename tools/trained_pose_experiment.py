#!/usr/bin/env python
"""Experiment: pose refinement through a freshly TRAINED decoder (no oracle).

Trains a small reconstruction stack on synthetic cube renders, builds a
latent object through the public LatentFusionModel API, and runs gradient
refinement from perturbed initializations, reporting ADD-S before/after.

Measured outcome (CPU, 1200 steps, 16-ch latent, 2026-08-16): refinement
converges every hypothesis to the same ~0.3 ADD-S attractor — the decoder
render's own best-fit pose — regardless of init (0.2-0.3). At this
training budget the decoder is not pose-discriminative; the estimator
itself is verified exactly on the analytic oracle (tests/test_pose.py,
tests/test_bop_accuracy.py) and the network against the reference
implementation (tests/test_reference_parity.py). Reaching ADD-S 0.1d with
a trained decoder requires flagship-scale training (see bench.py --mode
train --batch 8), i.e. a real training run, not a CI-sized one.

Run:  python tools/trained_pose_experiment.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
sys.path.insert(0, str(Path(__file__).parents[1] / "tests"))
import numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from pathlib import Path
import tempfile
from test_data import make_cube_obj

from latentfusion_tpu import zoo
from latentfusion_tpu.camera import Camera
from latentfusion_tpu.data import rendering, synthetic
from latentfusion_tpu.data.loader import collate
from latentfusion_tpu.observation import Observation
from latentfusion_tpu.pose import estimation, metrics
from latentfusion_tpu.recon import models as rmodels, fusion
from latentfusion_tpu.recon.inference import LatentFusionModel
from latentfusion_tpu.three import quaternion as quat
from latentfusion_tpu import three
from latentfusion_tpu.train.step import (init_gan_train_state, make_optimizer,
                                         make_recon_train_step)

W, H, F = 96, 72, 72.0
CAMERA_DIST = 1.5
INTRINSIC = np.asarray([[F, 0, W/2], [0, F, H/2], [0, 0, 1.0]], np.float32)

# "small" stack: 32^2 input, 16-ch latent 16^3
sculptor = rmodels.Sculptor(in_size=32,
    image_config=((8, "D", 16), (16,)), camera_config=(16, 16),
    object_config=(16, 16), projection_type="factor", cube_size=1.0)
photographer = rmodels.Photographer(in_size=16,
    image_config=((8, "D", 16), (16, "U", 16, "U", 8)),
    camera_config=(16, 16), object_config=None, projection_type="factor",
    predict_depth=True, predict_mask=True, cube_size=1.0)
fuser = fusion.GRUFuser(in_channels=16)

tmp = Path(tempfile.mkdtemp())
mesh_path = make_cube_obj(tmp)
ds = synthetic.SyntheticDataset([mesh_path], num_input_views=2,
                                num_output_views=2, width=W, height=H,
                                random_materials=True, seed=0)
ds.worker_init_fn(0)
it = iter(ds)
params = zoo.init_recon_params(jax.random.PRNGKey(0), sculptor, fuser, photographer, batch=1, views=2)
opt = make_optimizer("adam", 2e-3)
state = init_gan_train_state(params, opt)
step = make_recon_train_step(sculptor, fuser, photographer, opt,
    config={"camera_dist": CAMERA_DIST, "random_orientation": True,
            "g_depth_recon_loss_type": "l1", "g_depth_recon_loss_weight": 25.0,
            "g_mask_recon_loss_weight": 25.0})
pool = [collate([next(it)]) for _ in range(12)]
key = jax.random.PRNGKey(1)
import time; t0=time.time()
for i in range(1200):
    key, sub = jax.random.split(key)
    state, aux = step(state, pool[i % len(pool)], sub)
    if i % 300 == 0:
        print(i, float(aux["loss/generator/total"]), f"{time.time()-t0:.0f}s", flush=True)
print("final train loss:", float(aux["loss/generator/total"]))

def render_obs(obj, extrinsic):
    ctx = rendering.SceneContext(obj, INTRINSIC)
    ctx.set_pose_from_extrinsic(np.asarray(extrinsic))
    ctx.lights = [(np.asarray([0.0, 0.0, -2.0], np.float32), np.ones(3, np.float32), 5.0)]
    color, depth, mask = rendering.Renderer(W, H).render(ctx)
    cam = Camera(INTRINSIC[None], np.asarray(extrinsic)[None], width=W, height=H)
    return Observation(jnp.asarray(color).transpose(2, 0, 1)[None],
                       jnp.asarray(depth)[None, None],
                       jnp.asarray(mask)[None, None], cam)

def pose(key):
    q = quat.random(key, 1)
    return np.asarray(three.to_extrinsic_matrix(jnp.asarray([[0.0, 0.0, CAMERA_DIST]]), q))[0]

model = LatentFusionModel(sculptor, state.params["sculptor"], fuser,
                          state.params["fuser"], photographer,
                          state.params["photographer"], camera_dist=CAMERA_DIST)
obj, _ = rendering.load_object(mesh_path, size=1.0)
ref_obs = Observation.collate([render_obs(obj, pose(k))
                               for k in jax.random.split(jax.random.PRNGKey(7), 8)])
z_obj = model.build_latent_object(ref_obs)

gt_ext = pose(jax.random.PRNGKey(99))
target = render_obs(obj, gt_ext)
gt_cam = target.camera
points = jnp.asarray(obj.vertices)
def add_s(c): return metrics.camera_metrics(gt_cam, c, points, scale_to_meters=1.0)["add_s"]

n_hyp = 8
k1, k2 = jax.random.split(jax.random.PRNGKey(3))
base = Camera(jnp.tile(gt_cam.intrinsic, (n_hyp, 1, 1)), None, gt_cam.z_span,
              log_quaternion=jnp.tile(gt_cam.log_quaternion, (n_hyp, 1)),
              translation=jnp.tile(gt_cam.translation, (n_hyp, 1)), width=W, height=H)
init_cams = base.rotate(quat.perturb(k1, quat.identity(n_hyp), 0.3)).replace(
    translation=base.translation + jax.random.normal(k2, (n_hyp, 3)) * 0.1)
init_errs = [add_s(init_cams[i]) for i in range(n_hyp)]
est = estimation.GradientPoseEstimator(model=model, ranking_size=8,
    loss_weights={"depth": 1.0, "ov_depth": 0.3, "mask": 1.0},
    learning_rate=0.01, num_samples=n_hyp, num_iters=80,
    converge_threshold=1e-6, converge_patience=80, optimizer="adam")
best = est.estimate(z_obj, target, camera=init_cams)
final_errs = [add_s(best[i]) for i in range(len(best))]
print("init errs:", np.round(init_errs, 3))
print("ranked finals:", np.round(final_errs, 3))
