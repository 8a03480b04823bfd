"""End-to-end learning test: the full training loop measurably learns.

Trains the tiny reconstruction stack on synthetic cube renders (native
rasterizer) for a few hundred steps and asserts the held-out depth/mask
reconstruction error drops substantially. This is the strongest
no-external-data evidence that encode -> fuse -> decode -> loss -> optimizer
is wired correctly end to end.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentfusion_tpu import zoo
from latentfusion_tpu.data import synthetic
from latentfusion_tpu.data.loader import collate
from latentfusion_tpu.train.step import (init_gan_train_state, make_optimizer,
                                         make_recon_train_step)

sys.path.insert(0, str(Path(__file__).parent))


@pytest.mark.slow
def test_training_reduces_reconstruction_error(tmp_path):
    from test_data import make_cube_obj

    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    ds = synthetic.SyntheticDataset(
        [make_cube_obj(mesh_dir)], num_input_views=2, num_output_views=2,
        width=64, height=48, random_materials=True, seed=0)
    ds.worker_init_fn(0)
    it = iter(ds)

    sculptor = zoo.tiny_sculptor()
    fuser = zoo.tiny_fuser()
    photographer = zoo.tiny_photographer()
    params = zoo.init_recon_params(jax.random.PRNGKey(0), sculptor, fuser,
                                   photographer, batch=1, views=2)
    opt = make_optimizer("adam", 3e-3)
    state = init_gan_train_state(params, opt)
    step = make_recon_train_step(
        sculptor, fuser, photographer, opt,
        config={"camera_dist": 1.5, "random_orientation": True,
                "g_depth_recon_loss_type": "l1",
                "g_depth_recon_loss_weight": 25.0,
                "g_mask_recon_loss_weight": 25.0})

    # A small fixed pool of pre-rendered batches (rendering dominates
    # otherwise); learning still generalizes across the pool's poses.
    pool = [collate([next(it)]) for _ in range(6)]
    holdout = collate([next(it)])

    def eval_loss(state):
        _, aux = step(state, holdout, jax.random.PRNGKey(999))
        return float(aux["loss/generator/depth"]), \
            float(aux["loss/generator/mask"])

    d0, m0 = eval_loss(state)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(250):
        key, sub = jax.random.split(key)
        state, aux = step(state, pool[i % len(pool)], sub)
        losses.append(float(aux["loss/generator/total"]))
    d1, m1 = eval_loss(state)

    # Substantial improvement on a held-out pose.
    assert d1 < 0.6 * d0, (d0, d1)
    assert m1 < 0.8 * m0, (m0, m1)
    # And the training curve went down overall.
    assert np.mean(losses[-20:]) < 0.5 * np.mean(losses[:20])
