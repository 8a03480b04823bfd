"""Training harness tests: GAN step, trainer loop, CLI smoke (tiny, CPU)."""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentfusion_tpu import zoo
from latentfusion_tpu.train.step import (GanTrainState, init_gan_train_state,
                                         make_optimizer,
                                         make_recon_train_step)

sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))


def make_raw_batch(rng, b=2, v_in=2, v_out=2, size=16):
    def group(v):
        intr = np.tile(np.array(
            [[20.0, 0, 8, 0], [0, 20.0, 8, 0], [0, 0, 1, 0]],
            dtype=np.float32)[None], (b, v, 1, 1))
        extr = np.tile(np.eye(4, dtype=np.float32)[None, None], (b, v, 1, 1))
        extr[..., 2, 3] = 1.5
        return {
            "render": rng.rand(b, v, 3, size, size).astype(np.float32),
            "mask": (rng.rand(b, v, size, size) > 0.4).astype(np.float32),
            "depth": rng.rand(b, v, size, size).astype(np.float32) + 1.0,
            "extrinsic": extr,
            "intrinsic": intr,
        }

    return {"in": group(v_in), "in_gt": group(v_in), "out_gt": group(v_out)}


@pytest.fixture(scope="module")
def tiny_stack():
    sculptor = zoo.tiny_sculptor()
    fuser = zoo.tiny_fuser()
    photographer = zoo.tiny_photographer()
    params = zoo.init_recon_params(jax.random.PRNGKey(0), sculptor, fuser,
                                   photographer, batch=1, views=2)
    return sculptor, fuser, photographer, params


def test_recon_train_step_no_gan(tiny_stack, rng):
    sculptor, fuser, photographer, params = tiny_stack
    opt = make_optimizer("adam", 1e-3)
    state = init_gan_train_state(params, opt)
    step = make_recon_train_step(sculptor, fuser, photographer, opt,
                                 config={"camera_dist": 1.5,
                                         "random_orientation": True})
    batch = make_raw_batch(rng)
    state2, scalars = step(state, batch, jax.random.PRNGKey(0))
    assert int(state2.step) == 1
    assert "loss/generator/depth" in scalars
    assert np.isfinite(float(scalars["loss/generator/total"]))
    # Params actually moved.
    before = jax.tree_util.tree_leaves(state.params)[0]
    after = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # Loss decreases over a few steps on a fixed batch.
    losses = [float(scalars["loss/generator/total"])]
    for i in range(4):
        state2, scalars = step(state2, batch, jax.random.PRNGKey(i + 1))
        losses.append(float(scalars["loss/generator/total"]))
    assert losses[-1] < losses[0]


def test_recon_train_step_gradient_accumulation(tiny_stack, rng):
    """num_microbatches (the reference's --batch-groups) matches the
    full-batch step when per-microbatch randomness is disabled."""
    sculptor, fuser, photographer, params = tiny_stack
    opt = make_optimizer("adam", 1e-3)
    config = {"camera_dist": 1.5, "random_orientation": False}
    batch = make_raw_batch(rng, b=4)
    key = jax.random.PRNGKey(0)

    full = make_recon_train_step(sculptor, fuser, photographer, opt,
                                 config=config)
    accum = make_recon_train_step(sculptor, fuser, photographer, opt,
                                  config=config, num_microbatches=2)
    s_full, sc_full = full(init_gan_train_state(params, opt), batch, key)
    s_accum, sc_accum = accum(init_gan_train_state(params, opt), batch, key)

    np.testing.assert_allclose(float(sc_accum["loss/generator/total"]),
                               float(sc_full["loss/generator/total"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_accum.params),
                    jax.tree_util.tree_leaves(s_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_recon_train_step_with_gan(tiny_stack, rng):
    from latentfusion_tpu.pggan import MultiScaleDiscriminator

    sculptor, fuser, photographer, params = tiny_stack
    disc = MultiScaleDiscriminator(1, (8, 16), num_scales=2)
    d_params = disc.init(jax.random.PRNGKey(1), jnp.zeros((4, 1, 16, 16)))
    g_opt = make_optimizer("adam", 1e-3)
    d_opt = make_optimizer("adam", 1e-3)
    state = init_gan_train_state(params, g_opt, d_params, d_opt)
    step = make_recon_train_step(
        sculptor, fuser, photographer, g_opt, disc, d_opt,
        config={"camera_dist": 1.5, "discriminator_input_depth": True})
    batch = make_raw_batch(rng)
    state2, scalars = step(state, batch, jax.random.PRNGKey(0),
                           input_noise_weight=0.5)
    assert "loss/discriminator/total" in scalars
    assert "loss/generator/gan" in scalars
    d_before = jax.tree_util.tree_leaves(state.d_params)[0]
    d_after = jax.tree_util.tree_leaves(state2.d_params)[0]
    assert not np.allclose(np.asarray(d_before), np.asarray(d_after))


def test_recon_train_step_gan_accumulation(tiny_stack, rng):
    """Gradient accumulation composes with the discriminator: both G and D
    grads average over microbatches before single optimizer updates."""
    from latentfusion_tpu.pggan import MultiScaleDiscriminator

    sculptor, fuser, photographer, params = tiny_stack
    disc = MultiScaleDiscriminator(1, (8, 16), num_scales=2)
    d_params = disc.init(jax.random.PRNGKey(1), jnp.zeros((4, 1, 16, 16)))
    g_opt = make_optimizer("adam", 1e-3)
    d_opt = make_optimizer("adam", 1e-3)
    state = init_gan_train_state(params, g_opt, d_params, d_opt)
    step = make_recon_train_step(
        sculptor, fuser, photographer, g_opt, disc, d_opt,
        config={"camera_dist": 1.5, "discriminator_input_depth": True},
        num_microbatches=2)
    batch = make_raw_batch(rng, b=4)
    state2, scalars = step(state, batch, jax.random.PRNGKey(0),
                           input_noise_weight=0.5)
    for k in ("loss/discriminator/total", "loss/generator/gan",
              "loss/generator/total"):
        assert np.isfinite(float(scalars[k])), k
    d_before = jax.tree_util.tree_leaves(state.d_params)[0]
    d_after = jax.tree_util.tree_leaves(state2.d_params)[0]
    assert not np.allclose(np.asarray(d_before), np.asarray(d_after))
    g_before = jax.tree_util.tree_leaves(state.params)[0]
    g_after = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(g_before), np.asarray(g_after))


def test_train_cli_smoke(tmp_path, rng):
    """Two iterations of the full CLI on a cube mesh (CPU)."""
    from test_data import make_cube_obj

    import train_reconstruct

    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    make_cube_obj(mesh_dir)

    argv = [
        "--dataset-type", "paths",
        "--dataset-path", str(mesh_dir),
        "--save-dir", str(tmp_path / "runs"),
        "--base-name", "smoke",
        "--input-size", "16",
        "--render-width", "64", "--render-height", "48",
        "--batch-size", "1",
        "--batches-per-epoch", "2",
        "--num-epochs", "1",
        "--num-workers", "0",
        "--num-input-views", "2", "--num-output-views", "2",
        "--sculptor-image-config", "4,D,8:8",
        "--sculptor-camera-config", "4,4",
        "--sculptor-object-config", "4,4",
        "--photographer-object-config", "none",
        "--photographer-camera-config", "4,4",
        "--photographer-image-config", "4,D,8:8,U,8,U,4",
        "--fuser-type", "gru",
        "--no-discriminator",
        "--predict-depth", "--predict-mask",
        "--generator-input-mask",
        "--random-orientation",
        "--save-interval", "-1",
    ]
    train_reconstruct.main(argv)
    run_dirs = list((tmp_path / "runs").iterdir())
    assert len(run_dirs) == 1
    ckpts = list(run_dirs[0].glob("ckpt-*.pkl"))
    assert any("epoch-latest" in c.name for c in ckpts)
    assert (run_dirs[0] / "params.json").exists()
