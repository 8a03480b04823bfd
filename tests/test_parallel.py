"""Device-mesh sharding tests (8 virtual CPU devices; SURVEY.md §4)."""
import numpy as np

import jax
import jax.numpy as jnp

from latentfusion_tpu import parallel, zoo
from latentfusion_tpu.recon import models
from latentfusion_tpu.testing import EllipsoidOracleModel, make_camera


def test_hypothesis_sharded_decode_matches():
    """The north-star axis: pose hypotheses sharded across the mesh produce
    identical renders to unsharded execution (XLA inserts the collectives)."""
    photographer = zoo.tiny_photographer()
    key = jax.random.PRNGKey(0)
    n_hyp = 16
    cam = make_camera(n_hyp, z=1.5, f=64, width=64, height=48,
                      key=jax.random.PRNGKey(1))
    cam = cam.zoom(None, 16, 1.5)
    z = jnp.zeros((n_hyp, 4, 8, 8, 8))
    params = photographer.init(key, z, cam)
    z_obj = jax.random.normal(key, (1, 1, 4, 8, 8, 8))

    def decode(p, zo, c):
        y, _, _ = models.decode(photographer, p, zo, c)
        return y["depth"]

    ref = jax.jit(decode)(params, z_obj, cam)

    mesh = parallel.make_mesh(8, axis_name=parallel.HYPOTHESIS_AXIS)
    cam_sharded = parallel.shard_batch(cam, mesh)
    params_rep = parallel.replicate(params, mesh)
    z_rep = parallel.replicate(z_obj, mesh)
    with mesh:
        out = jax.jit(decode)(params_rep, z_rep, cam_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # The render actually came out sharded over the hypothesis axis.
    assert len(out.sharding.device_set) == 8


def test_sharded_hypothesis_scoring():
    """Full score (render + full-frame loss) with sharded hypothesis
    cameras matches unsharded."""
    from latentfusion_tpu.pose import estimation

    oracle = EllipsoidOracleModel()
    gt_cam = make_camera(1, key=jax.random.PRNGKey(7))
    obs = oracle.make_observation(gt_cam)
    est = estimation.GradientPoseEstimator(
        model=oracle, ranking_size=8, loss_weights={"depth": 1.0},
        learning_rate=0.01, num_samples=8, num_iters=1,
        converge_threshold=1e-6, converge_patience=10)

    import latentfusion_tpu.pose.utils as pu

    cams = pu.sample_cameras_with_estimate(8, gt_cam,
                                           key=jax.random.PRNGKey(0))
    score = jax.jit(lambda c, o: est._score_hypotheses(None, o, c)[0])
    ref = score(cams, obs)

    mesh = parallel.make_mesh(8, axis_name=parallel.HYPOTHESIS_AXIS)
    cams_sharded = parallel.shard_batch(cams, mesh)
    obs_rep = parallel.replicate(obs, mesh)
    with mesh:
        out = score(cams_sharded, obs_rep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_camera_pytree_shards():
    cam = make_camera(8, key=jax.random.PRNGKey(0))
    mesh = parallel.make_mesh(8)
    sharded = parallel.shard_batch(cam, mesh)
    assert len(sharded.translation.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sharded.translation),
                               np.asarray(cam.translation))


def test_mesh_sharded_gradient_estimator_matches():
    """GradientPoseEstimator(mesh=...): the full refinement loop runs SPMD
    over the hypothesis axis and matches the unsharded result."""
    from latentfusion_tpu.pose import estimation
    import latentfusion_tpu.pose.utils as pu

    oracle = EllipsoidOracleModel()
    gt_cam = make_camera(1, key=jax.random.PRNGKey(7))
    obs = oracle.make_observation(gt_cam)
    cams = pu.sample_cameras_with_estimate(8, gt_cam,
                                           key=jax.random.PRNGKey(0))
    # Few iterations: sharding changes float reduction order, and the
    # optimizer dynamics amplify ~1e-7 loss deltas chaotically over many
    # steps (top-K snapshots then reorder); the per-step math is identical.
    kwargs = dict(model=oracle, ranking_size=8,
                  loss_weights={"depth": 1.0, "ov_depth": 0.3},
                  learning_rate=0.01, num_samples=8, num_iters=3,
                  converge_threshold=1e-6, converge_patience=10,
                  optimizer="adam", track_stats=True)

    ref, ref_stats = estimation.GradientPoseEstimator(**kwargs).estimate(
        None, obs, camera=cams)

    mesh = parallel.make_mesh(8, axis_name=parallel.HYPOTHESIS_AXIS)
    out, out_stats = estimation.GradientPoseEstimator(
        mesh=mesh, **kwargs).estimate(None, obs, camera=cams)
    np.testing.assert_allclose(np.asarray(out_stats["loss_history"]),
                               np.asarray(ref_stats["loss_history"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.translation),
                               np.asarray(ref.translation), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.log_quaternion),
                               np.asarray(ref.log_quaternion), atol=1e-4)


def test_mesh_sharded_multi_object_gradient_batch_matches():
    """estimate_batch composes with mesh=: 2 objects x 8 hypotheses sharded
    over the virtual mesh match unsharded refinement (VERDICT r1 item #7)."""
    from latentfusion_tpu.pose import estimation
    import latentfusion_tpu.pose.utils as pu
    from latentfusion_tpu.observation import Observation

    oracle = EllipsoidOracleModel()
    gt1 = make_camera(1, key=jax.random.PRNGKey(7))
    gt2 = make_camera(1, key=jax.random.PRNGKey(8))
    obs = Observation.collate([oracle.make_observation(gt1),
                               oracle.make_observation(gt2)])
    from latentfusion_tpu.camera import Camera

    hyp = Camera.cat([
        pu.sample_cameras_with_estimate(8, gt1, key=jax.random.PRNGKey(0)),
        pu.sample_cameras_with_estimate(8, gt2, key=jax.random.PRNGKey(1)),
    ])
    z_objs = jnp.zeros((2, 1, 1, 1, 1, 1))  # oracle ignores the latent

    kwargs = dict(model=oracle, ranking_size=4,
                  loss_weights={"depth": 1.0}, learning_rate=0.01,
                  num_samples=8, num_iters=3, converge_threshold=1e-6,
                  converge_patience=10, optimizer="adam")

    ref = estimation.GradientPoseEstimator(**kwargs).estimate_batch(
        z_objs, obs, cameras=hyp)
    mesh = parallel.make_mesh(8, axis_name=parallel.HYPOTHESIS_AXIS)
    out = estimation.GradientPoseEstimator(
        mesh=mesh, **kwargs).estimate_batch(z_objs, obs, cameras=hyp)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o.translation),
                                   np.asarray(r.translation), atol=1e-4)
        np.testing.assert_allclose(np.asarray(o.log_quaternion),
                                   np.asarray(r.log_quaternion), atol=1e-4)


def test_mesh_sharded_multi_object_cem_batch_matches():
    """CEM estimate_batch with mesh=: per-object GMMs + elites reduce across
    shards and match unsharded execution."""
    from latentfusion_tpu.pose import estimation
    from latentfusion_tpu.observation import Observation

    oracle = EllipsoidOracleModel()
    gt1 = make_camera(1, key=jax.random.PRNGKey(7))
    gt2 = make_camera(1, key=jax.random.PRNGKey(8))
    obs = Observation.collate([oracle.make_observation(gt1),
                               oracle.make_observation(gt2)])
    z_objs = jnp.zeros((2, 1, 1, 1, 1, 1))

    kwargs = dict(model=oracle, ranking_size=4, loss_weights={"depth": 1.0},
                  num_samples=8, num_iters=2, num_elites=4,
                  num_gmm_components=2, learning_rate=0.9,
                  sample_flipped=False)

    ref = estimation.CrossEntropyPoseEstimator(**kwargs).estimate_batch(
        z_objs, obs, key=jax.random.PRNGKey(3))
    mesh = parallel.make_mesh(8, axis_name=parallel.HYPOTHESIS_AXIS)
    out = estimation.CrossEntropyPoseEstimator(
        mesh=mesh, **kwargs).estimate_batch(z_objs, obs,
                                            key=jax.random.PRNGKey(3))
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o.translation),
                                   np.asarray(r.translation), atol=1e-4)


def test_mesh_sharded_metropolis_batch_matches():
    """Metropolis estimate_batch with mesh= matches unsharded chains."""
    from latentfusion_tpu.pose import estimation
    from latentfusion_tpu.observation import Observation

    oracle = EllipsoidOracleModel()
    gt1 = make_camera(1, key=jax.random.PRNGKey(7))
    gt2 = make_camera(1, key=jax.random.PRNGKey(8))
    obs = Observation.collate([oracle.make_observation(gt1),
                               oracle.make_observation(gt2)])
    z_objs = jnp.zeros((2, 1, 1, 1, 1, 1))

    kwargs = dict(model=oracle, ranking_size=4, loss_weights={"depth": 1.0},
                  num_samples=8, num_iters=3)

    ref = estimation.MetropolisPoseEstimator(**kwargs).estimate_batch(
        z_objs, obs, key=jax.random.PRNGKey(3))
    mesh = parallel.make_mesh(8, axis_name=parallel.HYPOTHESIS_AXIS)
    out = estimation.MetropolisPoseEstimator(
        mesh=mesh, **kwargs).estimate_batch(z_objs, obs,
                                            key=jax.random.PRNGKey(3))
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o.translation),
                                   np.asarray(r.translation), atol=1e-4)


def test_mesh_sharded_cem_estimator_matches():
    """CrossEntropyPoseEstimator(mesh=...): on-device GMM EM + elite ranking
    reduce across shards and match unsharded execution."""
    from latentfusion_tpu.pose import estimation

    oracle = EllipsoidOracleModel()
    gt_cam = make_camera(1, key=jax.random.PRNGKey(7))
    obs = oracle.make_observation(gt_cam)
    kwargs = dict(model=oracle, ranking_size=8, loss_weights={"depth": 1.0},
                  num_samples=16, num_iters=2, num_elites=8,
                  num_gmm_components=2, learning_rate=0.9,
                  sample_flipped=False)

    ref = estimation.CrossEntropyPoseEstimator(**kwargs).estimate(
        None, obs, key=jax.random.PRNGKey(3))
    mesh = parallel.make_mesh(8, axis_name=parallel.HYPOTHESIS_AXIS)
    out = estimation.CrossEntropyPoseEstimator(mesh=mesh, **kwargs).estimate(
        None, obs, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out.translation),
                               np.asarray(ref.translation), atol=1e-4)


def _tiny_train_setup(B=2, V_in=2, V_out=2):
    """Tiny recon models + a processed batch shaped like the dryrun's."""
    from latentfusion_tpu.train import init_train_state, make_optimizer

    sculptor = zoo.tiny_sculptor()
    photographer = zoo.tiny_photographer()
    fuser = zoo.tiny_fuser()
    key = jax.random.PRNGKey(0)
    params = zoo.init_recon_params(key, sculptor, fuser, photographer,
                                   batch=1, views=2)
    optimizer = make_optimizer("adam", 1e-3)
    state = init_train_state(params, optimizer)

    in_size = sculptor.in_size
    cam_in = zoo.canonical_camera(B * V_in, in_size,
                                  key=jax.random.PRNGKey(1))
    cam_in = cam_in.zoom(None, in_size, 1.5)
    cam_out = zoo.canonical_camera(B * V_out, in_size,
                                   key=jax.random.PRNGKey(2))
    cam_out = cam_out.zoom(None, in_size, 1.5)
    batch = {
        "in": {
            "image": jax.random.normal(key, (B, V_in, 3, in_size, in_size)),
            "mask": jnp.ones((B, V_in, 1, in_size, in_size)),
            "camera": cam_in,
        },
        "out_gt": {
            "image": jax.random.normal(key, (B, V_out, 3, in_size, in_size)),
            "depth": jnp.zeros((B, V_out, 1, in_size, in_size)),
            "mask": jnp.ones((B, V_out, 1, in_size, in_size)),
            "camera": cam_out,
        },
    }
    return sculptor, fuser, photographer, optimizer, state, batch, key


def test_fsdp_spec_picks_largest_divisible_dim():
    from jax.sharding import PartitionSpec as P

    # Largest dim divisible by n_fsdp gets the axis.
    assert parallel.fsdp_spec((3, 3, 8, 16), 4, min_leaf_size=1) == \
        P(None, None, None, "fsdp")
    # No divisible dim -> replicated.
    assert parallel.fsdp_spec((3, 5, 7), 4, min_leaf_size=1) == P()
    # Small leaves stay replicated regardless.
    assert parallel.fsdp_spec((8,), 4, min_leaf_size=4096) == P()
    # Scalars replicated.
    assert parallel.fsdp_spec((), 4, min_leaf_size=1) == P()


def test_make_mesh_2d_refuses_degraded():
    import pytest

    with pytest.raises(RuntimeError):
        parallel.make_mesh_2d(8, 2)  # 16 > 8 virtual devices


def test_fsdp_train_step_matches_replicated():
    """ZeRO-style training: params/opt-state sharded over the fsdp axis of a
    2-D data x fsdp mesh produce the same step as unsharded execution, and
    the updated state comes back still sharded (layout persists)."""
    from latentfusion_tpu.train import make_train_step

    (sculptor, fuser, photographer, optimizer,
     state, batch, key) = _tiny_train_setup()

    step_ref = make_train_step(sculptor, fuser, photographer, optimizer)
    ref_state, ref_loss, _ = step_ref(state, batch, key)

    mesh = parallel.make_mesh_2d(2, 4)
    state_sh = parallel.fsdp_shardings(state, mesh, min_leaf_size=2)
    sharded_state = jax.tree_util.tree_map(jax.device_put, state, state_sh)
    sharded_batch = parallel.shard_batch(batch, mesh)

    # At least one parameter leaf is genuinely sharded (local shard smaller
    # than the global shape), or the test is vacuous.
    def _is_sharded(x):
        return (hasattr(x, "addressable_shards") and x.ndim > 0
                and x.addressable_shards[0].data.shape != x.shape)

    n_sharded = sum(
        _is_sharded(leaf)
        for leaf in jax.tree_util.tree_leaves(sharded_state.params))
    assert n_sharded > 0, "no parameter leaf actually sharded"

    step_fsdp = make_train_step(sculptor, fuser, photographer, optimizer,
                                state_shardings=state_sh)
    with mesh:
        new_state, loss, _ = step_fsdp(sharded_state, sharded_batch, key)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)

    # Updated params equal the replicated run's...
    for r, o in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-5)
    # ...and stayed sharded after the optimizer update.
    n_out_sharded = sum(
        _is_sharded(leaf)
        for leaf in jax.tree_util.tree_leaves(new_state.params))
    assert n_out_sharded == n_sharded, (
        "with_sharding_constraint failed to pin the updated state's layout")


def test_tensor_parallel_decode_matches():
    """Model-axis TP: decoder weights sharded on out-channels across a
    4-device model mesh render identically to replicated execution (the
    single-object serving-latency axis — no hypothesis batch to shard)."""
    photographer = zoo.tiny_photographer()
    key = jax.random.PRNGKey(0)
    n_hyp = 2
    cam = make_camera(n_hyp, z=1.5, f=64, width=64, height=48,
                      key=jax.random.PRNGKey(1))
    cam = cam.zoom(None, 16, 1.5)
    z = jnp.zeros((n_hyp, 4, 8, 8, 8))
    params = photographer.init(key, z, cam)
    z_obj = jax.random.normal(key, (1, 1, 4, 8, 8, 8))

    def decode(p, zo, c):
        y, _, _ = models.decode(photographer, p, zo, c)
        return y["depth"], y["mask"]

    ref_d, ref_m = jax.jit(decode)(params, z_obj, cam)

    mesh = parallel.make_mesh(4, axis_name=parallel.MODEL_AXIS)
    p_sh = parallel.tp_shardings(params, mesh, min_leaf_size=2)
    params_tp = jax.tree_util.tree_map(jax.device_put, params, p_sh)
    n_sharded = sum(
        hasattr(x, "addressable_shards") and x.ndim > 0
        and x.addressable_shards[0].data.shape != x.shape
        for x in jax.tree_util.tree_leaves(params_tp))
    assert n_sharded > 0, "no decoder weight actually TP-sharded"
    z_rep = parallel.replicate(z_obj, mesh)
    cam_rep = parallel.replicate(cam, mesh)
    with mesh:
        out_d, out_m = jax.jit(decode)(params_tp, z_rep, cam_rep)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(ref_d),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref_m),
                               atol=1e-5)
