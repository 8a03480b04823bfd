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
