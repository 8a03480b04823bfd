"""End-to-end pose estimator tests on the analytic ellipsoid oracle.

These assert actual pose recovery (translation/rotation error reduction), not
just shapes — stronger than anything the reference ships (it has no tests).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentfusion_tpu import testing
from latentfusion_tpu.camera import Camera
from latentfusion_tpu.pose import (estimation, gmm, initialization,
                                   metrics, utils as pu)
from latentfusion_tpu.three import quaternion as quat

AXES = (0.15, 0.25, 0.35)


@pytest.fixture(scope="module")
def oracle():
    return testing.EllipsoidOracleModel(axes=AXES)


@pytest.fixture(scope="module")
def gt_setup(oracle):
    key = jax.random.PRNGKey(7)
    gt_quat = quat.random(key, 1)
    gt_cam = testing.make_camera(1, quats=gt_quat)
    target_obs = oracle.make_observation(gt_cam)
    return gt_cam, target_obs


class TestOracle:
    def test_observation_sane(self, gt_setup):
        gt_cam, obs = gt_setup
        mask = np.asarray(obs.mask)
        assert 0.005 < mask.mean() < 0.6
        d = np.asarray(obs.depth)
        hit = d[d > 0]
        # Object sits around z = 3.90625 with max extent 0.35.
        assert hit.min() > 3.4 and hit.max() < 4.4

    def test_loss_zero_at_gt(self, oracle, gt_setup):
        gt_cam, obs = gt_setup
        est = estimation.GradientPoseEstimator(
            model=oracle, ranking_size=4, loss_weights={"depth": 1.0},
            learning_rate=0.01, num_samples=1, num_iters=1,
            converge_threshold=1e-6, converge_patience=10)
        zoomed = gt_cam.zoom(None, oracle.input_size, oracle.camera_dist)
        z_depth, _, z_logits, _ = est._render_zoomed(None, zoomed)
        loss = estimation.default_pose_loss(obs, z_depth, z_logits, zoomed)
        # Self-render at GT pose: depth residual small (resampling error only).
        assert float(loss["depth"][0]) < 0.01


class TestInitialization:
    def test_translation_estimate(self, gt_setup):
        gt_cam, obs = gt_setup
        cam = initialization.estimate_initial_pose(
            obs.depth, obs.mask, gt_cam.intrinsic, gt_cam.width, gt_cam.height)
        t_est = np.asarray(cam.translation[0])
        t_gt = np.asarray(gt_cam.translation[0])
        # The depth-midpoint heuristic is biased toward the front surface by
        # ~r/2 (the reference initializer shares this bias).
        assert np.linalg.norm(t_est - t_gt) < 0.3

    def test_viewports(self, gt_setup):
        _, obs = gt_setup
        vp = initialization.masks_to_viewports(obs.mask, pad=0.0)
        m = np.asarray(obs.mask[0, 0]) > 0
        ys, xs = np.where(m)
        np.testing.assert_allclose(np.asarray(vp[0]),
                                   [xs.min(), ys.min(), xs.max(), ys.max()])


class TestGradient:
    def test_refines_pose(self, oracle, gt_setup):
        gt_cam, obs = gt_setup
        key = jax.random.PRNGKey(1)
        # Perturb GT: small rotation + translation offset.
        pert_quat = quat.perturb(key, gt_cam.quaternion, 0.15)
        init_cam = gt_cam.with_quaternion(pert_quat).replace(
            translation=gt_cam.translation + jnp.array([[0.02, -0.02, 0.04]]))
        init_cam = Camera.cat([init_cam] * 4)
        init_cam = pu.perturb_camera(jax.random.PRNGKey(2), init_cam,
                                     0.005, 0.02)

        est = estimation.GradientPoseEstimator(
            model=oracle, ranking_size=4,
            loss_weights={"depth": 1.0, "ov_depth": 0.3},
            learning_rate=0.01, num_samples=4, num_iters=60,
            converge_threshold=1e-6, converge_patience=60, optimizer="adam")
        best = est.estimate(None, obs, camera=init_cam)

        rot_err_final = float(quat.angular_distance(
            best.quaternion, gt_cam.quaternion)[0, 0])
        t_err_init = float(jnp.linalg.norm(
            init_cam.translation - gt_cam.translation, axis=-1).min())
        t_err_final = float(jnp.linalg.norm(
            best.translation[0:1] - gt_cam.translation, axis=-1).min())
        # Best-ranked hypothesis: translation tightens below the best initial
        # hypothesis; rotation stays in the convergence basin.
        assert t_err_final < t_err_init
        assert rot_err_final < 0.15

    def test_unrolled_loop_bit_exact(self, oracle, gt_setup):
        """Masked-unroll while body (set_refine_unroll) returns the SAME
        ranking as unroll=1 — including with early stopping mid-block, the
        case the jnp.where fixpoint masking exists for."""
        gt_cam, obs = gt_setup
        init_cam = pu.perturb_camera(jax.random.PRNGKey(3),
                                     Camera.cat([gt_cam] * 4), 0.05, 0.03)

        def run():
            est = estimation.GradientPoseEstimator(
                model=oracle, ranking_size=4,
                loss_weights={"depth": 1.0, "ov_depth": 0.3},
                learning_rate=0.01, num_samples=4, num_iters=21,
                converge_threshold=1e-3, converge_patience=2,
                optimizer="adam", track_stats=True)
            return est.estimate(None, obs, camera=init_cam)

        base, base_stats = run()
        try:
            estimation.set_refine_unroll(3)
            unrolled, un_stats = run()
        finally:
            estimation.set_refine_unroll(1)

        np.testing.assert_array_equal(np.asarray(base.translation),
                                      np.asarray(unrolled.translation))
        np.testing.assert_array_equal(np.asarray(base.quaternion),
                                      np.asarray(unrolled.quaternion))
        # The unrolled loop may only overshoot the stop point by < unroll.
        n_base = int(base_stats["num_steps"])
        n_unroll = int(un_stats["num_steps"])
        assert n_base <= n_unroll < n_base + 3

    def test_early_stopping(self, oracle, gt_setup):
        gt_cam, obs = gt_setup
        est = estimation.GradientPoseEstimator(
            model=oracle, ranking_size=2, loss_weights={"depth": 1.0},
            learning_rate=0.0,  # no movement -> converges immediately
            num_samples=2, num_iters=100, converge_threshold=1e-6,
            converge_patience=3)
        cam = Camera.cat([gt_cam, gt_cam])
        best, = [est.estimate(None, obs, camera=cam)]
        # with lr=0 the loop should stop after ~patience steps, fine if ran.
        assert len(best) == 2


class TestCEM:
    def test_coarse_search_finds_orientation(self, oracle, gt_setup):
        gt_cam, obs = gt_setup
        est = estimation.CrossEntropyPoseEstimator(
            model=oracle, ranking_size=8,
            loss_weights={"depth": 1.0},
            num_samples=64, num_elites=24, num_iters=6,
            num_gmm_components=3, learning_rate=0.9, sample_flipped=True)
        best = est.estimate(None, obs, key=jax.random.PRNGKey(0))
        assert len(best) == 8
        # The ellipsoid has 180-degree flip symmetries; accept the minimum
        # distance to the 4 symmetric GT orientations.
        gt_quats = [gt_cam.quaternion]
        for axis in [(1.0, 0, 0), (0, 1.0, 0), (0, 0, 1.0)]:
            gt_quats.append(pu.flip_camera(gt_cam, axis).quaternion)
        dists = jnp.stack([
            quat.angular_distance(best.quaternion, q)[:, 0] for q in gt_quats])
        best_rot_err = float(dists.min())
        # Translation close and orientation in the right basin.
        t_err = float(jnp.linalg.norm(
            best.translation[0] - gt_cam.translation[0]))
        assert t_err < 0.25
        assert best_rot_err < 0.8


class TestMetropolis:
    def test_chain_improves(self, oracle, gt_setup):
        gt_cam, obs = gt_setup
        est = estimation.MetropolisPoseEstimator(
            model=oracle, ranking_size=4, loss_weights={"depth": 1.0},
            num_samples=16, num_iters=15)
        best = est.estimate(None, obs, key=jax.random.PRNGKey(0))
        assert len(best) == 4
        t_err = float(jnp.linalg.norm(
            best.translation[0] - gt_cam.translation[0]))
        assert t_err < 0.25


class TestGMM:
    def test_fit_recovers_clusters(self):
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        a = jax.random.normal(k1, (200, 2)) * 0.1 + jnp.array([2.0, 0.0])
        b = jax.random.normal(k2, (200, 2)) * 0.1 + jnp.array([-2.0, 0.0])
        data = jnp.concatenate([a, b])
        g = gmm.fit(k3, data, 2, n_iter=40)
        means = np.sort(np.asarray(g.means[:, 0]))
        np.testing.assert_allclose(means, [-2.0, 2.0], atol=0.15)
        np.testing.assert_allclose(np.asarray(g.weights), [0.5, 0.5], atol=0.1)

    def test_weighted_fit_ignores_masked(self):
        key = jax.random.PRNGKey(0)
        data = jnp.concatenate([jnp.zeros((100, 2)),
                                jnp.full((100, 2), 100.0)])
        w = jnp.concatenate([jnp.ones(100), jnp.zeros(100)])
        g = gmm.fit(key, data, 2, sample_weights=w, n_iter=20)
        assert float(jnp.abs(g.means).max()) < 1.0

    def test_sample_shapes(self):
        key = jax.random.PRNGKey(0)
        g = gmm.DiagGMM(jnp.array([0.5, 0.5]),
                        jnp.zeros((2, 6)), jnp.ones((2, 6)))
        s = gmm.sample(key, g, 32)
        assert s.shape == (32, 6)


class TestMetricsModule:
    def test_add_zero_for_same_pose(self, gt_setup):
        gt_cam, _ = gt_setup
        pts = jax.random.normal(jax.random.PRNGKey(0), (100, 3)) * 0.1
        m = metrics.camera_metrics(gt_cam, gt_cam.clone(), pts, 1.0)
        assert m["add"] < 1e-6
        assert m["add_s"] < 1e-5
        # acos_safe clamps at 1 - 1e-7, so "zero" distance reads ~9e-4.
        assert m["rotation_dist"] < 2e-3

    def test_add_s_symmetric_invariance(self, gt_setup):
        gt_cam, _ = gt_setup
        # Points symmetric about z-axis; ADD large but ADD-sym small for a
        # z-flipped pose.
        pts = jnp.array([[0.1, 0.0, 0.0], [-0.1, 0.0, 0.0],
                         [0.0, 0.1, 0.0], [0.0, -0.1, 0.0]])
        flipped = pu.flip_camera(gt_cam, (0.0, 0.0, 1.0))
        add = metrics.compute_point_add(gt_cam.obj_to_cam,
                                        flipped.obj_to_cam, pts)
        add_sym = metrics.compute_point_add_sym(gt_cam.obj_to_cam,
                                                flipped.obj_to_cam, pts)
        assert float(add) > 0.05
        assert float(add_sym) < 1e-5


def test_load_from_config_toml(tmp_path, oracle):
    cfg = tmp_path / "est.toml"
    cfg.write_text(
        """
type = "gradient"

[args]
optimizer = "adam"
num_iters = 5
num_samples = 2
ranking_size = 2
learning_rate = 0.01
lr_reduce_patience = 10
lr_reduce_threshold = 1e-4
converge_threshold = 1e-6
converge_patience = 10

[loss_weights]
depth = 1.0
ov_depth = 0.3
"""
    )
    est = estimation.load_from_config(cfg, oracle)
    assert isinstance(est, estimation.GradientPoseEstimator)
    assert est.num_samples == 2
    assert est.loss_weights["depth"] == 1.0


class TestGradientBatch:
    def test_estimate_batch_matches_single(self, oracle):
        # Two targets of the same oracle object at different poses. The
        # batched loop must produce (per object) the same refinement as two
        # independent single-object runs with identical hypotheses.
        q1 = quat.random(jax.random.PRNGKey(7), 1)
        q2 = quat.random(jax.random.PRNGKey(8), 1)
        gt1 = testing.make_camera(1, quats=q1)
        gt2 = testing.make_camera(1, quats=q2)
        gt2 = gt2.replace(
            translation=gt2.translation + jnp.array([[0.08, -0.05, 0.15]]))
        targets = [oracle.make_observation(gt1), oracle.make_observation(gt2)]

        def init_block(gt_cam, seed):
            pert = quat.perturb(jax.random.PRNGKey(seed), gt_cam.quaternion,
                                0.15)
            cam = gt_cam.with_quaternion(pert).replace(
                translation=gt_cam.translation
                + jnp.array([[0.02, -0.02, 0.04]]))
            cam = Camera.cat([cam] * 4)
            return pu.perturb_camera(jax.random.PRNGKey(seed + 1), cam,
                                     0.005, 0.02)

        inits = [init_block(gt1, 11), init_block(gt2, 22)]
        kwargs = dict(
            model=oracle, ranking_size=4,
            loss_weights={"depth": 1.0, "ov_depth": 0.3},
            learning_rate=0.01, num_samples=4, num_iters=40,
            converge_threshold=1e-6, converge_patience=40, optimizer="adam",
            track_stats=True)

        est = estimation.GradientPoseEstimator(**kwargs)
        z_objs = jnp.zeros((2, 1, 1, 2, 2, 2))  # oracle ignores the latent
        results, stats = est.estimate_batch(z_objs, targets,
                                            cameras=Camera.cat(inits))
        assert len(results) == 2
        assert stats["loss_history"].shape == (40, 2)

        single = estimation.GradientPoseEstimator(**kwargs)
        for b in (0, 1):
            ref, ref_stats = single.estimate(None, targets[b],
                                             camera=inits[b])
            best = results[b]
            np.testing.assert_allclose(np.asarray(best.translation),
                                       np.asarray(ref.translation),
                                       atol=1e-3)
            np.testing.assert_allclose(np.asarray(best.log_quaternion),
                                       np.asarray(ref.log_quaternion),
                                       atol=1e-3)
            # Per-object loss history must decrease from the first step.
            hist = np.asarray(stats["loss_history"][:, b])
            assert np.nanmin(hist) < hist[0]
            np.testing.assert_allclose(
                hist, np.asarray(ref_stats["loss_history"]), atol=1e-4)
        # Cross-assignment: each result tracks its OWN target translation.
        t1 = float(jnp.linalg.norm(results[0].translation[0:1]
                                   - gt1.translation, axis=-1)[0])
        x12 = float(jnp.linalg.norm(results[0].translation[0:1]
                                    - gt2.translation, axis=-1)[0])
        t2 = float(jnp.linalg.norm(results[1].translation[0:1]
                                   - gt2.translation, axis=-1)[0])
        x21 = float(jnp.linalg.norm(results[1].translation[0:1]
                                    - gt1.translation, axis=-1)[0])
        assert t1 < x12 and t2 < x21


class TestCEMBatch:
    def test_batched_coarse_plus_fine_recovers_poses(self, oracle):
        """The full multi-object pipeline: CEM estimate_batch coarse search
        warm-starts Gradient estimate_batch; each object recovers its own
        pose (coarse alone leaves ~0.2 translation error — refinement is
        the translation workhorse, matching the single-object pipeline)."""
        q1 = quat.random(jax.random.PRNGKey(7), 1)
        q2 = quat.random(jax.random.PRNGKey(9), 1)
        gt1 = testing.make_camera(1, quats=q1)
        gt2 = testing.make_camera(1, quats=q2)
        targets = [oracle.make_observation(gt1), oracle.make_observation(gt2)]
        z_objs = jnp.zeros((2, 1, 1, 2, 2, 2))  # oracle ignores the latent

        # Reference-shaped coarse budget (cross_entropy_quick: 128 samples
        # x 4 flips, 6 components): the smaller 64x3 budget recovers
        # orientation only seed-luckily on a full-SO(3) search.
        coarse = estimation.CrossEntropyPoseEstimator(
            model=oracle, ranking_size=8, loss_weights={"depth": 1.0},
            num_samples=128, num_elites=48, num_iters=10,
            num_gmm_components=6, learning_rate=0.75, sample_flipped=True)
        coarse_out = coarse.estimate_batch(z_objs, targets,
                                           key=jax.random.PRNGKey(0))
        assert len(coarse_out) == 2 and all(len(c) == 8 for c in coarse_out)

        fine = estimation.GradientPoseEstimator(
            model=oracle, ranking_size=8,
            loss_weights={"depth": 1.0, "ov_depth": 0.3},
            learning_rate=0.01, num_samples=8, num_iters=100,
            converge_threshold=1e-6, converge_patience=100, optimizer="adam")
        results = fine.estimate_batch(z_objs, targets,
                                      cameras=Camera.cat(coarse_out))

        def score(target, cam):
            z = jnp.zeros((1, 1, 1, 2, 2, 2))
            loss, _ = fine._score_hypotheses(z, target, cam)
            return float(loss.min())

        for b, (coarse_cams, best, gt_cam) in enumerate(
                zip(coarse_out, results, (gt1, gt2))):
            t_err = float(jnp.linalg.norm(
                best.translation[0:1] - gt_cam.translation, axis=-1)[0])
            # Initial translation error is ~0.2-0.3; refined lands ~0.1
            # (trajectories are chaotic; the bar verifies convergence, not
            # a specific optimum).
            assert t_err < 0.13, t_err
            # Objective-level recovery gate: a smooth ellipsoid's depth map
            # is weakly rotation-observable, so absolute orientation bars
            # are seed lotteries (measured 0.08-0.9 rad coarse landings at
            # the reference budget, same in the pre-r3 code). What a
            # render-and-compare estimator CAN promise is finding a pose
            # that scores at least as well as the ground truth.
            gt_loss = score(targets[b], gt_cam)
            refined_loss = score(targets[b], best[:1])
            assert refined_loss < score(targets[b], coarse_cams[:1]) + 1e-6
            assert refined_loss < gt_loss * 1.05 + 1e-4, (refined_loss,
                                                          gt_loss)
        # Cross-assignment: each refined pose explains its OWN target better
        # than the other object's target (both share the same translation,
        # so this isolates orientation tracking). Checked at the objective
        # level — angular-proximity comparisons on a smooth ellipsoid are
        # chaotic in the estimate's fp rounding (a 4e-6 init perturbation
        # measurably flips them).
        assert (score(targets[0], results[0][:1])
                < score(targets[1], results[0][:1]))
        assert (score(targets[1], results[1][:1])
                < score(targets[0], results[1][:1]))


class TestMetropolisBatch:
    def test_estimate_batch_two_objects(self, oracle):
        q1 = quat.random(jax.random.PRNGKey(7), 1)
        q2 = quat.random(jax.random.PRNGKey(9), 1)
        gt1 = testing.make_camera(1, quats=q1)
        gt2 = testing.make_camera(1, quats=q2)
        targets = [oracle.make_observation(gt1), oracle.make_observation(gt2)]
        est = estimation.MetropolisPoseEstimator(
            model=oracle, ranking_size=4, loss_weights={"depth": 1.0},
            num_samples=16, num_iters=20)
        z_objs = jnp.zeros((2, 1, 1, 2, 2, 2))
        results = est.estimate_batch(z_objs, targets,
                                     key=jax.random.PRNGKey(0))
        assert len(results) == 2
        for best in results:
            assert len(best) == 4
            # Chains accepted some moves: ranking populated with finite
            # losses and poses near the depth-based init (z ~ 3.9).
            assert np.isfinite(np.asarray(best.translation)).all()
            assert 3.0 < float(best.translation[0, 2]) < 5.0


class TestWeighLosses:
    def test_static_zero_weights_dropped(self):
        """Zero Python-float weights must drop the term entirely (so the
        mask/IoU chains are DCE'd from the refinement loop) while traced
        array weights are always kept (learned-weight distillation)."""
        loss_dict = {"depth": jnp.ones(4), "mask": jnp.full(4, 7.0),
                     "iou": jnp.full(4, 9.0)}
        out = estimation.weigh_losses(
            loss_dict, {"depth": 1.0, "mask": 0.0})
        assert set(out) == {"depth"}  # iou missing from weights -> 0.0
        np.testing.assert_allclose(np.asarray(out["depth"]), 1.0)

        traced = estimation.weigh_losses(
            loss_dict, {"depth": jnp.array(0.0), "mask": 2.0})
        assert set(traced) == {"depth", "mask"}
        np.testing.assert_allclose(np.asarray(traced["mask"]), 14.0)
