"""Golden-value and identity tests for the L0 math kernel.

Cross-checked against scipy.spatial.transform (independent implementation)
and algebraic identities, per SURVEY.md §4 test strategy.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latentfusion_tpu import three
from latentfusion_tpu.three import quaternion as q


def random_quats(rng, n):
    v = rng.randn(n, 4)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


class TestQuaternion:
    def test_quat_to_mat_vs_scipy(self, rng):
        quats = random_quats(rng, 32).astype(np.float32)
        ours = np.asarray(q.quat_to_mat(jnp.asarray(quats)))
        # scipy uses (x, y, z, w)
        theirs = R.from_quat(quats[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_mat_to_quat_roundtrip(self, rng):
        quats = random_quats(rng, 64).astype(np.float32)
        mats = q.quat_to_mat(jnp.asarray(quats))
        quats2 = q.mat_to_quat(mats)
        mats2 = q.quat_to_mat(quats2)
        np.testing.assert_allclose(np.asarray(mats), np.asarray(mats2), atol=1e-4)

    def test_mat_to_quat_branches(self):
        # Exercise each selection branch: identity (trace>0) and 180-degree
        # rotations about each axis (trace = -1).
        for axis in [(1.0, 0, 0), (0, 1.0, 0), (0, 0, 1.0)]:
            quat = q.from_axis_angle(jnp.array([axis]), math.pi)
            mat = q.quat_to_mat(quat)
            rec = q.mat_to_quat(mat)
            d = q.angular_distance(quat, rec)
            assert float(d[0, 0]) < 1e-3

    def test_qexp_qlog_roundtrip(self, rng):
        quats = random_quats(rng, 32).astype(np.float32)
        # Make w positive to stay on the principal branch.
        quats[:, 0] = np.abs(quats[:, 0])
        lq = q.qlog(jnp.asarray(quats))
        rec = q.qexp(lq)
        np.testing.assert_allclose(np.asarray(rec), quats, atol=1e-4)

    def test_qexp_imaginary_input(self, rng):
        v = jnp.asarray(rng.randn(8, 3).astype(np.float32) * 0.3)
        full = jnp.concatenate([jnp.zeros((8, 1)), v], axis=-1)
        np.testing.assert_allclose(
            np.asarray(q.qexp(v)), np.asarray(q.qexp(full)), atol=1e-6
        )

    def test_qmul_matches_matrix_product(self, rng):
        q1 = jnp.asarray(random_quats(rng, 16).astype(np.float32))
        q2 = jnp.asarray(random_quats(rng, 16).astype(np.float32))
        q12 = q.qmul(q1, q2)
        m12 = q.quat_to_mat(q12)
        m_ref = q.quat_to_mat(q1) @ q.quat_to_mat(q2)
        np.testing.assert_allclose(np.asarray(m12), np.asarray(m_ref), atol=1e-5)

    def test_rotate_vector_matches_matrix(self, rng):
        quats = jnp.asarray(random_quats(rng, 16).astype(np.float32))
        vecs = jnp.asarray(rng.randn(16, 3).astype(np.float32))
        out = q.rotate_vector(quats, vecs)
        ref = jnp.einsum("bij,bj->bi", q.quat_to_mat(quats), vecs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_random_unit_norm(self):
        quats = q.random(jax.random.PRNGKey(0), 100)
        norms = jnp.linalg.norm(quats, axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)

    def test_angular_distance(self):
        qa = q.identity(1)
        qb = q.from_axis_angle(jnp.array([[0.0, 0.0, 1.0]]), math.pi / 2)
        d = q.angular_distance(qa, qb)
        np.testing.assert_allclose(float(d[0, 0]), math.pi / 2, atol=1e-4)

    def test_perturb_small_angle(self):
        key = jax.random.PRNGKey(1)
        base = q.random(key, 64)
        pert = q.perturb(jax.random.PRNGKey(2), base, 0.01)
        d = jnp.diagonal(q.angular_distance(base, pert))
        assert float(d.max()) < 0.2


class TestRigid:
    def test_compose_decompose(self, rng):
        quats = jnp.asarray(random_quats(rng, 8).astype(np.float32))
        trans = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        E = three.to_extrinsic_matrix(trans, quats)
        Rm, Tm = three.decompose(E)
        np.testing.assert_allclose(
            np.asarray(Tm[:, :3, 3]), np.asarray(trans), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(Rm[:, :3, :3]), np.asarray(q.quat_to_mat(quats)), atol=1e-5
        )

    def test_inverse_transform(self, rng):
        quats = jnp.asarray(random_quats(rng, 8).astype(np.float32))
        trans = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        E = three.to_extrinsic_matrix(trans, quats)
        Einv = three.inverse_transform(E)
        prod = E @ Einv
        np.testing.assert_allclose(
            np.asarray(prod), np.tile(np.eye(4), (8, 1, 1)), atol=1e-5
        )

    def test_extrinsic_to_position(self, rng):
        quats = jnp.asarray(random_quats(rng, 4).astype(np.float32))
        trans = jnp.asarray(rng.randn(4, 3).astype(np.float32))
        E = three.to_extrinsic_matrix(trans, quats)
        pos = three.extrinsic_to_position(E)
        # Reference semantics (rigid.py:119-128): returns R^T t (the camera
        # center is -R^T t; the reference omits the negation and we match it).
        ref = jnp.einsum("bij,bj->bi", jnp.swapaxes(q.quat_to_mat(quats), 1, 2), trans)
        np.testing.assert_allclose(np.asarray(pos), np.asarray(ref), atol=1e-5)

    def test_intrinsic_to_3x4(self):
        K = jnp.eye(3)
        K4 = three.intrinsic_to_3x4(K)
        assert K4.shape == (3, 4)
        np.testing.assert_allclose(np.asarray(K4[:, 3]), 0.0)


class TestCore:
    def test_homogenize_roundtrip(self, rng):
        pts = jnp.asarray(rng.randn(5, 10, 3).astype(np.float32))
        h = three.homogenize(pts)
        assert h.shape == (5, 10, 4)
        np.testing.assert_allclose(np.asarray(three.dehomogenize(h)), np.asarray(pts),
                                   atol=1e-6)

    def test_transform_coords_identity(self, rng):
        pts = jnp.asarray(rng.randn(2, 7, 3).astype(np.float32))
        E = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
        out = three.transform_coords(pts, E)
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)

    def test_transform_coords_unbatched(self, rng):
        pts = jnp.asarray(rng.randn(7, 3).astype(np.float32))
        E = three.to_extrinsic_matrix(jnp.array([[1.0, 2.0, 3.0]]), q.identity(1))
        out = three.transform_coords(pts, E)
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts) + np.array([1, 2, 3]),
                                   atol=1e-5)

    def test_points_stats(self, rng):
        pts = jnp.asarray(rng.rand(100, 3).astype(np.float32))
        bound = three.points_bound(pts)
        assert bound.shape == (3, 2)
        assert float(three.points_diameter(pts)) >= float(three.points_radius(pts))


class TestBatchView:
    def test_bv2b_b2bv_roundtrip(self, rng):
        x = jnp.asarray(rng.randn(2, 3, 4, 5).astype(np.float32))
        folded = three.bv2b(x)
        assert folded.shape == (6, 4, 5)
        unfolded = three.b2bv(folded, num_view=3)
        np.testing.assert_allclose(np.asarray(unfolded), np.asarray(x))
        unfolded2 = three.b2bv(folded, batch_size=2)
        np.testing.assert_allclose(np.asarray(unfolded2), np.asarray(x))

    def test_vcat_vsplit(self, rng):
        a = jnp.asarray(rng.randn(4, 3).astype(np.float32))  # B=2, V=2
        b = jnp.asarray(rng.randn(6, 3).astype(np.float32))  # B=2, V=3
        cat = three.vcat([a, b], batch_size=2)
        assert cat.shape == (10, 3)
        sa, sb = three.vsplit(cat, [2, 3])
        np.testing.assert_allclose(np.asarray(sa), np.asarray(a))
        np.testing.assert_allclose(np.asarray(sb), np.asarray(b))

    def test_bvmm(self, rng):
        a = jnp.asarray(rng.randn(2, 3, 4, 4).astype(np.float32))
        b = jnp.asarray(rng.randn(2, 3, 4, 4).astype(np.float32))
        out = three.bvmm(a, b)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(a) @ np.asarray(b), atol=1e-5
        )


class TestOrientation:
    def test_evenly_distributed_points_on_sphere(self):
        pts = three.orientation.evenly_distributed_points(128)
        norms = jnp.linalg.norm(pts, axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)

    def test_evenly_distributed_points_hemisphere(self):
        pts = three.orientation.evenly_distributed_points(64, hemisphere=True)
        assert float(pts[:, 2].min()) > -1e-5

    def test_evenly_distributed_quats_unit(self):
        quats = three.orientation.evenly_distributed_quats(32)
        norms = jnp.linalg.norm(quats, axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-4)

    def test_quats_look_at_origin(self):
        # random_quat_from_ray(-ray): camera forward (third row of R) is -ray.
        rays = three.orientation.evenly_distributed_points(16)
        quats = three.orientation.random_quat_from_ray(
            -rays, None, key=jax.random.PRNGKey(0))
        mats = q.quat_to_mat(quats)
        np.testing.assert_allclose(
            np.asarray(mats[:, 2, :]), np.asarray(-rays), atol=1e-4
        )

    def test_sample_hemisphere(self):
        rays = three.orientation.sample_hemisphere_rays(
            jax.random.PRNGKey(0), 256, (0.0, 0.0, 1.0))
        assert float(rays[:, 2].min()) >= 0.0

    def test_segment_rays(self):
        rays = three.orientation.sample_segment_rays(
            jax.random.PRNGKey(0), 64, (0.0, 0.0, 1.0), 0.1, 0.5)
        angles = np.arccos(np.clip(np.asarray(rays)[:, 2], -1, 1))
        assert (angles >= 0.1 - 1e-4).all() and (angles <= 0.5 + 1e-4).all()

    def test_disk_sample_quats(self):
        quats = three.orientation.disk_sample_quats(
            jax.random.PRNGKey(0), 16, min_angle=0.3)
        assert quats.shape == (16, 4)
        norms = jnp.linalg.norm(quats, axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-4)


class TestFarthestPoints:
    def test_centers_spread(self, rng):
        data = jnp.asarray(rng.randn(100, 3).astype(np.float32))

        def dist(a, b):
            return jnp.linalg.norm(a - b, axis=-1)

        clusters, centers = three.utils.farthest_points(
            data, 10, dist, return_center_indexes=True)
        assert len(set(np.asarray(centers).tolist())) == 10

    def test_fewer_points_than_clusters(self, rng):
        data = jnp.asarray(rng.randn(5, 3).astype(np.float32))
        out = three.utils.farthest_points(data, 10, lambda a, b: jnp.zeros(5))
        np.testing.assert_array_equal(np.asarray(out), np.arange(5))


class TestStats:
    def test_mad_outliers(self):
        data = jnp.asarray(np.array([1.0, 1.1, 0.9, 1.05, 50.0], dtype=np.float32))
        mask = three.stats.mask_outliers_mad(data, 3.0)
        assert not bool(mask[-1])
        assert bool(mask[0])


class TestHostTwins:
    """three.host numpy twins pinned to the jnp implementations (the host
    data path runs these in CPU workers without jax dispatch)."""

    def test_quat_to_mat_matches(self):
        rng = np.random.RandomState(0)
        q = rng.randn(32, 4).astype(np.float32)
        np.testing.assert_allclose(
            three.host.quat_to_mat(q),
            np.asarray(three.quaternion.quat_to_mat(jnp.asarray(q))),
            atol=1e-6)

    def test_qmul_matches(self):
        rng = np.random.RandomState(1)
        q1 = rng.randn(16, 4).astype(np.float32)
        q2 = rng.randn(16, 4).astype(np.float32)
        np.testing.assert_allclose(
            three.host.qmul(q1, q2),
            np.asarray(three.quaternion.qmul(jnp.asarray(q1),
                                             jnp.asarray(q2))),
            atol=1e-6)

    def test_to_extrinsic_matrix_matches(self):
        rng = np.random.RandomState(2)
        t = rng.randn(8, 3).astype(np.float32)
        q = rng.randn(8, 4).astype(np.float32)
        np.testing.assert_allclose(
            three.host.to_extrinsic_matrix(t, q),
            np.asarray(three.to_extrinsic_matrix(jnp.asarray(t),
                                                 jnp.asarray(q))),
            atol=1e-6)
