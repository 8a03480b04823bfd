"""IBR reprojection correctness on the analytic ellipsoid."""
import numpy as np

import jax
import jax.numpy as jnp

from latentfusion_tpu import ibr
from latentfusion_tpu.testing import EllipsoidOracleModel, make_camera
from latentfusion_tpu.three import quaternion as quat


def _setup(key=None):
    oracle = EllipsoidOracleModel()
    cam = make_camera(1, key=key)
    obs = oracle.make_observation(cam)
    depth_norm = cam.normalize_depth(obs.depth)
    # Paint a smooth gradient so resampling errors are measurable.
    h, w = obs.color.shape[-2:]
    yy, xx = jnp.meshgrid(jnp.linspace(0, 1, h), jnp.linspace(0, 1, w),
                          indexing="ij")
    color = jnp.stack([xx, yy, 1 - xx])[None] * obs.mask
    return cam, obs, color, depth_norm


def test_self_reprojection_is_identity():
    """Same camera in/out with true depth: the warp is the identity."""
    cam, obs, color, depth_norm = _setup(jax.random.PRNGKey(3))
    image_reproj, depth_reproj = ibr.reproject_views(
        color, depth_norm, depth_norm, cam, cam)
    assert image_reproj.shape == (1, 1, 3, *color.shape[-2:])
    m = np.asarray(obs.mask)[0, 0] > 0.5
    a = np.asarray(image_reproj)[0, 0, :, m]
    b = np.asarray(color)[0, :, m]
    assert np.abs(a - b).mean() < 0.01
    # depth_reproj is a generator *feature*, not metric depth: the reference
    # backprojects the normalized depth as if metric (ibr.py:79-88), so only
    # finiteness/range is guaranteed.
    d = np.asarray(depth_reproj)
    assert np.isfinite(d).all() and d.min() >= -1.0 - 1e-5


def test_cross_view_reprojection_overlaps():
    """A nearby view reprojects most foreground pixels consistently."""
    oracle = EllipsoidOracleModel()
    gt_q = quat.random(jax.random.PRNGKey(4), 1)
    cam_a = make_camera(1, quats=gt_q)
    near_q = quat.perturb(jax.random.PRNGKey(5), gt_q, 0.1)
    cam_b = make_camera(1, quats=near_q)
    obs_a = oracle.make_observation(cam_a)
    obs_b = oracle.make_observation(cam_b)

    depth_a = cam_a.normalize_depth(obs_a.depth)
    depth_b = cam_b.normalize_depth(obs_b.depth)
    # Reproject view A's mask into view B using B's depth.
    mask_reproj, _ = ibr.reproject_views(
        obs_a.mask, depth_a, depth_b, cam_a, cam_b)
    m_b = np.asarray(obs_b.mask)[0, 0] > 0.5
    covered = np.asarray(mask_reproj)[0, 0, 0, m_b]
    # Most of B's foreground sees A's foreground after reprojection.
    assert covered.mean() > 0.8


def test_render_ibr_weight_types():
    cam, obs, color, depth_norm = _setup(jax.random.PRNGKey(6))
    cams2 = make_camera(2, key=jax.random.PRNGKey(7))
    oracle = EllipsoidOracleModel()
    obs2 = oracle.make_observation(cams2)
    depth2 = cams2.normalize_depth(obs2.depth)
    for weight_type in ("cam_dist", "cam_angle", "cam_hybrid", "depth"):
        out, reproj = ibr.render_ibr(
            cams2, cam, jnp.broadcast_to(color, (1, 2, 3, 240, 320)),
            depth2[None], depth_norm[None], weight_type=weight_type)
        assert out.shape == (1, 1, 3, 240, 320)
        assert np.isfinite(np.asarray(out)).all()


def test_warp_blend_logits_shapes(rng):
    logits = jnp.asarray(rng.randn(2, 6, 16, 16).astype(np.float32))
    reproj = jnp.asarray(rng.rand(2, 2, 3, 16, 16).astype(np.float32))
    image, weights, dx, dy = ibr.warp_blend_logits(logits, reproj, 5)
    assert image.shape == (2, 3, 16, 16)
    np.testing.assert_allclose(np.asarray(weights.sum(axis=1)), 1.0,
                               atol=1e-5)
