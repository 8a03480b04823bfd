"""Multi-lobe procedural object pool (the unseen-object rig's object zoo,
``testing.sample_lobe_shapes`` / ``render_lobe_shape``): geometric
consistency of the analytic renderer against the sampled surface clouds."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentfusion_tpu import testing
from latentfusion_tpu.three import quaternion as quat


@pytest.fixture(scope="module")
def pool():
    return testing.sample_lobe_shapes(0, 4, diameter=1.0, n_points=256)


def test_pool_shapes_and_diameter(pool):
    stacked, clouds = pool
    assert stacked["centers"].shape == (4, 4, 3)
    assert stacked["rots"].shape == (4, 4, 3, 3)
    assert len(clouds) == 4
    for pts in clouds:
        # Clouds are subsampled AFTER the exact-diameter rescale, so their
        # diameter can only shrink slightly below the target.
        d = np.sqrt(((pts[None] - pts[:, None]) ** 2).sum(-1)).max()
        assert 0.9 < d <= 1.0 + 1e-5, d
        # Recentring: surface centroid at the origin (pre-subsample, so
        # loose).
        assert np.abs(pts.mean(0)).max() < 0.1


def test_seed_stream_prefix_invariance():
    """Shape ``i`` of a seed stream is identical no matter how many shapes
    are drawn after it — ``bench.py --acc-object heldout-lobe`` relies on
    this to rebuild the unseen-objects rig's held-out object 0 by drawing a
    single shape from stream 7919 (the rig draws 2 or 4)."""
    one, clouds_one = testing.sample_lobe_shapes(7919, 1, n_points=256)
    four, clouds_four = testing.sample_lobe_shapes(7919, 4, n_points=256)
    for k in one:
        np.testing.assert_array_equal(np.asarray(one[k][0]),
                                      np.asarray(four[k][0]))
    np.testing.assert_array_equal(clouds_one[0], clouds_four[0])


def test_disjoint_seed_streams_give_different_shapes(pool):
    stacked, _ = pool
    other, _ = testing.sample_lobe_shapes(7919, 4, diameter=1.0,
                                          n_points=256)
    assert not np.allclose(np.asarray(stacked["axes"]),
                           np.asarray(other["axes"]), atol=1e-3)


def test_render_depth_matches_surface_cloud(pool):
    """Backprojecting rendered depth pixels must land ON the union surface:
    every backprojected point is within a few voxels of the sampled cloud,
    and the rendered depths bracket the cloud's depth extent."""
    stacked, clouds = pool
    shape = testing.index_lobe_shape(stacked, 2)
    cam = testing.make_camera(1, z=5.78, f=615.0, width=160, height=120,
                              quats=quat.random(jax.random.PRNGKey(1), 1))
    depth, mask, mask_logits, onehot = jax.jit(
        lambda c: testing.render_lobe_shape(c, shape))(cam)
    assert float(mask.sum()) > 50

    # Backproject hit pixels into object space via the camera rays.
    o_obj, d_obj = testing._camera_rays(cam)
    pts = np.asarray(o_obj + d_obj * np.asarray(depth[:, 0])[..., None])
    hit = np.asarray(mask[:, 0]) > 0.5
    pts = pts[hit]
    cloud = clouds[2]
    dists = np.sqrt(
        ((pts[:, None, :] - cloud[None]) ** 2).sum(-1)).min(1)
    # Surface cloud has 256 points on a unit-diameter object: nearest
    # sample within ~0.1 everywhere.
    assert float(np.quantile(dists, 0.95)) < 0.12, float(dists.max())

    # Soft-mask logits agree in sign with the hard mask on clear pixels.
    ml = np.asarray(mask_logits[:, 0])
    assert (ml[hit] > 0).mean() > 0.99
    assert (ml[~hit] < 0).mean() > 0.9

    # Each hit pixel attributes to at least one lobe (ties allowed).
    s = np.asarray(onehot.sum(-1))[hit]
    assert (s >= 1.0 - 1e-5).all()


def test_color_shading_is_pose_covariant(pool):
    """Rotating the CAMERA and the OBJECT together leaves the headlight-lit
    rendering identical up to resampling: check via two renders with the
    same relative pose reaching identical images."""
    stacked, _ = pool
    shape = testing.index_lobe_shape(stacked, 0)
    q = quat.random(jax.random.PRNGKey(3), 1)
    cam_a = testing.make_camera(1, z=5.78, f=615.0, width=64, height=48,
                                quats=q)
    cam_b = testing.make_camera(1, z=5.78, f=615.0, width=64, height=48,
                                quats=q)

    def render(c):
        d, m, _, oh = testing.render_lobe_shape(c, shape)
        return testing.lobe_shape_color(c, d, m, oh, shape)

    a = np.asarray(jax.jit(render)(cam_a))
    b = np.asarray(jax.jit(render)(cam_b))
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-5
    assert a.std() > 0.01  # texture actually varies


def test_pose_gradients_flow(pool):
    stacked, _ = pool
    shape = testing.index_lobe_shape(stacked, 1)
    cam = testing.make_camera(1, z=5.78, f=615.0, width=64, height=48,
                              quats=quat.random(jax.random.PRNGKey(5), 1))

    def loss(lq):
        d, m, ml, _ = testing.render_lobe_shape(
            cam.replace(log_quaternion=lq), shape)
        return (d ** 2).sum() + (jax.nn.sigmoid(ml) ** 2).sum()

    g = jax.jit(jax.grad(loss))(cam.log_quaternion)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_lobe_mesh_matches_analytic_render(pool, tmp_path):
    """The triangulated lobe meshes (testing.lobe_shape_meshes — the REAL
    data path's geometry) must agree with the analytic ray tracer: z-buffer
    rendering of the concatenated closed lobes is the union's visible
    surface."""
    from latentfusion_tpu.data import rendering

    stacked, clouds = pool
    paths = testing.lobe_shape_meshes(stacked, tmp_path)
    assert len(paths) == 4

    intrinsic = np.array([[615.0, 0, 320], [0, 615.0, 240], [0, 0, 1]],
                         np.float32)
    r = rendering.Renderer(width=640, height=480)
    cam = testing.make_camera(1, z=5.78, f=615.0, width=640, height=480,
                              quats=quat.random(jax.random.PRNGKey(3), 1))
    for k in (0, 2):
        obj, _ = rendering.load_object(paths[k], recenter=False,
                                       resize=False)
        ctx = rendering.SceneContext(obj, intrinsic)
        ext = np.asarray(cam.extrinsic)[0]
        q = np.asarray(quat.mat_to_quat(jnp.asarray(ext[:3, :3])))
        ctx.set_pose(ext[:3, 3], q)
        _, depth, mask = r.render(ctx)

        shape = testing.index_lobe_shape(stacked, k)
        d_o, m_o, _, _ = testing.render_lobe_shape(cam, shape)
        d_o = np.asarray(d_o[0, 0])
        m_o = np.asarray(m_o[0, 0])

        inter = ((mask > 0.5) & (m_o > 0.5)).sum()
        union = ((mask > 0.5) | (m_o > 0.5)).sum()
        assert inter / union > 0.95, (k, inter / union)
        both = (mask > 0.5) & (m_o > 0.5)
        err = np.abs(depth - d_o)[both]
        assert err.mean() < 0.02, (k, err.mean())


def test_procedural_assets_roundtrip(tmp_path):
    """Texture/background generators write images the synthetic stream's
    loaders accept (COCO stand-ins for the zero-egress environment)."""
    import imageio.v2 as imageio

    from latentfusion_tpu.data import synthetic

    tex_dir = synthetic.make_procedural_textures(tmp_path / "tex", n=3,
                                                 size=64)
    bg_dir = synthetic.make_procedural_backgrounds(
        tmp_path / "bg", n_color=2, n_depth=2, width=64, height=48)
    texs = sorted(tex_dir.glob("*.jpg"))
    assert len(texs) == 3
    img = imageio.imread(texs[0])
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8

    ds = synthetic.SyntheticDataset(
        [], num_input_views=1, num_output_views=1, width=64, height=48,
        use_textures=True, textures_dir=tex_dir,
        color_random_background=True, color_background_dir=bg_dir,
        depth_random_background=True, depth_background_dir=bg_dir)
    assert len(ds.texture_paths) == 3
    assert len(ds.color_background_paths) == 2
    assert len(ds.depth_background_paths) == 2
    assert ds.load_random_image(ds.color_background_paths).shape[2] == 3
    d = ds.load_random_depth(ds.depth_background_paths)
    assert d.ndim == 2 and d.max() > 0
