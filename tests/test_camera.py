"""Tests for the Camera pytree and volume transforms."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from latentfusion_tpu import three, transforms
from latentfusion_tpu.camera import Camera, bboxes_to_grid
from latentfusion_tpu.three import quaternion as quat


def make_camera(n=1, z=1.0, f=100.0, w=100, h=100, z_span=0.5, key=None):
    intrinsic = jnp.array([[f, 0.0, w / 2], [0.0, f, h / 2], [0.0, 0.0, 1.0]])
    intrinsic = jnp.tile(intrinsic[None], (n, 1, 1))
    if key is None:
        quats = quat.identity(n)
    else:
        quats = quat.random(key, n)
    trans = jnp.tile(jnp.array([[0.0, 0.0, z]]), (n, 1))
    extrinsic = three.to_extrinsic_matrix(trans, quats)
    return Camera(intrinsic, extrinsic, z_span=z_span, width=w, height=h)


class TestCameraBasics:
    def test_extrinsic_roundtrip(self):
        cam = make_camera(4, key=jax.random.PRNGKey(0))
        E = cam.extrinsic
        cam2 = Camera(cam.intrinsic, E, cam.z_span, width=cam.width,
                      height=cam.height)
        np.testing.assert_allclose(np.asarray(cam2.extrinsic), np.asarray(E),
                                   atol=1e-4)

    def test_position_is_camera_center(self):
        cam = make_camera(3, key=jax.random.PRNGKey(1))
        pos_h = three.homogenize(cam.position)[..., None]
        mapped = (cam.obj_to_cam @ pos_h)[..., 0]
        np.testing.assert_allclose(np.asarray(mapped[:, :3]), 0.0, atol=1e-5)

    def test_znear_zfar(self):
        cam = make_camera(1, z=2.0, z_span=0.5)
        assert float(cam.znear[0]) == 1.5
        assert float(cam.zfar[0]) == 2.5

    def test_obj_to_image_projects_origin_to_center(self):
        cam = make_camera(1)
        uvz = (cam.obj_to_image @ jnp.array([[0.0], [0.0], [0.0], [1.0]])[None])
        uv = uvz[:, :2, 0] / uvz[:, 2:, 0]
        np.testing.assert_allclose(np.asarray(uv), [[50.0, 50.0]], atol=1e-5)

    def test_rotate_composition(self):
        cam = make_camera(2, key=jax.random.PRNGKey(2))
        rot = quat.from_axis_angle(jnp.array([[0.0, 0.0, 1.0]]), math.pi / 4)
        rot = jnp.broadcast_to(rot, (2, 4))
        cam2 = cam.rotate(rot)
        expected = quat.qmul(cam.quaternion, rot)
        d = jnp.diagonal(quat.angular_distance(cam2.quaternion, expected))
        assert float(d.max()) < 1e-3

    def test_translate_moves_center(self):
        cam = make_camera(1, key=jax.random.PRNGKey(3))
        offset = jnp.array([[0.1, -0.2, 0.3]])
        cam2 = cam.translate(offset)
        np.testing.assert_allclose(
            np.asarray(cam2.position), np.asarray(cam.position + offset), atol=1e-5
        )

    def test_pytree_roundtrip(self):
        cam = make_camera(2)
        leaves, treedef = jax.tree_util.tree_flatten(cam)
        cam2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert isinstance(cam2, Camera)
        assert cam2.width == cam.width and cam2.z_span == cam.z_span

    def test_containers(self):
        cam = make_camera(4, key=jax.random.PRNGKey(4))
        a, b = cam.split([1, 3])
        assert len(a) == 1 and len(b) == 3
        back = Camera.cat([a, b])
        np.testing.assert_allclose(np.asarray(back.translation),
                                   np.asarray(cam.translation))
        rep = cam.repeat(2)
        assert len(rep) == 8
        ri = cam.repeat_interleave(2)
        np.testing.assert_allclose(np.asarray(ri.translation[0]),
                                   np.asarray(ri.translation[1]))

    def test_vcat(self):
        cam_a = make_camera(4, key=jax.random.PRNGKey(5))  # B=2, V=2
        cam_b = make_camera(2, key=jax.random.PRNGKey(6))  # B=2, V=1
        out = Camera.vcat([cam_a, cam_b], batch_size=2)
        assert len(out) == 6
        # Views interleave: [a0, a1, b0, a2, a3, b1]
        np.testing.assert_allclose(np.asarray(out.translation[2]),
                                   np.asarray(cam_b.translation[0]))


class TestDepthWindow:
    def test_normalize_denormalize_roundtrip(self):
        cam = make_camera(2, z=1.0, z_span=0.5)
        depth = jnp.full((2, 1, 8, 8), 1.2)
        norm = cam.normalize_depth(depth)
        rec = cam.denormalize_depth(norm)
        np.testing.assert_allclose(np.asarray(rec), 1.2, atol=1e-5)

    def test_normalize_clamps(self):
        cam = make_camera(1, z=1.0, z_span=0.5)
        depth = jnp.full((1, 1, 4, 4), 99.0)
        norm = cam.normalize_depth(depth)
        np.testing.assert_allclose(np.asarray(norm), 1.0)


class TestZoomUncrop:
    def test_zoom_centers_on_projected_origin(self):
        cam = make_camera(1, z=1.0)
        zcam = cam.zoom(None, 32, 1.0)
        centroid = np.asarray(zcam.viewport_centroid[0])
        np.testing.assert_allclose(centroid, [50.0, 50.0], atol=1e-4)
        # target_dist == zs and target_f == f: bbox covers
        # target_size/width of the image.
        np.testing.assert_allclose(float(zcam.viewport_width[0]), 32.0, atol=1e-4)

    def test_zoom_uncrop_roundtrip(self, rng):
        cam = make_camera(1, z=1.0)
        # Smooth image so bilinear resampling roundtrips approximately.
        yy, xx = np.meshgrid(np.linspace(0, 1, 100), np.linspace(0, 1, 100),
                             indexing="ij")
        img = (np.sin(4 * xx) * np.cos(3 * yy)).astype(np.float32)[None, None]
        zoomed, zcam = cam.zoom(jnp.asarray(img), 64, 1.0)
        assert zoomed.shape == (1, 1, 64, 64)
        restored, _ = zcam.uncrop(jnp.asarray(zoomed), scale_mode="bilinear")
        assert restored.shape == (1, 1, 100, 100)
        # Compare central crop (the zoom viewport covers center 32px).
        a = np.asarray(restored)[0, 0, 40:60, 40:60]
        b = img[0, 0, 40:60, 40:60]
        assert np.abs(a - b).mean() < 0.02

    def test_crop_to_viewport_matches_zoom(self, rng):
        cam = make_camera(1, z=1.0)
        img = jnp.asarray(rng.rand(1, 3, 100, 100).astype(np.float32))
        zoomed, zcam = cam.zoom(img, 32, 1.0, scale_mode="nearest")
        cropped = zcam.crop_to_viewport(img, 32, scale_mode="nearest")
        np.testing.assert_allclose(np.asarray(zoomed), np.asarray(cropped),
                                   atol=1e-6)

    def test_zoom_differentiable_wrt_pose(self):
        cam = make_camera(1, z=1.0)

        def f(translation):
            c = cam.replace(translation=translation)
            zc = c.zoom(None, 32, 1.0)
            return zc.viewport.sum()

        g = jax.grad(f)(cam.translation)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestVolumeTransforms:
    def test_object_to_camera_delta(self):
        """A delta at the object-cube center must land at the frustum voxel
        whose camera coords hit the origin: z index D-1 (z = znear + span),
        u = v = center."""
        S = 9
        cam = make_camera(1, z=1.0, z_span=0.5)
        vol = jnp.zeros((1, 1, S, S, S)).at[0, 0, 4, 4, 4].set(1.0)
        out = transforms.object_to_camera(vol, cam, cube_size=1.0)
        out = np.asarray(out)[0, 0]
        assert out[S - 1, 4, 4] > 0.9
        # Total mass stays near 1 within the frustum.
        assert out.sum() < 1.5

    def test_camera_to_object_delta(self):
        """Inverse check of the reference's (asymmetric) conventions: the
        object voxel at the cube center samples the camera volume at
        x=u0 -> pixel (W-1)/2, z grid coord (1.0-znear)/(zfar-znear)=0.5 ->
        pixel (0.5+1)*D/2 - 0.5."""
        S = 9
        cam = make_camera(1, z=1.0, z_span=0.5)
        # Put a distinctive plane at the z pixel the center should read from.
        zpix = (0.5 + 1) * S / 2 - 0.5  # 6.25
        vol = jnp.zeros((1, 1, S, S, S))
        vol = vol.at[0, 0, 6].set(0.75).at[0, 0, 7].set(0.75)
        out = transforms.camera_to_object(vol, cam, cube_size=1.0)
        # Center voxel interpolates between planes 6 and 7 -> 0.75.
        assert abs(float(out[0, 0, 4, 4, 4]) - 0.75) < 1e-5
        del zpix

    def test_object_to_camera_rotation_invariance_of_mass(self):
        key = jax.random.PRNGKey(0)
        S = 8
        cam = make_camera(4, z=1.0, key=key)
        vol = jax.random.uniform(key, (1, 2, S, S, S))
        out = transforms.object_to_camera(vol, cam)
        assert out.shape == (4, 2, S, S, S)
        assert np.isfinite(np.asarray(out)).all()

    def test_transforms_differentiable_wrt_pose(self):
        S = 8
        cam = make_camera(2, z=1.0, key=jax.random.PRNGKey(1))
        vol = jax.random.normal(jax.random.PRNGKey(2), (1, 2, S, S, S))

        def f(lq):
            c = cam.replace(log_quaternion=lq)
            return (transforms.object_to_camera(vol, c) ** 2).sum()

        g = jax.grad(f)(cam.log_quaternion)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestBBoxGrids:
    def test_full_image_bbox_is_identity_grid(self, rng):
        import torch
        import torch.nn.functional as F

        img = rng.rand(1, 1, 16, 16).astype(np.float32)
        boxes = jnp.array([[0.0, 0.0, 16.0, 16.0]])
        grid = bboxes_to_grid(boxes, (16, 16), (16, 16))
        ours = np.asarray(
            jax.jit(lambda i, g: i)(img, grid))
        # Torch cross-check of the grid itself via grid_sample.
        from latentfusion_tpu.ops import grid_sample_2d
        sampled = np.asarray(grid_sample_2d(jnp.asarray(img), grid,
                                            mode="nearest"))
        t = F.grid_sample(torch.from_numpy(img),
                          torch.from_numpy(np.asarray(grid)),
                          mode="nearest", align_corners=False).numpy()
        np.testing.assert_allclose(sampled, t, atol=1e-6)
        del ours
