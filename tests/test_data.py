"""Data-layer tests: rasterizer, mesh IO, synthetic pipeline, BOP loader."""
import json
import math

import numpy as np
import pytest

from latentfusion_tpu import meshutils
from latentfusion_tpu.data import rasterizer, rendering, synthetic


def make_cube_obj(tmp_path, size=0.5):
    """Write a cube OBJ and return its path."""
    s = size / 2
    verts = [(-s, -s, -s), (s, -s, -s), (s, s, -s), (-s, s, -s),
             (-s, -s, s), (s, -s, s), (s, s, s), (-s, s, s)]
    faces = [(1, 2, 3), (1, 3, 4), (5, 7, 6), (5, 8, 7), (1, 5, 6), (1, 6, 2),
             (2, 6, 7), (2, 7, 3), (3, 7, 8), (3, 8, 4), (5, 1, 4), (5, 4, 8)]
    path = tmp_path / "cube.obj"
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")
    return path


INTRINSIC = np.asarray([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]],
                       dtype=np.float32)


class TestMeshUtils:
    def test_load_obj_cube(self, tmp_path):
        obj = meshutils.Object3D(make_cube_obj(tmp_path))
        assert obj.vertices.shape == (8, 3)
        np.testing.assert_allclose(obj.bounding_size, 0.5)
        np.testing.assert_allclose(obj.bounding_diameter, 0.5 * math.sqrt(3),
                                   rtol=1e-5)

    def test_recenter_resize(self, tmp_path):
        obj = meshutils.Object3D(make_cube_obj(tmp_path))
        obj.meshes[0].apply_translation((1.0, 0, 0))
        obj.recenter("bounds")
        np.testing.assert_allclose(obj.centroid, 0.0, atol=1e-6)
        obj.resize(1.0, ref="diameter")
        np.testing.assert_allclose(obj.bounding_diameter, 1.0, rtol=1e-5)

    def test_load_object_normalizes(self, tmp_path):
        obj, scale = rendering.load_object(make_cube_obj(tmp_path), size=1.0)
        np.testing.assert_allclose(obj.bounding_diameter, 1.0, rtol=1e-5)
        np.testing.assert_allclose(scale, 1.0 / (0.5 * math.sqrt(3)), rtol=1e-5)

    def test_load_obj_with_uvs(self, tmp_path):
        """vt/corner parsing: vertices split per (v, vt) pair."""
        path = tmp_path / "quad.obj"
        path.write_text(
            "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
            "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
            "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n")
        obj = meshutils.Object3D(path)
        mesh = obj.meshes[0]
        assert mesh.uvs is not None
        assert mesh.uvs.shape == (len(mesh.vertices), 2)
        assert mesh.vertices.shape == (4, 3)
        np.testing.assert_allclose(mesh.uvs[2], (1.0, 1.0))

    def test_renderer_applies_uv_texture(self, tmp_path):
        """SceneContext/Renderer pass the mesh's attached texture through."""
        path = tmp_path / "quad.obj"
        path.write_text(
            "v -0.5 -0.5 0\nv 0.5 -0.5 0\nv 0.5 0.5 0\nv -0.5 0.5 0\n"
            "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
            "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n")
        obj = meshutils.Object3D(path)
        obj.meshes[0].texture = np.tile(
            np.asarray([1.0, 0.0, 0.0], np.float32), (4, 4, 1))
        ctx = rendering.SceneContext(obj, INTRINSIC)
        ctx.set_pose_from_extrinsic(
            np.diag([1.0, 1.0, 1.0, 1.0]).astype(np.float32))
        ctx.extrinsic[2, 3] = 2.0
        color, depth, mask = rendering.Renderer(320, 240).render(ctx)
        lit = np.asarray(color)[np.asarray(mask) > 0]
        # Ambient-only shading: red texel * ambient 0.1, green/blue zero.
        np.testing.assert_allclose(lit[:, 0], 0.1, atol=1e-3)
        assert lit[:, 1].max() < 1e-3 and lit[:, 2].max() < 1e-3

    def test_ply_roundtrip_ascii(self, tmp_path):
        path = tmp_path / "tri.ply"
        path.write_text(
            "ply\nformat ascii 1.0\nelement vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\nproperty list uchar int vertex_indices\n"
            "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
        d = meshutils.load_ply(path)
        assert d["vertices"].shape == (3, 3)
        assert d["faces"].shape == (1, 3)


class TestRasterizer:
    def _render_cube(self, tmp_path, shade=True, **kw):
        obj, _ = rendering.load_object(make_cube_obj(tmp_path), size=1.0)
        extrinsic = np.eye(4, dtype=np.float32)
        extrinsic[2, 3] = 2.0  # camera 2m in front
        mesh = obj.meshes[0]
        return rasterizer.rasterize(
            mesh.vertices, mesh.faces, extrinsic, INTRINSIC, 320, 240,
            vertex_normals=mesh.vertex_normals, shade=shade, **kw)

    def test_depth_and_mask(self, tmp_path):
        color, depth, mask = self._render_cube(tmp_path, shade=False)
        assert mask.sum() > 100
        hit = depth[depth > 0]
        # Front face of the unit-diameter cube at z = 2 - ~0.29.
        assert abs(hit.min() - (2.0 - 0.5 / math.sqrt(3))) < 0.01
        # Center pixel hits the front face.
        assert depth[120, 160] > 0
        # Corners empty.
        assert depth[0, 0] == 0

    def test_shading_with_lights(self, tmp_path):
        color, depth, mask = self._render_cube(
            tmp_path, shade=True,
            light_pos=np.asarray([[0.0, 0.0, -2.0]], dtype=np.float32),
            light_color=np.ones((1, 3), dtype=np.float32),
            light_intensity=np.asarray([5.0], dtype=np.float32))
        lit = color[mask > 0]
        assert lit.max() > 0.15
        assert np.isfinite(color).all()

    def test_native_matches_numpy(self, tmp_path):
        """The C++ rasterizer must agree with the numpy reference."""
        obj, _ = rendering.load_object(make_cube_obj(tmp_path), size=1.0)
        mesh = obj.meshes[0]
        extrinsic = np.eye(4, dtype=np.float32)
        extrinsic[2, 3] = 2.0
        if rasterizer._load_library() is None:
            pytest.skip("no native toolchain")
        c1 = np.zeros((60, 80, 3), np.float32)
        d1 = np.zeros((60, 80), np.float32)
        rasterizer._rasterize_numpy(
            mesh.vertices, mesh.faces, extrinsic, INTRINSIC[:3, :3], 80, 60,
            None, mesh.vertex_normals, None, None, 1.0, None, None, None,
            0.1, 0.0, 32.0, False, c1, d1)
        c2, d2, _ = rasterizer.rasterize(
            mesh.vertices, mesh.faces, extrinsic, INTRINSIC, 80, 60,
            vertex_normals=mesh.vertex_normals, shade=False)
        # Same coverage and same depths (boundary pixels may differ by
        # rasterization tie-breaks).
        both = (d1 > 0) & (d2 > 0)
        agree = ((d1 > 0) == (d2 > 0)).mean()
        assert agree > 0.99
        np.testing.assert_allclose(d1[both], d2[both], atol=1e-3)

    def _uv_quad(self):
        """A camera-facing textured quad at z = 2."""
        verts = np.asarray([[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0],
                            [0.5, 0.5, 2.0], [-0.5, 0.5, 2.0]], np.float32)
        faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        # Left half red, right half green.
        tex = np.zeros((8, 8, 3), np.float32)
        tex[:, :4, 0] = 1.0
        tex[:, 4:, 1] = 1.0
        return verts, faces, uvs, tex

    def test_uv_texture_native(self, tmp_path):
        if rasterizer._load_library() is None:
            pytest.skip("no native toolchain")
        verts, faces, uvs, tex = self._uv_quad()
        color, depth, mask = rasterizer.rasterize(
            verts, faces, np.eye(4, dtype=np.float32), INTRINSIC, 320, 240,
            uvs=uvs, texture=tex, shade=False)
        assert mask.sum() > 100
        # u < 0.5 (left in UV space) samples the red half.
        left = color[120, 100]
        right = color[120, 220]
        assert left[0] > 0.9 and left[1] < 0.1, left
        assert right[1] > 0.9 and right[0] < 0.1, right

    def test_uv_texture_native_matches_numpy(self):
        verts, faces, uvs, tex = self._uv_quad()
        if rasterizer._load_library() is None:
            pytest.skip("no native toolchain")
        intr = np.asarray([[75.0, 0, 40.0], [0, 75.0, 30.0], [0, 0, 1.0]],
                          np.float32)
        c1 = np.zeros((60, 80, 3), np.float32)
        d1 = np.zeros((60, 80), np.float32)
        rasterizer._rasterize_numpy(
            verts, faces, np.eye(4, dtype=np.float32), intr,
            80, 60, None, None, uvs, tex, 2.0, None, None, None,
            0.1, 0.0, 32.0, False, c1, d1)
        c2, d2, _ = rasterizer.rasterize(
            verts, faces, np.eye(4, dtype=np.float32), intr, 80, 60,
            uvs=uvs, texture=tex, uv_scale=2.0, shade=False)
        both = (d1 > 0) & (d2 > 0)
        # Texel-boundary pixels may take different bilinear taps; almost all
        # pixels must agree exactly.
        agree = np.isclose(c1[both], c2[both], atol=1e-3).mean()
        assert agree > 0.97, agree

    def test_specular_highlight(self, tmp_path):
        """A Blinn-Phong lobe brightens the lit render vs pure Lambertian."""
        light = dict(
            light_pos=np.asarray([[0.0, 0.0, -2.0]], dtype=np.float32),
            light_color=np.ones((1, 3), dtype=np.float32),
            light_intensity=np.asarray([5.0], dtype=np.float32))
        base, _, mask = self._render_cube(tmp_path, shade=True, **light)
        spec, _, _ = self._render_cube(tmp_path, shade=True, specular=0.8,
                                       shininess=8.0, **light)
        m = mask > 0
        assert spec[m].sum() > base[m].sum()
        assert np.isfinite(spec).all()
        # Specular contribution is additive-only.
        assert (spec[m] >= base[m] - 1e-5).all()


class TestSyntheticDataset:
    def test_get_item_structure(self, tmp_path):
        ds = synthetic.SyntheticDataset(
            [make_cube_obj(tmp_path)], num_input_views=2, num_output_views=3,
            width=80, height=60, random_materials=True, mask_noise_p=1.0,
            color_noise_level=0.05)
        ds.worker_init_fn(0)
        item = ds._get_item()
        assert set(item.keys()) == {"in", "in_gt", "out_gt"}
        assert item["in"]["render"].shape == (2, 3, 60, 80)
        assert item["in"]["depth"].shape == (2, 60, 80)
        assert item["in"]["mask"].shape == (2, 60, 80)
        assert item["in"]["extrinsic"].shape == (2, 4, 4)
        assert item["out_gt"]["render"].shape == (3, 3, 60, 80)
        # GT views have unaugmented masks with actual coverage.
        assert item["in_gt"]["mask"].sum() > 0
        assert np.isfinite(item["in"]["render"]).all()

    def test_loader_collate(self, tmp_path):
        from latentfusion_tpu.data.loader import IterableLoader

        ds = synthetic.SyntheticDataset(
            [make_cube_obj(tmp_path)], num_input_views=1, num_output_views=1,
            width=40, height=30)
        loader = IterableLoader(ds, batch_size=2, num_workers=0,
                                device_put=False)
        batch = next(iter(loader))
        assert batch["in"]["render"].shape == (2, 1, 3, 30, 40)

    def test_loader_multiprocess_workers(self, tmp_path):
        """The production render-offload path: worker processes own the
        rasterizer and feed batches through the queue (SURVEY §2.11)."""
        from latentfusion_tpu.data.loader import IterableLoader

        ds = synthetic.SyntheticDataset(
            [make_cube_obj(tmp_path)], num_input_views=1, num_output_views=1,
            width=40, height=30)
        loader = IterableLoader(ds, batch_size=2, num_workers=2,
                                device_put=False)
        try:
            it = iter(loader)
            batches = [next(it) for _ in range(3)]
        finally:
            loader.shutdown()
        for batch in batches:
            assert batch["in"]["render"].shape == (2, 1, 3, 30, 40)
            assert np.isfinite(batch["in"]["render"]).all()
            assert batch["out_gt"]["mask"].sum() > 0


class TestBOPDataset:
    def _make_fake_bop(self, tmp_path):
        import imageio.v2 as imageio

        root = tmp_path / "lm"
        scene = root / "test" / "000001"
        for d in ("depth", "mask_visib", "rgb"):
            (scene / d).mkdir(parents=True)
        (root / "models_eval").mkdir(parents=True)
        (root / "models").mkdir()

        models_info = {"1": {"diameter": 100.0, "min_x": -50, "min_y": -50,
                             "min_z": -50, "size_x": 100, "size_y": 100,
                             "size_z": 100}}
        (root / "models_eval" / "models_info.json").write_text(
            json.dumps(models_info))
        cam = {"0": {"cam_K": [300.0, 0, 40, 0, 300.0, 30, 0, 0, 1],
                     "depth_scale": 0.1}}
        (scene / "scene_camera.json").write_text(json.dumps(cam))
        gt = {"0": [{"obj_id": 1,
                     "cam_R_m2c": [1, 0, 0, 0, 1, 0, 0, 0, 1],
                     "cam_t_m2c": [0.0, 0.0, 400.0]}]}
        (scene / "scene_gt.json").write_text(json.dumps(gt))

        imageio.imsave(scene / "rgb" / "000000.png",
                       np.zeros((60, 80, 3), np.uint8))
        imageio.imsave(scene / "depth" / "000000.png",
                       np.full((60, 80), 4000, np.uint16))
        imageio.imsave(scene / "mask_visib" / "000000_000000.png",
                       np.full((60, 80), 255, np.uint8))
        return root, scene

    def test_load_item(self, tmp_path):
        from latentfusion_tpu.data.bop import BOPDataset

        root, scene = self._make_fake_bop(tmp_path)
        ds = BOPDataset(root, scene, object_id=1)
        assert len(ds) == 1
        # unit diameter normalization: scale = 1/100
        assert abs(ds.object_scale - 0.01) < 1e-9
        item = ds[0]
        assert item["color"].shape == (3, 60, 80)
        # depth = raw(4000) * depth_scale(0.1) * object_scale(0.01) = 4.0
        np.testing.assert_allclose(item["depth"][0, 0], 4.0, rtol=1e-6)
        # extrinsic translation normalized: 400mm * 0.01 = 4.0
        np.testing.assert_allclose(item["extrinsic"][2, 3], 4.0, rtol=1e-6)
        # denormalize roundtrip
        back = ds.denormalize_extrinsic(item["extrinsic"])
        np.testing.assert_allclose(np.asarray(back)[2, 3], 400.0, rtol=1e-5)


def test_dataset_pickles_without_jax_arrays(tmp_path):
    """Spawn-start workers unpickle the dataset BEFORE they can force the
    CPU platform; a pickled jax.Array would initialize the child's default
    backend (the single-process TPU tunnel under the container
    sitecustomize) and hang the loader. Keep host dataset state numpy."""
    import pickle

    import jax

    from latentfusion_tpu.data import synthetic

    ds = synthetic.SyntheticDataset(
        [make_cube_obj(tmp_path)], num_input_views=1, num_output_views=1,
        width=40, height=30)
    seen = []

    def scan(obj, depth=0):
        if depth > 4 or id(obj) in seen:
            return
        seen.append(id(obj))
        assert not isinstance(obj, jax.Array), f"jax.Array in state: {obj!r}"
        if isinstance(obj, dict):
            for v in obj.values():
                scan(v, depth + 1)
        elif isinstance(obj, (list, tuple)):
            for v in obj:
                scan(v, depth + 1)
        elif hasattr(obj, "__dict__"):
            scan(vars(obj), depth + 1)

    scan(ds)
    pickle.dumps(ds)  # must survive spawn's ForkingPickler path


class TestTransportCodec:
    """Opt-in quantized worker->device transport (uint8 color/mask, f16
    depth): 4x fewer bytes through the queue and the host->device copy."""

    def _ds(self, tmp_path):
        from latentfusion_tpu.data import synthetic

        return synthetic.SyntheticDataset(
            [make_cube_obj(tmp_path)], num_input_views=1, num_output_views=1,
            width=40, height=30)

    def test_roundtrip_accuracy(self, tmp_path):
        from latentfusion_tpu.data import loader as L

        ds = self._ds(tmp_path)
        ds.worker_init_fn(0)
        item = next(iter(ds))
        enc = L.encode_transport(item)
        assert enc["in"]["render"].dtype == np.uint8
        assert enc["in"]["depth"].dtype == np.float16
        assert enc["in"]["extrinsic"].dtype == np.float32  # untouched
        dec = L.decode_transport(enc)
        np.testing.assert_allclose(np.asarray(dec["in"]["render"]),
                                   item["in"]["render"], atol=1 / 510 + 1e-7)
        np.testing.assert_allclose(np.asarray(dec["in_gt"]["mask"]),
                                   item["in_gt"]["mask"], atol=1e-7)
        d0 = item["in"]["depth"]
        np.testing.assert_allclose(np.asarray(dec["in"]["depth"]), d0,
                                   rtol=1e-3, atol=1e-4)

    def test_loader_quantized_workers(self, tmp_path):
        from latentfusion_tpu.data.loader import IterableLoader

        loader = IterableLoader(self._ds(tmp_path), batch_size=2,
                                num_workers=2, device_put=False,
                                transport="quantized")
        try:
            batch = next(iter(loader))
        finally:
            loader.shutdown()
        r = batch["in"]["render"]
        assert r.dtype == np.float32 and r.shape == (2, 1, 3, 30, 40)
        assert 0.0 <= r.min() and r.max() <= 1.0
        assert batch["out_gt"]["mask"].sum() > 0

    def test_loader_quantized_device_put(self, tmp_path):
        from latentfusion_tpu.data.loader import IterableLoader

        loader = IterableLoader(self._ds(tmp_path), batch_size=1,
                                num_workers=0, transport="quantized")
        batch = next(iter(loader))
        import jax.numpy as jnp

        assert batch["in"]["render"].dtype == jnp.float32
        assert float(batch["in"]["render"].max()) <= 1.0
