"""Previously uncovered modules: imutils, visualization, plotting, videos,
triplet sampling, COLMAP / KinectFusion parsers."""
import numpy as np
import pytest

import jax.numpy as jnp

from latentfusion_tpu import imutils, visualization as viz


class TestImutils:
    def test_dilate_erode_roundtrip(self):
        mask = np.zeros((1, 1, 21, 21), np.float32)
        mask[..., 8:13, 8:13] = 1.0
        m = jnp.asarray(mask)
        grown = imutils.dilate(m, iterations=1)
        assert float(grown.sum()) > float(m.sum())
        shrunk = imutils.erode(grown, iterations=1)
        # dilate then erode with the same kernel returns the square
        np.testing.assert_allclose(np.asarray(shrunk), mask)

    def test_erode_disk(self):
        mask = np.zeros((1, 1, 31, 31), np.float32)
        mask[..., 5:26, 5:26] = 1.0
        out = np.asarray(imutils.erode_disk(jnp.asarray(mask), radius=4))
        assert 0 < out.sum() < mask.sum()
        assert out[0, 0, 15, 15] == 1.0  # center survives
        assert out[0, 0, 5, 5] == 0.0    # corner eroded

    def test_largest_component(self):
        mask = np.zeros((20, 20), bool)
        mask[1:4, 1:4] = True     # 9 px
        mask[10:18, 10:18] = True  # 64 px
        out = imutils.largest_component(mask)
        assert out[12, 12] and not out[2, 2]

    def test_mean_color(self):
        color = jnp.ones((1, 3, 4, 4)) * jnp.asarray(
            [0.2, 0.5, 0.8])[None, :, None, None]
        mask = jnp.ones((1, 1, 4, 4))
        mc = np.asarray(imutils.mean_color(color, mask))
        np.testing.assert_allclose(mc.reshape(-1)[:3], [0.2, 0.5, 0.8],
                                   atol=1e-6)

    def test_chroma_mask(self):
        img = np.zeros((8, 8, 3), np.float32)
        img[:, :4] = (0.0, 1.0, 0.0)   # green screen left half
        img[:, 4:] = (1.0, 0.0, 0.0)
        m = imutils.chroma_mask(img)
        # chroma_mask returns the FOREGROUND (non-keyed) mask: the green
        # half is keyed out, the red half survives.
        assert not m[:, :4].any() and m[:, 4:].all()


class TestVisualization:
    def test_colorize_tensor_shapes(self):
        x = jnp.linspace(0, 1, 16).reshape(1, 1, 4, 4)
        out = viz.colorize_tensor(x)
        assert out.shape[-3] == 3  # RGB channels
        assert float(np.asarray(out).min()) >= 0.0
        assert float(np.asarray(out).max()) <= 1.0

    def test_colorize_depth_masks_background(self):
        d = np.zeros((1, 1, 4, 4), np.float32)
        d[..., 1:3, 1:3] = 2.0
        out = np.asarray(viz.colorize_depth(d))
        # zero-depth (background) pixels stay black
        assert out[..., 0, 0].max() == 0.0

    def test_make_grid(self):
        groups = [np.random.rand(2, 3, 8, 8).astype(np.float32),
                  np.random.rand(2, 1, 8, 8).astype(np.float32)]
        grid = viz.make_grid(groups, row_size=2, output_size=16)
        assert grid.ndim == 3 and grid.shape[0] == 3

    def test_plot_to_array(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(2, 2))
        ax.plot([0, 1], [0, 1])
        arr = viz.plot_to_array(fig)
        plt.close(fig)
        assert arr.ndim == 3 and arr.shape[-1] in (3, 4)


class TestPlotting:
    def test_overlay_mask(self):
        from latentfusion_tpu.pose import plotting

        color = jnp.zeros((3, 8, 8))
        mask = jnp.zeros((1, 8, 8)).at[:, 2:6, 2:6].set(1.0)
        out = np.asarray(plotting.overlay_mask(color, mask))
        assert out.shape == (8, 8, 3)  # returns HWC for imshow
        assert out[4, 4, 0] > 0 and out[0, 0, 0] == 0


class TestVideos:
    def test_write_read_roundtrip(self, tmp_path):
        from latentfusion_tpu import videos

        frames = [np.full((16, 16, 3), v, np.uint8) for v in (0, 128, 255)]
        path = tmp_path / "clip.mp4"
        videos.write_video(path, frames, fps=5)
        if path.exists():  # ffmpeg backend available
            got = list(videos.read_video(path))
            assert len(got) == 3
            assert got[0].shape[:2] == (16, 16)
        else:  # image-sequence fallback
            pngs = sorted((tmp_path / "clip").glob("*.png"))
            assert len(pngs) == 3


class TestTriplet:
    def test_sampling_respects_distances(self):
        import random

        from latentfusion_tpu.data.triplet import TripletDataset

        random.seed(0)
        n = 16
        # items are just their own indices; distance = |i - j|
        dist = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]).astype(
            np.float32)
        ds = TripletDataset(dataset=list(range(n)), data_indices=range(n),
                            dist_matrix=dist, k=3)
        for idx in range(4):
            item = ds[idx]
            assert item["anchor"] == idx
            assert item["positive_dist"] <= 2  # within k=3 nearest
            assert item["negative_dist"] > item["positive_dist"]


class TestColmapParsers:
    def test_parse_model_files(self, tmp_path):
        from latentfusion_tpu.data import colmap

        (tmp_path / "cameras.txt").write_text(
            "# comment\n1 PINHOLE 64 48 60.0 60.0 32.0 24.0\n")
        (tmp_path / "images.txt").write_text(
            "# comment\n"
            "1 1 0 0 0 0.1 -0.2 1.5 1 frame1.png\n"
            "0 0\n")
        (tmp_path / "points3D.txt").write_text(
            "# comment\n"
            "1 0.0 0.1 0.2 200 10 20 0.5 1 0\n"
            "2 9.0 9.0 9.0 200 10 20 5.0 1 0\n")

        cams = colmap.parse_cameras(tmp_path / "cameras.txt")
        assert cams[1]["intrinsic"][0, 0] == 60.0
        metas = colmap.parse_image_meta(tmp_path / "images.txt")
        assert metas[0]["name"] == "frame1.png"
        np.testing.assert_allclose(metas[0]["translation"], [0.1, -0.2, 1.5])
        pts = colmap.parse_points(tmp_path / "points3D.txt", max_error=2.0)
        assert pts.shape == (1, 3)  # second point filtered by error


class TestKinectFusionParsers:
    def test_load_poses(self, tmp_path):
        from latentfusion_tpu.data import kinectfusion

        # Two relative poses in the 4-line block format.
        def block(i, mat):
            return "\n".join([str(i)] + [
                " ".join(f"{v:.6f}" for v in row) for row in mat])

        eye = np.eye(4, dtype=np.float32)[:3]
        shift = eye.copy()
        shift[0, 3] = 0.5
        (tmp_path / "poses.txt").write_text(
            block(0, eye) + "\n" + block(1, shift) + "\n")
        (tmp_path / "points.xyz").write_text(
            "0 0 1\n0 0 1\n2 0 1\n")

        poses = kinectfusion.load_poses(tmp_path / "poses.txt",
                                        tmp_path / "points.xyz")
        assert poses.shape == (2, 4, 4)
        # first pose anchored at the cloud centroid (bbox midpoint)
        np.testing.assert_allclose(poses[0][:3, 3],
                                   [1.0, 0.0, 1.0], atol=1e-6)
        # second pose = rel @ canon
        np.testing.assert_allclose(poses[1][0, 3], poses[0][0, 3] + 0.5,
                                   atol=1e-6)


class TestRealsenseDataset:
    def _make_scene(self, tmp_path):
        import json as json_mod

        import imageio.v2 as imageio

        scene = tmp_path / "capture"
        for d in ("mask", "depth", "color", "scene"):
            (scene / d).mkdir(parents=True)

        k = np.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]],
                       np.float32)
        (scene / "intrinsics.json").write_text(json_mod.dumps(
            {"intrinsic_matrix": k.T.reshape(-1).tolist()}))  # column-major

        n = 3
        log_lines = []
        for i in range(n):
            mat = np.eye(4)
            mat[2, 3] = 0.5 + 0.1 * i  # camera-to-world translation
            log_lines.append(f"{i} {i} {i + 1}")
            log_lines.extend(" ".join(f"{v:.6f}" for v in row)
                             for row in mat)
            imageio.imsave(scene / "mask" / f"{i:06d}.png",
                           np.full((48, 64), 255, np.uint8))
            imageio.imsave(scene / "depth" / f"{i:06d}.png",
                           np.full((48, 64), 800, np.uint16))
            imageio.imsave(scene / "color" / f"{i:06d}.jpg",
                           np.full((48, 64, 3), 128, np.uint8))
        (scene / "scene" / "trajectory.log").write_text(
            "\n".join(log_lines) + "\n")

        rng = np.random.RandomState(0)
        pts = rng.randn(60, 3).astype(np.float32) * 0.05
        ply = ["ply", "format ascii 1.0", "element vertex 60",
               "property float x", "property float y", "property float z",
               "end_header"]
        ply += [" ".join(f"{v:.5f}" for v in p) for p in pts]
        (scene / "scene" / "integrated_cropped.ply").write_text(
            "\n".join(ply) + "\n")
        return scene

    def test_load_scene(self, tmp_path):
        from latentfusion_tpu.data.realsense import RealsenseDataset

        scene = self._make_scene(tmp_path)
        ds = RealsenseDataset(scene, image_scale=0.5, object_scale="auto",
                              odometry_type="open3d")
        assert len(ds) == 3
        # auto scale: 1.2 / bounding size of the filtered cloud
        assert ds.object_scale > 1.0
        item = ds[0]
        assert item["color"].shape == (3, 24, 32)
        assert item["mask"].shape == (24, 32)
        # intrinsics scaled by image_scale
        np.testing.assert_allclose(item["intrinsic"][0, 0], 50.0, rtol=1e-6)
        # extrinsic normalized into the centered unit-object frame
        assert np.isfinite(item["extrinsic"]).all()
        # farthest-point view sampling returns distinct frames
        inds = np.asarray(ds.sample_evenly(2))
        assert len(set(inds.tolist())) == 2


class TestPgganGenerator:
    def test_encoder_decoder_roundtrip_shapes(self):
        """The progressive-growing Encoder/Decoder pair (defined but unused
        by the shipped pipeline, reference: generator.py:64-229)."""
        import jax

        from latentfusion_tpu.pggan.generator import EncoderDecoder

        model = EncoderDecoder(in_channels=3, out_channels=3,
                               block_config=(8, 16, 32), style_size=4,
                               output_activation="tanh")
        x = jnp.zeros((2, 3, 16, 16))
        z_style = jnp.zeros((2, 4))
        params = model.init(jax.random.PRNGKey(0), x, z_style)
        y, z_content = model.apply(params, x, z_style)
        assert y.shape == (2, 3, 16, 16)
        # two halving blocks: 16 -> 4 spatial, 32 channels at the bottleneck
        assert z_content.shape == (2, 32, 4, 4)
        assert float(jnp.abs(y).max()) <= 1.0  # tanh head

    def test_no_style_no_skips(self):
        import jax

        from latentfusion_tpu.pggan.generator import EncoderDecoder

        model = EncoderDecoder(in_channels=1, out_channels=2,
                               block_config=(4, 8), style_size=0,
                               skip_connections=False)
        x = jnp.zeros((1, 1, 8, 8))
        params = model.init(jax.random.PRNGKey(0), x)
        y, _ = model.apply(params, x)
        assert y.shape == (1, 2, 8, 8)
