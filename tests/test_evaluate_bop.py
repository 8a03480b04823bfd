"""End-to-end BOP evaluation harness smoke test: fake LINEMOD-layout scene +
tiny random-weight checkpoint -> tools/evaluate_bop.py main() -> metric rows.

Accuracy is NOT asserted (random weights); this locks the harness itself:
dataset indexing, latent build, coarse+fine estimation, ADD metric plumbing
and the JSON report."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))

N_FRAMES = 6
W, H = 80, 60
F = 150.0
Z_MM = 400.0
DIAMETER_MM = 100.0


def _rot(axis, angle):
    import latentfusion_tpu.three as three
    import jax.numpy as jnp

    from latentfusion_tpu.three import quaternion as quat

    q = quat.from_axis_angle(jnp.asarray(axis, jnp.float32), angle)
    return np.asarray(quat.quat_to_mat(q[None])[0, :3, :3])


def make_fake_bop(tmp_path):
    import imageio.v2 as imageio

    root = tmp_path / "lm"
    scene = root / "test" / "000001"
    for d in ("depth", "mask_visib", "rgb"):
        (scene / d).mkdir(parents=True)
    (root / "models_eval").mkdir(parents=True)
    (root / "models").mkdir()

    models_info = {"1": {"diameter": DIAMETER_MM,
                         "min_x": -50, "min_y": -50, "min_z": -50,
                         "size_x": 100, "size_y": 100, "size_z": 100}}
    (root / "models_eval" / "models_info.json").write_text(
        json.dumps(models_info))

    # Tiny tetrahedron eval pointcloud (ascii PLY, mm units).
    ply = ["ply", "format ascii 1.0", "element vertex 4",
           "property float x", "property float y", "property float z",
           "element face 1", "property list uchar int vertex_indices",
           "end_header",
           "50 0 0", "-50 0 0", "0 50 0", "0 0 50", "3 0 1 2"]
    (root / "models_eval" / "obj_000001.ply").write_text("\n".join(ply))

    cam_json, gt_json = {}, {}
    rng = np.random.RandomState(0)
    for i in range(N_FRAMES):
        R = _rot((0.0, 1.0, 0.0), 2 * np.pi * i / N_FRAMES)
        cam_json[str(i)] = {"cam_K": [F, 0, W / 2, 0, F, H / 2, 0, 0, 1],
                            "depth_scale": 0.1}
        gt_json[str(i)] = [{"obj_id": 1,
                            "cam_R_m2c": [float(v) for v in R.reshape(-1)],
                            "cam_t_m2c": [0.0, 0.0, Z_MM]}]
        # Filled disk mask, constant in-mask depth at the object distance.
        yy, xx = np.mgrid[0:H, 0:W]
        r = F * (DIAMETER_MM / 2) / Z_MM  # ~18.75 px
        mask = ((xx - W / 2) ** 2 + (yy - H / 2) ** 2) < r ** 2
        depth = np.where(mask, Z_MM / 0.1, 0).astype(np.uint16)
        color = (rng.rand(H, W, 3) * 80 + mask[..., None] * 120).astype(
            np.uint8)
        imageio.imsave(scene / "rgb" / f"{i:06d}.png", color)
        imageio.imsave(scene / "depth" / f"{i:06d}.png", depth)
        imageio.imsave(scene / "mask_visib" / f"{i:06d}_000000.png",
                       (mask * 255).astype(np.uint8))
    (scene / "scene_camera.json").write_text(json.dumps(cam_json))
    (scene / "scene_gt.json").write_text(json.dumps(gt_json))
    return root, scene


def make_checkpoint(tmp_path):
    import torch

    import jax

    from latentfusion_tpu import zoo
    from latentfusion_tpu.recon import checkpoint as ckpt

    sc, ph, fu = zoo.tiny_sculptor(), zoo.tiny_photographer(), zoo.tiny_fuser()
    params = zoo.init_recon_params(jax.random.PRNGKey(0), sc, fu, ph)

    def module_ckpt(module, p):
        return {"args": module.checkpoint_args(),
                "state_dict": {k: torch.from_numpy(np.array(v))
                               for k, v in
                               ckpt.export_torch_state_dict(p).items()}}

    payload = {
        "name": "tiny", "epoch": 0, "meter_hists": {},
        "args": {"camera_dist": 1.5, "no_discriminator": True,
                 "input_size": sc.in_size,
                 "generator_input_depth": True, "generator_input_mask": True,
                 "predict_color": False, "predict_depth": True,
                 "predict_mask": True},
        "modules": {
            "sculptor": module_ckpt(sc, params["sculptor"]),
            "photographer": module_ckpt(ph, params["photographer"]),
            "fuser": {"type": "GRUFuser",
                      "args": {"in_channels": fu.in_channels,
                               "cube_size": fu.cube_size},
                      "state_dict": {
                          k: torch.from_numpy(np.array(v)) for k, v in
                          ckpt.export_torch_state_dict(
                              params["fuser"]).items()}},
        },
    }
    path = tmp_path / "tiny.pth"
    torch.save(payload, path)
    return path


def write_mini_configs(tmp_path):
    coarse = tmp_path / "coarse.toml"
    coarse.write_text("""\
type = "cross_entropy"
[loss_weights]
depth = 1.0
[args]
num_samples = 16
num_iters = 2
ranking_size = 4
num_elites = 8
num_gmm_components = 2
learning_rate = 0.9
sample_flipped = false
""")
    fine = tmp_path / "fine.toml"
    fine.write_text("""\
type = "gradient"
[args]
optimizer = "adam"
num_iters = 5
num_samples = 4
ranking_size = 4
learning_rate = 0.01
converge_threshold = 1e-6
converge_patience = 5
[loss_weights]
depth = 1.0
ov_depth = 0.3
""")
    return coarse, fine


def test_evaluate_bop_end_to_end(tmp_path):
    import evaluate_bop

    root, scene = make_fake_bop(tmp_path)
    checkpoint = make_checkpoint(tmp_path)
    coarse_cfg, fine_cfg = write_mini_configs(tmp_path)
    out = tmp_path / "results.json"

    rows, acc = evaluate_bop.main([
        "--checkpoint", str(checkpoint),
        "--dataset-path", str(root), "--scene-path", str(scene),
        "--object-id", "1", "--num-input-views", "3", "--num-frames", "2",
        "--coarse-config", str(coarse_cfg), "--fine-config", str(fine_cfg),
        "--top-k", "4", "--batch-frames", "2", "--out", str(out)])

    assert len(rows) == 2
    for r in rows:
        for k in ("add", "add_s", "add_sym", "proj2d", "rotation_dist",
                  "translation_dist", "frame", "add_01d"):
            assert k in r
        assert np.isfinite(r["add"])
        # distances are in native units (mm); sane magnitude, not garbage
        assert 0 <= r["add"] < 10 * DIAMETER_MM
    assert set(acc) == {"add_0.1d", "add_s_0.1d"}

    payload = json.loads(out.read_text())
    assert payload["object_id"] == 1
    assert len(payload["frames"]) == 2
