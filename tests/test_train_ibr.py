"""IBR generator training: step-level test + CLI smoke on a cube mesh."""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))


def make_tiny_recon_pth(tmp_path):
    import torch

    from latentfusion_tpu import zoo
    from latentfusion_tpu.recon import checkpoint as ckpt

    key = jax.random.PRNGKey(0)
    sculptor = zoo.tiny_sculptor()
    fuser = zoo.tiny_fuser()
    photographer = zoo.tiny_photographer()
    params = zoo.init_recon_params(key, sculptor, fuser, photographer,
                                   batch=1, views=2)

    def module_ckpt(module, p):
        return {"args": module.checkpoint_args(),
                "state_dict": {
                    k: torch.from_numpy(np.asarray(v)) for k, v in
                    ckpt.export_torch_state_dict(p).items()}}

    payload = {
        "name": "tiny", "epoch": 0, "meter_hists": {},
        "args": {"camera_dist": 1.5, "cube_size": 1.0,
                 "no_discriminator": True, "generator_input_depth": False,
                 "generator_input_mask": True, "predict_color": False,
                 "predict_depth": True, "predict_mask": True},
        "modules": {
            "sculptor": module_ckpt(sculptor, params["sculptor"]),
            "photographer": module_ckpt(photographer, params["photographer"]),
            "fuser": {"type": "GRUFuser",
                      "args": {"in_channels": 4, "cube_size": 1.0},
                      "state_dict": {
                          k: torch.from_numpy(np.asarray(v)) for k, v in
                          ckpt.export_torch_state_dict(
                              params["fuser"]).items()}},
        },
    }
    path = tmp_path / "recon.pth"
    torch.save(payload, path)
    return path


def test_ibr_cli_smoke(tmp_path):
    from test_data import make_cube_obj

    import train_ibr

    recon_pth = make_tiny_recon_pth(tmp_path)
    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    make_cube_obj(mesh_dir)

    argv = [
        "--dataset-type", "paths",
        "--dataset-path", str(mesh_dir),
        "--save-dir", str(tmp_path / "runs"),
        "--base-name", "smoke",
        "--recon-checkpoint", str(recon_pth),
        "--input-size", "16",
        "--render-width", "64", "--render-height", "48",
        "--batch-size", "1",
        "--batches-per-epoch", "1",
        "--num-epochs", "1",
        "--num-workers", "0",
        "--num-input-views", "2", "--num-output-views", "2",
        "--generator-config", "8,D,16:16,U,8",
        "--ibr-type", "blend_flow",
        "--no-discriminator",
        "--save-interval", "-1",
    ]
    train_ibr.main(argv)
    run_dirs = list((tmp_path / "runs").iterdir())
    assert len(run_dirs) == 1
    assert any("epoch-latest" in c.name
               for c in run_dirs[0].glob("ckpt-*.pkl"))
