"""Training resume/branch: params restored, args restored with overrides."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))
sys.path.insert(0, str(Path(__file__).parent))


BASE_ARGV = [
    "--dataset-type", "paths",
    "--save-dir", None,  # filled in
    "--base-name", "resume-smoke",
    "--input-size", "16",
    "--render-width", "64", "--render-height", "48",
    "--batch-size", "1",
    "--batches-per-epoch", "1",
    "--num-epochs", "1",
    "--num-workers", "0",
    "--num-input-views", "2", "--num-output-views", "2",
    "--sculptor-image-config", "4,D,8:8",
    "--sculptor-camera-config", "4,4",
    "--sculptor-object-config", "4,4",
    "--photographer-object-config", "none",
    "--photographer-camera-config", "4,4",
    "--photographer-image-config", "4,D,8:8,U,8,U,4",
    "--fuser-type", "gru",
    "--no-discriminator",
    "--predict-depth", "--predict-mask",
    "--generator-input-mask",
    "--save-interval", "-1",
]


def test_resume_and_branch(tmp_path):
    from test_data import make_cube_obj

    import train_reconstruct

    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    make_cube_obj(mesh_dir)

    argv = list(BASE_ARGV)
    argv[argv.index(None)] = str(tmp_path / "runs")
    argv += ["--dataset-path", str(mesh_dir)]
    train_reconstruct.main(argv)

    run_dir = next((tmp_path / "runs").iterdir())
    ckpt = run_dir / "ckpt-epoch-latest.npz.pkl"
    assert ckpt.exists()

    # Resume + branch under a new name; arch flags come from the checkpoint
    # (pass deliberately-wrong CLI arch values to prove restore wins).
    argv2 = list(BASE_ARGV)
    argv2[argv2.index(None)] = str(tmp_path / "runs")
    argv2 += ["--dataset-path", str(mesh_dir),
              "--resume", str(ckpt),
              "--branch", "--branch-name", "forked",
              "--override", "batches-per-epoch"]
    train_reconstruct.main(argv2)

    names = sorted(p.name for p in (tmp_path / "runs").iterdir())
    assert len(names) == 2
    assert any("forked" in n for n in names)


def test_moved_dataset_path_rewrite(tmp_path):
    """Resume keeps the CLI dataset path when the checkpointed one is gone
    (reference: train_reconstruct.py:173-190)."""
    import argparse

    from train_reconstruct import load_checkpoint_args

    live = tmp_path / "data"
    live.mkdir()
    args = argparse.Namespace(dataset_path=live, background_path=None,
                              depth_background_path=None, texture_path=None,
                              batch_size=1, resume="x", branch=False,
                              branch_name=None, override="", save_dir=None,
                              num_epochs=1)
    ckpt_args = {"dataset_path": "/nonexistent/shapenet", "batch_size": 8}
    out = load_checkpoint_args(ckpt_args, args, override="")
    assert out.dataset_path == live        # CLI path kept (old one is gone)
    assert out.batch_size == 8             # other args restored

    # When the checkpointed path still exists it wins, as before.
    old = tmp_path / "old"
    old.mkdir()
    args.dataset_path = live
    out = load_checkpoint_args({"dataset_path": str(old)}, args, override="")
    assert str(out.dataset_path) == str(old)


def test_fsdp_cli_smoke(tmp_path):
    """--fsdp N trains on a 2-D data x fsdp mesh: params + opt state sharded
    over the fsdp axis, batch over data (8 virtual devices -> 2x4)."""
    from test_data import make_cube_obj

    import train_reconstruct

    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    make_cube_obj(mesh_dir)

    argv = list(BASE_ARGV)
    argv[argv.index(None)] = str(tmp_path / "runs")
    argv[argv.index("--batch-size") + 1] = "2"
    argv += ["--dataset-path", str(mesh_dir), "--fsdp", "4"]
    train_reconstruct.main(argv)
    # Completed one epoch and saved a checkpoint directory.
    assert next((tmp_path / "runs").iterdir(), None) is not None
