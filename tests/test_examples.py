"""Smoke-run the examples/ scripts end to end on CPU (tiny configs).

The examples are the script analogs of the reference's notebooks
(reference: examples/pose_estimation.ipynb); they are user-facing entry
points, so they get the same no-external-data smoke treatment as the
training CLIs (SURVEY.md section 4 test strategy).
"""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parents[1]

_FORCE_CPU = (
    "import jax; jax.config.update('jax_platforms', 'cpu'); "
    "import runpy, sys; sys.argv = {argv!r}; "
    # python examples/foo.py puts the script dir on sys.path; mirror it.
    "sys.path.insert(0, {scriptdir!r}); "
    "runpy.run_path({script!r}, run_name='__main__')"
)


def _run_example(script, argv, timeout=900):
    code = _FORCE_CPU.format(argv=[str(script)] + argv, script=str(script),
                             scriptdir=str(script.parent))
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, cwd=REPO)
    assert proc.returncode == 0, (
        f"{script.name} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    return proc


def test_pose_estimation_example(tmp_path):
    coarse = tmp_path / "coarse.toml"
    coarse.write_text(
        'type = "cross_entropy"\n'
        "[loss_weights]\ndepth = 1.0\n"
        "[args]\nnum_samples = 16\nnum_iters = 2\nranking_size = 4\n"
        "num_elites = 6\nnum_gmm_components = 2\nlearning_rate = 0.75\n"
        "sample_flipped = true\n")
    fine = tmp_path / "fine.toml"
    fine.write_text(
        'type = "gradient"\n'
        "[args]\noptimizer = \"adam\"\nnum_iters = 3\nnum_samples = 4\n"
        "ranking_size = 4\nlearning_rate = 0.01\n"
        "converge_threshold = 1e-6\nconverge_patience = 5\n"
        "[loss_weights]\ndepth = 1.0\nov_depth = 0.3\n")
    proc = _run_example(
        REPO / "examples" / "pose_estimation.py",
        ["--num-views", "2", "--input-size", "16",
         "--coarse-config", str(coarse), "--fine-config", str(fine)])
    assert "estimate" in proc.stdout.lower() or proc.stdout


def test_reconstruction_example(tmp_path):
    out = tmp_path / "grid.png"
    _run_example(
        REPO / "examples" / "reconstruction.py",
        ["--num-views", "2", "--input-size", "16", "--out", str(out)])
    assert out.exists() and out.stat().st_size > 0
