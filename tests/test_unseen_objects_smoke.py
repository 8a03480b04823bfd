"""Smoke test for the unseen-object generalization rig
(tools/train_unseen_objects.py): tiny family, shrunken search budgets, CPU.

Covers the rig's full plumbing — pool sampling, encoder-in-the-loop distill
step, snapshot curve, CEM + gradient eval with the --rank-* ranking flags
(the reference's flip-basin disambiguator, reference
recon/inference.py:86-99), --eval-out redirection, and artifact schema
(split + search_budget blocks the published artifacts rely on).
"""
import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))


@pytest.mark.slow
def test_unseen_objects_rig_smoke(tmp_path):
    import train_unseen_objects

    out = tmp_path / "run"
    eval_out = tmp_path / "re_eval"
    train_unseen_objects.main([
        "--tiny", "--cpu",
        "--steps", "3",
        "--train-objects", "2", "--heldout-objects", "1",
        "--views-in", "2", "--views-out", "2",
        "--eval-targets", "1", "--eval-views", "2",
        "--cem-samples", "8", "--cem-iters", "2", "--cem-elites", "4",
        "--refine-samples", "2", "--refine-iters", "3",
        "--rank-latent-weight", "0.2",
        "--out", str(out),
    ])

    eval_rec = json.loads((out / "pose_eval.json").read_text())
    assert eval_rec["split"]["train_objects"] == 2
    assert eval_rec["split"]["heldout_pool_seed"] == 7919
    assert eval_rec["search_budget"]["cem_samples"] == 8
    assert eval_rec["search_budget"]["rank_latent_weight"] == 0.2
    assert len(eval_rec["heldout"]) == 1
    assert 0.0 <= eval_rec["heldout_add_s_0.1d"] <= 1.0
    assert (out / "unseen_objects.npz").exists()

    # --skip-train re-eval into --eval-out must leave the original artifact
    # untouched and record its own budget. Budget shapes/weights match the
    # first run so the persistent compile cache is hit (keeps CPU CI fast).
    before = (out / "pose_eval.json").read_text()
    train_unseen_objects.main([
        "--tiny", "--cpu", "--skip-train",
        "--train-objects", "2", "--heldout-objects", "1",
        "--views-in", "2", "--views-out", "2",
        "--eval-targets", "1", "--eval-views", "2",
        "--cem-samples", "8", "--cem-iters", "2", "--cem-elites", "4",
        "--refine-samples", "2", "--refine-iters", "3",
        "--rank-latent-weight", "0.2",
        "--out", str(out), "--eval-out", str(eval_out),
    ])
    assert (out / "pose_eval.json").read_text() == before
    re_rec = json.loads((eval_out / "pose_eval.json").read_text())
    assert re_rec["search_budget"]["cem_samples"] == 8
    assert re_rec["search_budget"]["rank_latent_weight"] == 0.2
