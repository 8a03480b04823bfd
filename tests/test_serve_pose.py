"""tools/serve_pose.py: the serving wrapper must answer the JSON protocol
end-to-end (register -> estimate -> batched estimate -> shutdown) with the
model and compiled loops staying resident between requests."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).parents[1]

COARSE = json.dumps({
    "type": "cross_entropy",
    "loss_weights": {"depth": 1.0},
    "args": {"num_samples": 16, "num_iters": 2, "ranking_size": 4,
             "num_elites": 8, "num_gmm_components": 2,
             "learning_rate": 0.9, "sample_flipped": False},
})
FINE = json.dumps({
    "type": "gradient",
    "loss_weights": {"depth": 1.0, "ov_depth": 0.3},
    "args": {"optimizer": "adam", "num_iters": 5, "num_samples": 4,
             "ranking_size": 4, "learning_rate": 0.01,
             "converge_threshold": 1e-6, "converge_patience": 5},
})


def write_npz(path, n_views, seed=0):
    """Synthetic observation npz: box mask, constant depth, ring cameras."""
    rng = np.random.RandomState(seed)
    h, w = 48, 64
    color = np.full((n_views, 3, h, w), 0.5, np.float32)
    depth = np.full((n_views, 1, h, w), 1.5, np.float32)
    mask = np.zeros((n_views, 1, h, w), np.float32)
    mask[:, :, 16:32, 24:40] = 1.0
    depth = depth * mask  # estimators window depth by the mask
    intrinsic = np.array([[64.0, 0, w / 2], [0, 64.0, h / 2], [0, 0, 1]],
                         np.float32)
    extrinsic = np.tile(np.eye(4, dtype=np.float32)[None], (n_views, 1, 1))
    for i in range(n_views):
        a = 2 * np.pi * i / max(n_views, 1) + rng.rand() * 0.1
        extrinsic[i, 0, 0] = np.cos(a)
        extrinsic[i, 0, 2] = np.sin(a)
        extrinsic[i, 2, 0] = -np.sin(a)
        extrinsic[i, 2, 2] = np.cos(a)
        extrinsic[i, 2, 3] = 1.5
    np.savez(path, color=color, depth=depth, mask=mask,
             intrinsic=intrinsic, extrinsic=extrinsic)
    return path


def test_serve_pose_stdio(tmp_path):
    refs = write_npz(tmp_path / "refs.npz", n_views=2)
    frame = write_npz(tmp_path / "frame.npz", n_views=1, seed=7)
    frame2 = write_npz(tmp_path / "frame2.npz", n_views=1, seed=8)

    requests = [
        {"cmd": "ping", "id": 0},
        {"cmd": "register", "id": 1, "object": "demo", "npz": str(refs)},
        {"cmd": "estimate", "id": 2, "object": "demo", "npz": str(frame)},
        {"cmd": "estimate", "id": 3, "object": "demo",
         "npz": [str(frame), str(frame2)]},
        {"cmd": "estimate", "id": 4, "object": "missing",
         "npz": str(frame)},
        # Multi-OBJECT joint batch: frame i against object i's latent.
        {"cmd": "register", "id": 6, "object": "demo2", "npz": str(refs)},
        {"cmd": "estimate", "id": 7, "object": ["demo", "demo2"],
         "npz": [str(frame), str(frame2)]},
        {"cmd": "estimate", "id": 8, "object": ["demo", "demo2"],
         "npz": str(frame)},
        {"cmd": "shutdown", "id": 5},
    ]
    stdin = "".join(json.dumps(r) + "\n" for r in requests)
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools/serve_pose.py"), "--stdio",
         "--cpu", "--demo-tiny", "--no-cache", "--top-k", "4",
         "--coarse-json", COARSE, "--fine-json", FINE],
        input=stdin, capture_output=True, text=True, timeout=1500)
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [json.loads(l) for l in out.stdout.splitlines() if l.strip()]
    byid = {r["id"]: r for r in lines}

    assert byid[0]["ok"] and byid[0]["objects"] == []
    assert byid[1]["ok"] and byid[1]["views"] == 2
    # Single-frame estimate: a finite 4x4 pose for the best hypothesis.
    assert byid[2]["ok"], byid[2]
    E = np.asarray(byid[2]["extrinsic"])
    assert E.shape == (4, 4) and np.isfinite(E).all()
    assert np.isfinite(byid[2]["translation"]).all()
    # Batched frames share the latent and return one pose per frame.
    assert byid[3]["ok"] and len(byid[3]["poses"]) == 2
    for p in byid[3]["poses"]:
        assert np.isfinite(np.asarray(p["extrinsic"])).all()
    # Unknown object: error reported, server keeps answering (shutdown ok).
    assert not byid[4]["ok"] and "KeyError" in byid[4]["error"]
    # Multi-object joint batch: one pose per (object, frame) pair.
    assert byid[7]["ok"] and len(byid[7]["poses"]) == 2
    for p in byid[7]["poses"]:
        assert np.isfinite(np.asarray(p["extrinsic"])).all()
    # Object list without a matching npz list is a protocol error.
    assert not byid[8]["ok"] and "ValueError" in byid[8]["error"]
    assert byid[5]["ok"] and byid[5]["shutdown"]
