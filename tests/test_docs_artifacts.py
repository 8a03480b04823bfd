"""Every artifact path cited in README/docs must exist in-tree
(VERDICT r3 missing #4: README cited artifacts/bench_r3.json after a sweep
script deleted it — the published numbers' receipts must not 404), and the
headline accuracy numbers quoted in README must MATCH the committed
artifact values (VERDICT r4 next #8: a regenerated artifact must not let
the prose silently drift)."""
import json
import re
from pathlib import Path

REPO = Path(__file__).parents[1]

CITED_RE = re.compile(r"artifacts/[\w.\-/]+\.(?:json|npz|pth)")


def _cited_paths():
    docs = [REPO / "README.md", *sorted((REPO / "docs").glob("*.md"))]
    cited = {}
    for doc in docs:
        for m in CITED_RE.finditer(doc.read_text()):
            cited.setdefault(m.group(0), []).append(doc.name)
    return cited


def test_cited_artifacts_exist():
    cited = _cited_paths()
    assert cited, "no artifact citations found — regex or docs moved?"
    missing = {p: docs for p, docs in cited.items()
               if not (REPO / p).exists()}
    assert not missing, (
        f"cited artifacts missing from the tree: {missing} — either commit "
        f"the artifact or update the citation")


def _readme():
    return (REPO / "README.md").read_text()


def _pose_eval(rel):
    return json.loads((REPO / rel).read_text())


# README claim regex -> (artifact, key). The claim's captured N/M fraction
# must equal the artifact's recorded gate rate. If a rig re-run changes an
# artifact, README must be updated in the same commit (and vice versa).
GATE_PINS = [
    (r"\| 64 objects \| 150k \| \*\*(\d+)/(\d+) \(",
     "artifacts/unseen_objects/pose_eval.json", "heldout_add_s_0.1d"),
    (r"\| 128 objects \| 150k \| (\d+)/(\d+) \(",
     "artifacts/unseen_objects_pool128/pose_eval.json",
     "heldout_add_s_0.1d"),
    (r"latent ranking\*\* \(same checkpoint, `--rank-latent-weight 0\.2`\) "
     r"\| — \| \*\*(\d+)/(\d+)",
     "artifacts/unseen_objects_pool128/latent_rank/pose_eval.json",
     "heldout_add_s_0.1d"),
    (r"lifts held-out to (\d+)/(\d+)\n",
     "artifacts/unseen_objects_pool128/slow_budget/pose_eval.json",
     "heldout_add_s_0.1d"),
    (r"mid family, 67\.4M params\*\* [^|]*\| 150k \| (\d+)/(\d+) \(",
     "artifacts/unseen_objects_mid/pose_eval.json", "heldout_add_s_0.1d"),
    (r"encoder in\s+the loop: ADD-S 0\.1d = (\d+)/(\d+)\*\*",
     "artifacts/encoder_distill/pose_eval.json", "add_s_0.1d"),
]


def test_readme_gate_rates_match_artifacts():
    readme = _readme()
    for pattern, artifact, key in GATE_PINS:
        m = re.search(pattern, readme)
        assert m, f"README no longer states the pinned claim: {pattern!r}"
        claimed = int(m.group(1)) / int(m.group(2))
        rec = _pose_eval(artifact)
        if key not in rec:  # encoder_distill uses a per-eval layout
            hits = [t["add_s_01d"] for o in rec["heldout"]
                    for t in o["targets"]]
            actual = sum(hits) / len(hits)
        else:
            actual = rec[key]
        assert abs(actual - claimed) < 1e-6, (
            f"README claims {m.group(1)}/{m.group(2)} but {artifact}[{key}] "
            f"= {actual:.4f} — sync the prose to the artifact")


def test_readme_full_acc_rows_match_bench_artifact():
    """The 's/object at ADD-S' bench-table rows must match the committed
    per-round bench artifact's full-acc records."""
    readme = _readme()
    bench_files = sorted(set(re.findall(r"artifacts/bench_r\d+\.json",
                                        readme)))
    assert bench_files, "README cites no per-round bench artifact"
    records = []
    for rel in bench_files:
        with open(REPO / rel) as f:
            records += [json.loads(line) for line in f if line.strip()]
    full_acc = [r for r in records if r.get("mode") == "full-acc"]
    assert full_acc, "bench artifact has no full-acc records"

    rows = re.findall(
        r"\*\*([\d.]+) s/object at ADD-S 0\.1d = ([\d.]+)\*\*", readme)
    assert rows, "README no longer quotes s/object-at-accuracy rows"
    for sec, acc in rows:
        match = [r for r in full_acc
                 if abs(r["value"] - float(sec)) < 0.005 + 1e-9
                 and abs(r["add_s_0.1d"] - float(acc)) < 0.005 + 1e-9]
        assert match, (
            f"README quotes {sec} s/object at {acc} but no full-acc record "
            f"in {bench_files} matches — re-sync README to the artifact")
