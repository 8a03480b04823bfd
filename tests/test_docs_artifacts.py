"""Every artifact path cited in README/docs must exist in-tree
(VERDICT r3 missing #4: README cited artifacts/bench_r3.json after a sweep
script deleted it — the published numbers' receipts must not 404)."""
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
