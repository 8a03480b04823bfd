"""bench.py must keep working — the evaluation driver runs it directly."""
import json
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).parents[1]


@pytest.mark.parametrize("mode,extra", [
    ("gradient", []),
    ("gradient", ["--refine-unroll", "2"]),
    ("train", []),
    ("train", ["--real-data", "--loader-workers", "1",
               "--transport", "quantized"]),
])
def test_bench_tiny_cpu(mode, extra):
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), "--cpu", "--tiny",
         "--iters", "10", "--mode", mode, *extra],
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0
