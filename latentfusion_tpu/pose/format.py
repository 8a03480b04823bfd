"""Metric table formatting (behavioral reference: ``latentfusion/pose/format.py``).

The reference uses the ``tabulate`` package; stdlib formatting here.
"""
from __future__ import annotations

import math
from typing import Dict, List

import numpy as np


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.4f}"
    return str(v)


def simple_table(rows: List[List], headers: List[str]) -> str:
    cols = list(zip(*([headers] + [[_fmt(c) for c in r] for r in rows])))
    widths = [max(len(str(c)) for c in col) for col in cols]
    lines = []
    all_rows = [headers] + [[_fmt(c) for c in r] for r in rows]
    for i, row in enumerate(all_rows):
        lines.append("  ".join(str(c).ljust(w) for c, w in zip(row, widths)))
        if i == 0:
            lines.append("  ".join("-" * w for w in widths))
    return "\n".join(lines)


def metrics_table(metrics: Dict, name: str = "") -> str:
    """Single-estimate metric table (reference: format.py:10-44)."""
    rows = []
    for k, v in metrics.items():
        if k == "rotation_dist":
            v = v / math.pi * 180.0
            k = "rotation_dist (deg)"
        rows.append([k, float(np.asarray(v).reshape(()))])
    return (f"{name}\n" if name else "") + simple_table(rows, ["metric", "value"])


def metrics_table_multiple(metrics_list: List[Dict], names=None,
                           thresholds=(0.02, 0.05, 0.10)) -> str:
    """Aggregate table over multiple estimates with ADD(-S) accuracy
    thresholds (reference: format.py:47-105)."""
    if names is None:
        names = [str(i) for i in range(len(metrics_list))]
    keys = list(metrics_list[0].keys())
    headers = ["name"] + keys
    rows = []
    for name, m in zip(names, metrics_list):
        rows.append([name] + [float(np.asarray(m[k]).reshape(())) for k in keys])

    # Mean row + threshold accuracy rows for point metrics.
    mean_row = ["MEAN"] + [float(np.mean([r[i + 1] for r in rows]))
                           for i in range(len(keys))]
    rows.append(mean_row)
    lines = [simple_table(rows, headers)]
    for t in thresholds:
        acc = {}
        for k in keys:
            if k in ("add", "add_s", "add_sym"):
                vals = [m[k] for m in metrics_list]
                acc[k] = float(np.mean([v < t for v in vals]))
        if acc:
            lines.append(f"accuracy @ {t:.2f}m: " + ", ".join(
                f"{k}={v:.3f}" for k, v in acc.items()))
    return "\n".join(lines)
