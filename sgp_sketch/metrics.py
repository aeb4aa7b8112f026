"""Run metrics: throughput, imbalance percentiles, stage timings.

Mirrors the reference's metric definitions so results are comparable:
- imbalance = max(load)/mean(load) (log_parser.py:133-138);
- percentiles [0,25,50,75,100] over per-partition loads (ldb c_run.py:129-133
  pattern);
- tokens/sec per stage from wall clock + the counts carried on partial rows
  (the Ray-native replacement for the reference's per-second AtomicLong
  reporter, ADJParser.groovy:142-149).
"""

from __future__ import annotations

import json

import numpy as np


def imbalance_report(loads) -> dict:
    loads = np.asarray(loads, dtype=np.float64)
    if len(loads) == 0 or loads.sum() == 0:
        # SAME shape as the normal branch: consumers reading 'total' or
        # schema-checking the JSON must not hit a key/type flip exactly
        # on the degenerate case
        return {"imbalance": 0.0, "percentiles": [0.0] * 5, "total": 0.0}
    return {
        "imbalance": float(loads.max() / loads.mean()),
        "percentiles": [float(x) for x in
                        np.percentile(loads, [0, 25, 50, 75, 100])],
        "total": float(loads.sum()),
    }


def load_delta_report(before, after) -> dict:
    """Pairwise per-partition load delta (SURVEY §2.5 A6: the reference
    diffs balance vectors between runs/iterations, log_parser.py:133-138
    consumers). Returns per-partition deltas + the imbalance drift."""
    b = np.asarray(before, dtype=np.float64)
    a = np.asarray(after, dtype=np.float64)
    if len(b) != len(a):
        raise ValueError(f"partition count changed: {len(b)} != {len(a)}")
    delta = a - b
    return {
        "delta": [float(x) for x in delta],
        "max_abs_delta": float(np.abs(delta).max()) if len(delta) else 0.0,
        "imbalance_before": imbalance_report(b)["imbalance"],
        "imbalance_after": imbalance_report(a)["imbalance"],
    }


def throughput_report(n_rows: int, n_tokens: int, wall_sec: float) -> dict:
    return {
        "n_rows": int(n_rows),
        "n_tokens": int(n_tokens),
        "wall_sec": float(wall_sec),
        "rows_per_sec": n_rows / wall_sec if wall_sec else 0.0,
        "tokens_per_sec": n_tokens / wall_sec if wall_sec else 0.0,
    }


def write_metrics(path: str, payload: dict) -> None:
    import os

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, default=str)
    os.replace(tmp, path)
