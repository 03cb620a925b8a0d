"""Paired comparison of two accuracy_synthetic runs on identical seeds.

Reads the JSON result line (with scene_errors) from two run logs, computes
the AUC delta with a PAIRED scene-level bootstrap (resampling scene
indices jointly), and reports whether the delta's 95% CI excludes zero.
Pairing removes the scene-difficulty variance that dominates independent
CIs (+-5 AUC at 50 scenes -> ~+-1 paired).

Usage: python benchmarks/compare_runs.py runA.log runB.log
"""

from __future__ import annotations

import json
import sys

import numpy as np


def load(path: str) -> dict:
    if path.startswith("ladder:"):
        # A rung from benchmarks/accuracy_ladder.json, e.g. "ladder:default"
        # or "ladder:hires_qem" — entries store scene_errors since round 3.
        import os
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "accuracy_ladder.json")) as f:
            table = json.load(f)
        name = path.split(":", 1)[1]
        if name not in table:
            raise SystemExit(f"no ladder rung {name!r}")
        return table[name]
    with open(path) as f:
        lines = [ln for ln in f if ln.startswith("{")]
    if not lines:
        raise SystemExit(f"{path}: no result JSON line")
    return json.loads(lines[-1])


def auc_of(scene_errors, pick) -> float:
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from perception_tpu.eval.metrics import compute_pose_metrics

    errs = np.asarray([e for i in pick for e in scene_errors[i]])
    return compute_pose_metrics(errs)["auc"]


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    ea, eb = a["scene_errors"], b["scene_errors"]
    if len(ea) != len(eb) or a.get("seed") != b.get("seed"):
        print("WARNING: runs differ in scene count or seed — pairing "
              "assumes identical scene sequences")
    n = min(len(ea), len(eb))
    rng = np.random.default_rng(0)
    deltas = []
    for _ in range(2000):
        pick = rng.integers(0, n, size=n)
        deltas.append(auc_of(eb, pick) - auc_of(ea, pick))
    deltas = np.asarray(deltas)
    lo, hi = np.percentile(deltas, [2.5, 97.5])
    base = auc_of(ea, range(n))
    other = auc_of(eb, range(n))
    print(json.dumps({
        "auc_a": round(base, 2), "auc_b": round(other, 2),
        "delta": round(other - base, 2),
        "delta_ci95": [round(float(lo), 2), round(float(hi), 2)],
        "significant": bool(lo > 0 or hi < 0),
        "scenes": n,
    }))


if __name__ == "__main__":
    main()
