"""Benchmark: candidate poses rendered + scored per second on one chip.

Reference baseline (BASELINE.md): PERCH 2.0 scores ~700-pose GPU batches
with render+cloud+GICP+KNN+cost in ~1 s/scene on an NVidia GPU; the rebuild
target is >= 100k candidate poses rendered+scored per second on one TPU v5e
chip. This benchmark runs the full unified pipeline (render -> cloud -> ICP
refine -> re-render -> 1-NN -> cost) on a YCB-scale synthetic problem:
640x480 images, stride 8, 1024-triangle models, 4096-point observed
segments, ICP enabled.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_POSES_PER_SEC = 100_000.0


def main() -> None:
    import jax

    import __graft_entry__ as graft
    from perception_tpu.pipeline.scorer import score_pose_batch

    n_poses = int(__import__("os").environ.get("BENCH_POSES", 700))
    cfg, args = graft._synthetic_problem(
        n_poses=n_poses, t_cap=1024, width=640, height=480, stride=8,
        seg_cap=4096, n_labels=4, max_points=1024)
    # Production ICP depth (the reference runs up to 150 GICP iterations;
    # our point-to-plane converges in far fewer — use the scorer default).
    import dataclasses
    cfg = dataclasses.replace(cfg, icp_max_iterations=20, icp_downsample=4)

    args = [jax.device_put(np.asarray(a)) for a in args]

    t0 = time.perf_counter()
    scores = score_pose_batch(*args, cfg)
    jax.block_until_ready(scores.total_cost)
    compile_time = time.perf_counter() - t0

    # Timed runs.
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        scores = score_pose_batch(*args, cfg)
    jax.block_until_ready(scores.total_cost)
    dt = (time.perf_counter() - t0) / iters

    poses_per_sec = n_poses / dt
    result = {
        "metric": "candidate_poses_rendered_scored_per_sec",
        "value": round(poses_per_sec, 1),
        "unit": "poses/s",
        "vs_baseline": round(poses_per_sec / BASELINE_POSES_PER_SEC, 4),
        "batch": n_poses,
        "batch_seconds": round(dt, 4),
        "compile_seconds": round(compile_time, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
