"""Benchmark: candidate poses rendered + scored per second on one chip.

Reference baseline (BASELINE.md): PERCH 2.0 scores ~700-pose GPU batches
with render+cloud+GICP+KNN+cost in ~1 s/scene on an NVidia GPU; the rebuild
target is >= 100k candidate poses rendered+scored per second on one TPU v5e
chip. This benchmark runs the full unified pipeline (render -> cloud -> ICP
refine -> re-render -> 1-NN -> cost) on a YCB-scale synthetic problem:
640x480 images at stride 8, 1024-triangle models, label-partitioned
observed segments, NN-association ICP, per-pose ROI windows, Pallas kernels.

Timing note: the axon TPU tunnel has ~27 ms host round-trip latency and a
non-blocking block_until_ready, so the pipeline is iterated inside one
jitted fori_loop with forced data dependencies and a single scalar
readback (see benchmarks/harness.py).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

BASELINE_POSES_PER_SEC = 100_000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as graft
    from perception_tpu.pipeline.scorer import score_pose_batch

    n_poses = int(os.environ.get("BENCH_POSES", 512))
    on_tpu = jax.default_backend() == "tpu"
    cfg, args = graft._synthetic_problem(
        n_poses=n_poses, t_cap=1024, width=640, height=480, stride=8,
        seg_cap=1024, n_labels=4, max_points=1024)
    cfg = dataclasses.replace(
        cfg,
        do_icp=True, icp_mode="nn", icp_max_iterations=15, icp_downsample=4,
        roi_shape=(32, 32),
        backend="pallas" if on_tpu else "xla")

    args = [jax.device_put(np.asarray(a)) if not isinstance(a, tuple)
            else jax.tree_util.tree_map(
                lambda x: jax.device_put(np.asarray(x)), a)
            for a in args]
    (btv, btc, bvl, poses, mids, labels, totals, proj, scene) = args

    def step(p):
        out = score_pose_batch(btv, btc, bvl, p, mids, labels, totals,
                               proj, scene, cfg)
        return out.rendered_cost

    @jax.jit
    def repeated(p, iters):
        def body(_, carry):
            p_cur, acc = carry
            s = step(p_cur).sum()
            return (p_cur + (s * 1e-30).astype(p_cur.dtype), acc + s)

        return jax.lax.fori_loop(0, iters, body, (p, jnp.float32(0.0)))[1]

    t0 = time.perf_counter()
    float(repeated(poses, 1))
    compile_time = time.perf_counter() - t0

    inner = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(repeated(poses, inner))
        best = min(best, (time.perf_counter() - t0) / inner)

    poses_per_sec = n_poses / best
    result = {
        "metric": "candidate_poses_rendered_scored_per_sec",
        "value": round(poses_per_sec, 1),
        "unit": "poses/s",
        "vs_baseline": round(poses_per_sec / BASELINE_POSES_PER_SEC, 4),
        "batch": n_poses,
        "batch_seconds": round(best, 4),
        "compile_seconds": round(compile_time, 1),
        "device": str(jax.devices()[0]),
        "config": "640x480 s8 T1024 S1024 roi32 icp_nn15 pallas",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
