"""Cold-compile breakdown: where bench.py's compile_seconds goes.

AOT-lowers and compiles the unified scorer under ablated configs and
prints per-variant trace/compile wall times (persistent cache NOT
enabled, so every number is a true cold compile). Run on the real chip;
serialize with other TPU work.

Usage: python benchmarks/compile_profile.py [n_poses]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time


def main() -> None:
    os.environ.setdefault("PT_COMPILATION_CACHE", "0")
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))   # repo root (perception_tpu)
    sys.path.insert(0, here)                    # sibling bench_scene import
    from bench_scene import build_bench_problem

    from perception_tpu.pipeline.scorer import score_pose_batch

    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    env, cands, args, cfg = build_bench_problem(n_poses=n_poses)
    cfg = dataclasses.replace(cfg, icp_max_iterations=20)
    (btv, btc, bvl, poses, mids, labels, totals, proj, scene) = args
    kw = dict(bank_backface=env._render_bank[3],
              bank_icp_samples=env._bank_icp_samples,
              bank_icp_normals=env._bank_icp_normals,
              bank_tri_lab=env._render_bank_lab)

    variants = {
        "full": cfg,
        "no_icp": dataclasses.replace(cfg, do_icp=False),
        "icp_nn_mode": dataclasses.replace(cfg, icp_mode="nn"),
        "cost_cloud_render": dataclasses.replace(cfg, cost_cloud="render"),
        "xla_backend": dataclasses.replace(cfg, backend="xla"),
    }
    out = {}
    for name, vcfg in variants.items():
        try:
            t0 = time.perf_counter()
            lowered = score_pose_batch.lower(
                btv, btc, bvl, poses, mids, labels, totals, proj, scene,
                vcfg, **kw)
            t1 = time.perf_counter()
            lowered.compile()
            t2 = time.perf_counter()
            out[name] = {"trace_s": round(t1 - t0, 2),
                         "compile_s": round(t2 - t1, 2)}
        except Exception as e:  # keep profiling the rest
            out[name] = {"error": repr(e)[:200]}
        print(name, out[name], flush=True)

    if n_poses == 2048:
        # Does halving the batch (one raster sub-call instead of two)
        # halve anything? Re-build at 1024 and compile the full config.
        env2, _, args2, cfg2 = build_bench_problem(n_poses=1024)
        cfg2 = dataclasses.replace(cfg2, icp_max_iterations=20)
        (btv2, btc2, bvl2, poses2, mids2, labels2, totals2, proj2,
         scene2) = args2
        t0 = time.perf_counter()
        lowered = score_pose_batch.lower(
            btv2, btc2, bvl2, poses2, mids2, labels2, totals2, proj2,
            scene2, cfg2, bank_backface=env2._render_bank[3],
            bank_icp_samples=env2._bank_icp_samples,
            bank_icp_normals=env2._bank_icp_normals,
            bank_tri_lab=env2._render_bank_lab)
        t1 = time.perf_counter()
        lowered.compile()
        t2 = time.perf_counter()
        out["full_n1024"] = {"trace_s": round(t1 - t0, 2),
                             "compile_s": round(t2 - t1, 2)}
        print("full_n1024", out["full_n1024"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
