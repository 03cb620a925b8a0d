"""Ablation profile: time the REAL pipeline under config deltas, so each
stage's marginal cost is measured in situ (standalone stage timing
over-counts HBM boundaries that XLA fuses away inside the pipeline).

Usage: python benchmarks/profile_ablate.py [n_poses]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))


def main():
    from perception_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench_scene import build_bench_problem

    from perception_tpu.pipeline.scorer import score_pose_batch

    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    env, cands, args, cfg0 = build_bench_problem(n_poses=n_poses)
    cfg0 = dataclasses.replace(cfg0, icp_max_iterations=20)
    (btv, btc, bvl, poses, mids, labels, totals, proj, scene) = args

    def timed(cfg, inner=10, reps=3):
        def step(p, eps):
            out = score_pose_batch(btv, btc, bvl, p + eps, mids, labels,
                                   totals, proj, scene, cfg,
                                   bank_backface=env._render_bank[3],
                                   bank_icp_samples=env._bank_icp_samples,
                                   bank_icp_normals=env._bank_icp_normals)
            return out.rendered_cost.sum()

        @jax.jit
        def repeated(iters, p):
            def body(_, acc):
                return acc + step(p, acc * 1e-30)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        t0 = time.perf_counter()
        float(repeated(1, poses))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(repeated(inner, poses))
            best = min(best, (time.perf_counter() - t0) / inner)
        return best, compile_s

    variants = {
        "full(icp20)": cfg0,
        "icp_iters=1": dataclasses.replace(cfg0, icp_max_iterations=1),
        "icp_iters=10": dataclasses.replace(cfg0, icp_max_iterations=10),
        "no_icp": dataclasses.replace(cfg0, do_icp=False),
        "icp_src=model": dataclasses.replace(cfg0, icp_source="model"),
        "icp_crop=128": dataclasses.replace(cfg0, icp_crop_targets=128),
        "cost_crop=256": dataclasses.replace(cfg0, cost_crop_targets=256),
        "nn_every=2": dataclasses.replace(cfg0, icp_nn_every=2),
    }
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    if only:
        variants = {k: v for k, v in variants.items()
                    if k in only or k == "full(icp20)"}
    base = None
    for name, cfg in variants.items():
        t, c = timed(cfg)
        if base is None:
            base = t
        print(f"{name:16s} {t*1e3:8.3f} ms   {n_poses/t:9,.0f} poses/s   "
              f"(compile {c:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
