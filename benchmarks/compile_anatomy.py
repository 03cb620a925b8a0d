"""Where bench.py's cold-start seconds actually go.

bench.py reports trace ~1.5 s / backend ~22-24 s / first_exec ~7-8 s,
while compile_profile.py compiles the SAME scorer config in ~5.3 s —
a 4x gap with two suspects this script separates:

  * the fori_loop wrapper: bench compiles `repeated` (the scorer inside
    a 10-iteration lax.fori_loop); compile_profile compiles the bare
    scorer. XLA's loop passes on a huge body may be the 4x.
  * input transfer: first_exec includes the one-time host->device copy
    of the scene/bank over the ~27 ms-RTT axon tunnel; an explicit
    early device_put overlaps it with compilation and prices it.

Run on the real chip; serialize with other TPU work (repo memory).
Usage: python benchmarks/compile_anatomy.py [n_poses]
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
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)
    import jax
    import jax.numpy as jnp
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
    out = {}

    # -- input transfer, explicit and timed --------------------------------
    t0 = time.perf_counter()
    operands = jax.device_put(
        (btv, btc, bvl, poses, mids, labels, totals, proj, scene,
         tuple(kw.values())))
    jax.block_until_ready(operands)
    out["device_put_s"] = round(time.perf_counter() - t0, 2)
    (btv, btc, bvl, poses, mids, labels, totals, proj, scene, kwv) = operands
    kw = dict(zip(kw.keys(), kwv))

    def step(p):
        return score_pose_batch(btv, btc, bvl, p, mids, labels, totals,
                                proj, scene, cfg, **kw).rendered_cost

    # -- bare scorer: trace / backend / first exec (data resident) ---------
    t0 = time.perf_counter()
    lowered = jax.jit(step).lower(poses)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    jax.block_until_ready(compiled(poses))
    t3 = time.perf_counter()
    out["scorer"] = {"trace_s": round(t1 - t0, 2),
                     "backend_s": round(t2 - t1, 2),
                     "first_exec_s": round(t3 - t2, 2)}

    # -- fori_loop-wrapped (bench.py's `repeated`) --------------------------
    @jax.jit
    def repeated(p, iters):
        def body(_, carry):
            p_cur, acc = carry
            s = step(p_cur).sum()
            return (p_cur + (s * 1e-30).astype(p_cur.dtype), acc + s)

        return jax.lax.fori_loop(0, iters, body, (p, jnp.float32(0.0)))[1]

    t0 = time.perf_counter()
    lowered = repeated.lower(poses, 1)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    float(compiled(poses, 1))
    t3 = time.perf_counter()
    out["fori_loop"] = {"trace_s": round(t1 - t0, 2),
                        "backend_s": round(t2 - t1, 2),
                        "first_exec_s": round(t3 - t2, 2)}

    # -- async-chained dispatch alternative: does 10x scorer dispatch over
    # the tunnel cost more than the fori_loop? (decides whether bench can
    # drop the wrapper program entirely) --------------------------------
    jitted = jax.jit(step)
    jax.block_until_ready(jitted(poses))   # dispatch-cache warm
    for inner in (1, 10):
        t0 = time.perf_counter()
        p_cur = poses
        acc = None
        for _ in range(inner):
            s = jitted(p_cur).sum()
            p_cur = p_cur + (s * 1e-30).astype(p_cur.dtype)
            acc = s if acc is None else acc + s
        float(acc)
        out[f"chained_dispatch_{inner}_s"] = round(time.perf_counter() - t0,
                                                   4)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
