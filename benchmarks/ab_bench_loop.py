"""A/B: bench.py's timing wrapper — on-device fori_loop vs host-chained
async dispatch.

bench.py wraps the scorer in a jitted fori_loop to hide the axon tunnel's
~27 ms host round-trip: one dispatch, one scalar readback. That wrapper
turned out to cost 90-330 s of backend compile on the tunnel, while the
UNWRAPPED scorer compiles in ~5 s (compile_profile.py r4: full=5.31 s).
If dispatching the same compiled program N times back-to-back (each call's
poses output feeding the next call's input, block once at the end)
pipelines on the device, the chained variant measures the same poses/s at
1/20th the cold-start cost and bench.py can drop the loop.

Prints one JSON line with compile seconds and poses/s for both variants.
Run on the real chip; serialize with other TPU work.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time


def main() -> None:
    os.environ.setdefault("PT_COMPILATION_CACHE", "0")   # true cold numbers
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)
    import jax
    import jax.numpy as jnp
    from bench_scene import build_bench_problem

    from perception_tpu.pipeline.scorer import score_pose_batch

    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    # Early liveness line: the chained variant's backend compile runs
    # server-side over the tunnel (client idle), which looks exactly like
    # an acquisition hang to run_tpu.sh's idle+silent heuristic. Printing
    # after device acquisition tells the watchdog the process is healthy.
    print(f"devices: {jax.devices()}", flush=True)
    env, cands, args, cfg = build_bench_problem(n_poses=n_poses)
    cfg = dataclasses.replace(cfg, icp_max_iterations=20)
    (btv, btc, bvl, poses, mids, labels, totals, proj, scene) = args
    kw = dict(bank_backface=env._render_bank[3],
              bank_icp_samples=env._bank_icp_samples,
              bank_icp_normals=env._bank_icp_normals,
              bank_tri_lab=env._render_bank_lab)

    def step(p):
        out = score_pose_batch(btv, btc, bvl, p, mids, labels, totals,
                               proj, scene, cfg, **kw)
        return out.rendered_cost

    out = {"n_poses": n_poses, "device": str(jax.devices()[0])}
    inner = 10

    # Variant A: host-chained async dispatch. Each call returns the next
    # poses input (forced data dependency) plus the cost sum; the host
    # loop issues `inner` dispatches of one compiled program and blocks
    # once on the final scalar.
    @jax.jit
    def chained(p):
        s = step(p).sum()
        return p + (s * 1e-30).astype(p.dtype), s

    t0 = time.perf_counter()
    lowered = chained.lower(poses)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    p_cur, s = compiled(poses)
    float(s)
    t3 = time.perf_counter()
    out["chained_compile"] = {"trace_s": round(t1 - t0, 2),
                              "backend_s": round(t2 - t1, 2),
                              "first_exec_s": round(t3 - t2, 2)}
    best = float("inf")
    for _ in range(3):
        p_cur = poses
        t0 = time.perf_counter()
        for _ in range(inner):
            p_cur, s = compiled(p_cur)
        float(s)
        best = min(best, (time.perf_counter() - t0) / inner)
    out["chained_poses_per_sec"] = round(n_poses / best, 1)
    out["chained_batch_seconds"] = round(best, 4)
    print(json.dumps({k: out[k] for k in out if k.startswith("chained")}),
          flush=True)

    # Variant B: the current bench.py fori_loop wrapper.
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
    compiled_r = lowered.compile()
    t2 = time.perf_counter()
    float(compiled_r(poses, 1))
    t3 = time.perf_counter()
    out["fori_compile"] = {"trace_s": round(t1 - t0, 2),
                           "backend_s": round(t2 - t1, 2),
                           "first_exec_s": round(t3 - t2, 2)}
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(repeated(poses, inner))
        best = min(best, (time.perf_counter() - t0) / inner)
    out["fori_poses_per_sec"] = round(n_poses / best, 1)
    out["fori_batch_seconds"] = round(best, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
