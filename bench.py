"""Benchmark: candidate poses rendered + scored per second on one chip.

Runs the full unified pipeline (render -> cloud -> NN-ICP refine ->
transform+augment -> 1-NN -> cost) on a realistic rendered scene at YCB
image scale: 640x480 at stride 8, 3-object scene with genuine
occlusion/segment structure, candidates perturbed around ground truth so
refinement behaves as in real greedy recognition (benchmarks/bench_scene).
The HEADLINE metric is BENCH_MODELS=bumpy1024 (genuinely ~1024-triangle
models — the YCB decimation budget, i.e. the honest YCB-scale raster
workload); the historical blob config (~170-triangle hulls in a
1024-padded bank) is reported alongside as "blob" for continuity with
rounds 1-3. Set BENCH_MODELS explicitly to measure a single config.

Baseline (BASELINE.md): reference PERCH 2.0 scores ~5k candidate poses per
~1 s scene on an NVidia GPU; the north-star target is 100k poses/s on one
TPU v5e chip (the vs_baseline denominator).

Timing: the axon tunnel has ~27 ms host round-trip latency and a
non-blocking block_until_ready, so the pipeline iterates inside one jitted
fori_loop with forced data dependencies and a single scalar readback.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

BASELINE_POSES_PER_SEC = 100_000.0


def _cpu_ticks(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().split()
        return int(parts[13]) + int(parts[14])
    except Exception:
        return -1


def _run_child(models: str, attempts: int = 10) -> dict | None:
    """Run one measurement child (BENCH_MODELS=models), retrying tunnel
    flakes. Returns the parsed result dict, or None if every attempt hung.

    The axon tunnel intermittently (a) hangs a fresh process forever in
    device acquisition (signature: no output AND ~zero CPU accumulation)
    and (b) kills a process silently with no traceback (observed round 3).
    The driver invokes bench.py exactly once, so the retry loop must live
    here. A healthy-but-slow cold compile burns CPU continuously and is
    left alone for up to 20 minutes.
    """
    for attempt in range(attempts):
        env = dict(os.environ, PT_BENCH_CHILD="1", BENCH_MODELS=models)
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        os.set_blocking(proc.stdout.fileno(), False)
        buf = ""
        t0 = time.time()
        hang = False
        while proc.poll() is None:
            time.sleep(5)
            try:
                buf += proc.stdout.read() or ""
            except Exception:
                pass
            elapsed = time.time() - t0
            real = [ln for ln in buf.splitlines() if ln.strip()
                    and "WARNING" not in ln]
            if not real:
                ticks = _cpu_ticks(proc.pid)
                if elapsed > 150 and 0 <= ticks < 500:
                    hang = True       # acquisition hang: idle AND silent
                elif elapsed > 1200:
                    hang = True       # hard cap even if burning CPU
                if hang:
                    proc.kill()
                    proc.wait()
                    print(f"bench supervisor: attempt {attempt + 1} "
                          f"stalled ({elapsed:.0f}s, {ticks} ticks); "
                          "retrying", file=sys.stderr, flush=True)
                    break
        if hang:
            # Tunnel outages last minutes-to-hours but recover (rounds 3-4:
            # every fresh process hung in device acquisition for ~an hour,
            # then the pool came back). The driver invokes bench.py exactly
            # once per round, so patience lives here: back off harder the
            # longer the outage runs (20 s -> ~5 min, ~35 min total budget
            # across 10 attempts) instead of burning all attempts inside
            # the first few minutes of an outage.
            time.sleep(min(20 * (attempt + 1), 300))
            continue
        proc.wait()
        try:
            buf += proc.stdout.read() or ""
        except Exception:
            pass
        json_lines = [ln for ln in buf.splitlines()
                      if ln.startswith("{")]
        if json_lines:
            return json.loads(json_lines[-1])
        print(f"bench supervisor: attempt {attempt + 1} exited "
              f"rc={proc.returncode} without a result "
              f"(tail: {buf[-300:]!r}); retrying",
              file=sys.stderr, flush=True)
        time.sleep(20)
    return None


def supervised_main() -> None:
    """Measure the honest YCB-scale workload (bumpy1024: genuinely
    ~1024-triangle models, the YCB decimation budget) as the headline
    metric, plus the historical blob config (~170 live triangles) for
    round-over-round continuity. BENCH_MODELS overrides to a single
    explicit config (A/B use). Both children share the persistent XLA
    cache (identical tensor shapes), so the second config compiles warm.
    """
    explicit = os.environ.get("BENCH_MODELS")
    headline_models = explicit or "bumpy1024"
    headline = _run_child(headline_models)
    blob = None
    if not explicit:
        blob = _run_child("blob", attempts=2)

    if headline is not None:
        if blob is not None:
            headline["blob"] = {k: blob[k] for k in
                                ("value", "batch_seconds", "compile_seconds",
                                 "config") if k in blob}
        print(json.dumps(headline), flush=True)
        return
    # Headline exhausted: report the outage explicitly (a parseable record
    # beats a bare failure — the round-3 axon tunnel outage hung every
    # fresh process in device acquisition for hours). Include the blob
    # result if that config did get through.
    out = {
        "metric": "candidate_poses_rendered_scored_per_sec",
        "value": 0, "unit": "poses/s", "vs_baseline": 0.0,
        "error": f"TPU unavailable: all attempts at the {headline_models} "
                 "config hung in device acquisition (axon tunnel outage)"}
    if blob is not None:
        out["blob"] = {k: blob[k] for k in
                       ("value", "batch_seconds", "compile_seconds",
                        "config") if k in blob}
    print(json.dumps(out), flush=True)
    raise SystemExit(1)


def main() -> None:
    from perception_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    from bench_scene import build_bench_problem

    from perception_tpu.pipeline.scorer import score_pose_batch

    # 2048 measured fastest per pose (1024: -8%; 4096: equal — saturated).
    # The raster kernel sub-batches at 1024 internally (SMEM prefetch
    # budget); everything else batches monolithically.
    n_poses = int(os.environ.get("BENCH_POSES", 2048))
    env, cands, args, cfg = build_bench_problem(n_poses=n_poses)
    cfg = dataclasses.replace(
        cfg, icp_max_iterations=int(os.environ.get("BENCH_ICP_ITERS", "20")))
    (btv, btc, bvl, poses, mids, labels, totals, proj, scene) = args

    def step(p):
        out = score_pose_batch(btv, btc, bvl, p, mids, labels, totals,
                               proj, scene, cfg,
                               bank_backface=env._render_bank[3],
                               bank_icp_samples=env._bank_icp_samples,
                               bank_icp_normals=env._bank_icp_normals,
                               bank_tri_lab=env._render_bank_lab)
        return out.rendered_cost

    @jax.jit
    def repeated(p, iters):
        def body(_, carry):
            p_cur, acc = carry
            s = step(p_cur).sum()
            return (p_cur + (s * 1e-30).astype(p_cur.dtype), acc + s)

        return jax.lax.fori_loop(0, iters, body, (p, jnp.float32(0.0)))[1]

    # Split the first-call cost: trace+lower is pure client Python, the
    # backend compile is where the persistent cache can help, and the first
    # execution pays one-time input transfer over the axon tunnel. Knowing
    # which bucket dominates decides which lever to pull (cache vs program
    # size vs transfer).
    t0 = time.perf_counter()
    lowered = repeated.lower(poses, 1)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    float(compiled(poses, 1))
    t3 = time.perf_counter()
    compile_time = t3 - t0
    breakdown = {"trace_s": round(t1 - t0, 1),
                 "backend_compile_s": round(t2 - t1, 1),
                 "first_exec_s": round(t3 - t2, 1)}

    # Warm jit's dispatch cache: the AOT lower()/compile() above does NOT
    # populate it, so without this the first jitted call inside the timed
    # loop silently re-traces and re-loads the executable from the
    # persistent cache (r4 advisor finding). best=min keeps the number
    # honest either way; this keeps rep 1 from wasting tunnel wall-clock.
    float(repeated(poses, 1))

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
        "compile_breakdown": breakdown,
        "device": str(jax.devices()[0]),
        "config": (f"real-scene 640x480 s8 "
                   f"models={os.environ.get('BENCH_MODELS', 'blob')}:"
                   f"T{int(env._render_bank[2].sum(axis=1).max())}"
                   f"/{env._render_bank[2].shape[1]}cap "
                   f"lod={env.env.render_lod or 'full'} roi32 icp_fused "
                   f"g{os.environ.get('PT_ICP_GROUP', '8')} "
                   f"pallas_direct nn_every={cfg.icp_nn_every} "
                   f"icp_crop={cfg.icp_crop_targets}/{cfg.icp_crop_share} "
                   f"cost_crop={cfg.cost_crop_targets} "
                   f"src={cfg.icp_source} "
                   f"cost_cloud={cfg.cost_cloud}"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("PT_BENCH_CHILD") == "1":
        main()
    else:
        supervised_main()
