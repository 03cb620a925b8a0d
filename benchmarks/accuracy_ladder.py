"""Accuracy ladder: the knob-by-knob AUC table the perf claims cite.

Runs benchmarks/accuracy_synthetic.py in subprocesses (fresh backend per
rung, identical scene seeds) for:

  * bounds:  gtinit (upper), noicp (lower), default;
  * perf knobs whose speed gain must be priced in AUC: icp_source=model,
    icp_crop=128, nn_every=2;
  * accuracy counter-measures: color cost (CIEDE2000 gate in 6-DoF).

Writes accuracy_ladder.json and prints a markdown table.

Usage: python benchmarks/accuracy_ladder.py [num_scenes] [--rungs=a,b,c]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(HERE, "accuracy_synthetic.py")

RUNGS: dict[str, tuple[list[str], dict[str, str]]] = {
    # name -> (extra argv, extra env)
    "default": ([], {}),
    "gtinit": (["--mode=gtinit"], {}),
    "noicp": (["--mode=noicp"], {}),
    "color_cost": ([], {"PT_COLOR_COST": "1"}),
    "icp_src_model": ([], {"PT_ICP_SOURCE": "model"}),
    "icp_crop_128": ([], {"PT_ICP_CROP_TARGETS": "128"}),
    # Round 5: one crop per SEGMENT (centred on the segment's valid
    # centroid) instead of per pose — collapses the crop-selection block
    # from N poses to L labels (scorer.py icp_crop_share).
    "icp_crop_share_label": ([], {"PT_ICP_CROP_SHARE": "label"}),
    "nn_every_2": ([], {"PT_ICP_NN_EVERY": "2"}),
    "no_early_exit": ([], {"PT_ICP_NO_EARLY_EXIT": "1"}),
    "gicp": ([], {"PT_ICP_MODE": "gicp"}),
    "gicp_eps1e3": ([], {"PT_ICP_MODE": "gicp",
                         "PT_GICP_EPSILON": "0.001"}),
    "aug128": ([], {"PT_COST_AUG_SAMPLES": "128"}),
    # GICP D2D weighting inside the fused pallas kernel (pallas_icp.py):
    # the accuracy of icp_mode=gicp at the speed of the fused path.
    "fused_d2d": ([], {"PT_ICP_MODE": "fused_d2d"}),
    "fused_d2d_nn1": ([], {"PT_ICP_MODE": "fused_d2d",
                           "PT_ICP_NN_EVERY": "1"}),
    # Round 4: the FULL 3x3 covariance GICP GN inside the fused kernel
    # (pallas_icp exact mode — icp_gicp_batch semantics at fused speed).
    "fused_d2d_exact": ([], {"PT_ICP_MODE": "fused_d2d_exact"}),
    # The round-2 significant accuracy levers, re-testable under --noise
    # (VERDICT r2: every significant claim must survive the sensor model).
    "samples_240": (["--samples=240"], {}),
    "refine_rounds_2": ([], {"PT_REFINE_ROUNDS": "2"}),
    "capstone_color_refine2_s240": (["--samples=240"],
                                    {"PT_COLOR_COST": "1",
                                     "PT_REFINE_ROUNDS": "2"}),
    "icp_nn": ([], {"PT_ICP_MODE": "nn"}),
    "cost_crop_256": ([], {"PT_COST_CROP_TARGETS": "256"}),
    # render_lod=256 became the shipped default in round 3, so pricing it
    # now needs an explicit lod0 (full-resolution bank) baseline rung.
    "render_lod_0": ([], {"PT_RENDER_LOD": "0"}),
    "render_lod_512": ([], {"PT_RENDER_LOD": "512"}),
    "render_lod_256": ([], {"PT_RENDER_LOD": "256"}),
    "render_lod_128": ([], {"PT_RENDER_LOD": "128"}),
    "render_lod_64": ([], {"PT_RENDER_LOD": "64"}),
    "cost_cloud_transform": ([], {"PT_COST_CLOUD": "transform"}),
    # transform is the shipped default since round 3; this rung A/Bs the
    # reference-semantics re-render cost cloud against it.
    "cost_cloud_render": ([], {"PT_COST_CLOUD": "render"}),
    "combo_lod128_transform": ([], {"PT_RENDER_LOD": "128",
                                    "PT_COST_CLOUD": "transform"}),
    "model_src_crop128": ([], {"PT_ICP_SOURCE": "model",
                               "PT_ICP_CROP_TARGETS": "128"}),
    # Proposed default combos (round-2 perf push).
    "combo_model_cost256": ([], {"PT_ICP_SOURCE": "model",
                                 "PT_COST_CROP_TARGETS": "256"}),
    "combo_model_cost256_nn2": ([], {"PT_ICP_SOURCE": "model",
                                     "PT_COST_CROP_TARGETS": "256",
                                     "PT_ICP_NN_EVERY": "2"}),
    # Decimator/render-LOD pricing on the HIGH-RES zoo (the base zoo is
    # 20-504 tris, so LOD >= 512 is vacuous there). QEM vs clustering at
    # the same budget, and the LOD ladder under QEM.
    "hires_qem": (["--models=zoo_hires"], {"PT_DECIMATE": "qem"}),
    "hires_cluster": (["--models=zoo_hires"], {"PT_DECIMATE": "cluster"}),
    "hires_qem_lod512": (["--models=zoo_hires"],
                         {"PT_DECIMATE": "qem", "PT_RENDER_LOD": "512"}),
    "hires_qem_lod256": (["--models=zoo_hires"],
                         {"PT_DECIMATE": "qem", "PT_RENDER_LOD": "256"}),
    "hires_qem_lod128": (["--models=zoo_hires"],
                         {"PT_DECIMATE": "qem", "PT_RENDER_LOD": "128"}),
    "hires_cluster_lod512": (["--models=zoo_hires"],
                             {"PT_DECIMATE": "cluster",
                              "PT_RENDER_LOD": "512"}),
    # Full-resolution-bank baselines (render_lod defaults to 256 since the
    # round-3 flip, so the unsuffixed hires rungs no longer measure lod0).
    "hires_qem_lod0": (["--models=zoo_hires"],
                       {"PT_DECIMATE": "qem", "PT_RENDER_LOD": "0"}),
    "hires_cluster_lod0": (["--models=zoo_hires"],
                           {"PT_DECIMATE": "cluster", "PT_RENDER_LOD": "0"}),
    # Round 4: ICP iteration-bound pricing. The LOD-256 default flip moved
    # the bench bottleneck from raster to ICP (profile_ablate: no_icp 16.3ms
    # vs full-icp20 34.0ms per 2048-pose batch), so the iteration bound is
    # now the cheapest throughput lever — IF the AUC survives. The fused
    # kernel's per-pose early exit (pallas_icp.py step-epsilon + stagnation
    # streak) should make the bound mostly slack at convergence.
    "icp_iters_20": ([], {"PT_ICP_ITERS": "20"}),
    "icp_iters_12": ([], {"PT_ICP_ITERS": "12"}),
    "icp_iters_8": ([], {"PT_ICP_ITERS": "8"}),
    # Round 5: the valid-preferring interleaved crop selection
    # (ops/icp.py crop_targets mode="spread"). The single-frame probe
    # (benchmarks/crop_probe.py) later showed spread@128 diverges the
    # same 581 mm as near@128 — the runaway is the pp_weight=0
    # point-to-plane degeneracy, not selection density — so these rungs
    # price the shipped OPT-IN knob, not a default-flip candidate.
    "crop128_spread": ([], {"PT_ICP_CROP_TARGETS": "128",
                            "PT_ICP_CROP_MODE": "spread"}),
    "crop256_spread": ([], {"PT_ICP_CROP_MODE": "spread"}),
    # Round 5: the ICP stage owns the throughput gap (no_icp 125k vs full
    # 70.6k poses/s) and the NN re-association sweep is its largest
    # per-iteration block — the r5 micro (benchmarks/icp_micro.py on-chip)
    # prices nn_every 2 -> 4 at -5.9 ms/2048-pose batch (16.7 -> 10.7 ms
    # kernel). If paired-neutral vs the nn_every=2 default, 4 ships.
    "nn_every_4": ([], {"PT_ICP_NN_EVERY": "4"}),
    "nn_every_3": ([], {"PT_ICP_NN_EVERY": "3"}),
    # Round 5, VERDICT lever (b): amortise the exact-covariance refiner's
    # per-iteration re-association (the named cost of its 2x scene
    # latency). Evidence target is @kinect — that is the harness the
    # exact mode wins on and noisy_profile() is recommended for.
    "d2dexact_nn2": ([], {"PT_ICP_MODE": "fused_d2d_exact",
                          "PT_EXACT_NN_EVERY": "2"}),
    # Round 5, VERDICT lever (c): the symmetric D2D plane term with
    # icp_source=model, where exact bank normals are free (the r4
    # negative paid 6x for k-NN source normals on the rendered cloud).
    "d2d_model": ([], {"PT_ICP_MODE": "fused_d2d",
                       "PT_ICP_SOURCE": "model"}),
    "d2d_model_sym": ([], {"PT_ICP_MODE": "fused_d2d",
                           "PT_ICP_SOURCE": "model", "PT_D2D_SYM": "1"}),
    # Round 4: the capstone re-based on the exact-covariance fused D2D
    # refiner, which paired-beats the default refiner by +3.21 [1.06, 5.34]
    # @kinect (fused_d2d_exact@kinect vs default@kinect) — if the edge
    # composes with color+refine2+s240 this is the new accuracy headline.
    "capstone_d2dexact": (["--samples=240"],
                          {"PT_COLOR_COST": "1", "PT_REFINE_ROUNDS": "2",
                           "PT_ICP_MODE": "fused_d2d_exact"}),
}


def _merge_into_json(results: dict) -> dict:
    """Merge `results` into accuracy_ladder.json on disk; returns the
    merged table. Atomic replace so a kill mid-write can't truncate."""
    path = os.path.join(HERE, "accuracy_ladder.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged.update(results)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f, indent=2)
    os.replace(tmp, path)
    return merged


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    scenes = pos[0] if pos else "50"
    rungs = list(RUNGS)
    noise = ""
    timeout = 900
    for a in sys.argv[1:]:
        if a.startswith("--rungs="):
            rungs = a.split("=", 1)[1].split(",")
        if a.startswith("--timeout="):
            # Expensive rungs (capstone: 240 samples x refine-2 x colour)
            # legitimately exceed the default 900 s budget.
            timeout = int(a.split("=", 1)[1])
        if a.startswith("--noise="):
            # Run every selected rung under the given sensor model
            # (eval/sensor_model.py); results are keyed name@noise so the
            # noisy ladder coexists with the legacy noise-free one.
            noise = a.split("=", 1)[1]

    tag = ""
    for a in sys.argv[1:]:
        if a.startswith("--tag="):
            # Suffix result keys (e.g. --tag=@tpu records default@tpu)
            # so a backend re-run coexists with the original entry.
            tag = a.split("=", 1)[1]

    results = {}
    first = True
    for name in rungs:
        if not first:
            # The axon tunnel hangs a fresh process on device acquisition
            # when it starts right as the previous one releases the chip
            # (observed on most back-to-back rungs in round 3; each hang
            # costs a full 900 s timeout). A short cooldown avoids most.
            time.sleep(20)
        first = False
        argv, env_extra = RUNGS[name]
        env = dict(os.environ, **env_extra)
        cmd = [sys.executable, BENCH, scenes, *argv]
        if noise:
            cmd.append(f"--noise={noise}")
            name = f"{name}@{noise}"
        name = f"{name}{tag}"
        print(f"=== {name}: {' '.join(cmd)} "
              f"{' '.join(f'{k}={v}' for k, v in env_extra.items())}",
              flush=True)
        # The axon tunnel occasionally hangs a fresh process on device
        # acquisition right after the previous one exits; bound each rung
        # and retry (observed round 2 — see repo memory). A hung process
        # emits NOTHING (not even jax's platform warning, which a healthy
        # start prints within ~30 s), so zero output after 180 s is the
        # hang signature — kill fast instead of burning the full timeout.
        out = None
        for attempt in range(6):
            import tempfile

            log = tempfile.NamedTemporaryFile("w+", suffix=".runglog",
                                              delete=False)
            proc = subprocess.Popen(cmd, env=env, stdout=log, stderr=log,
                                    text=True)
            t_start = time.time()
            rc = None
            while True:
                try:
                    rc = proc.wait(timeout=10)
                    break
                except subprocess.TimeoutExpired:
                    elapsed = time.time() - t_start
                    if elapsed > 180 and os.path.getsize(log.name) == 0:
                        proc.kill()
                        proc.wait()
                        print("    stalled in device acquisition; "
                              "relaunching", flush=True)
                        break
                    if elapsed > 420:
                        # Second hang signature (observed round 3): the
                        # process emits jax's platform warning, then
                        # stalls forever acquiring the device — the log
                        # is non-empty but carries no real output. A
                        # healthy run prints its first scene line well
                        # inside 7 min (env build + cold compile).
                        with open(log.name) as lf:
                            body = [ln for ln in lf.read().splitlines()
                                    if ln.strip()
                                    and "WARNING" not in ln]
                        if not body:
                            proc.kill()
                            proc.wait()
                            print("    stalled post-warning (device "
                                  "acquisition); relaunching", flush=True)
                            break
                    if elapsed > timeout:
                        proc.kill()
                        proc.wait()
                        print(f"    attempt {attempt + 1} timed out; "
                              "retrying", flush=True)
                        break
            log.flush()
            with open(log.name) as f:
                captured = f.read()
            os.unlink(log.name)
            if rc is not None:
                # A transient tunnel failure (another process briefly held
                # the chip, or the tunnel dropped) exits non-zero quickly
                # with a backend-init signature. Retry those; accept any
                # other outcome (success, or a real in-framework error).
                transient = rc != 0 and any(
                    sig in captured for sig in (
                        "Unable to initialize backend",
                        "FAILED_PRECONDITION",
                        "UNAVAILABLE",
                    ))
                if not transient:
                    out = captured
                    break
                print(f"    attempt {attempt + 1}: transient backend "
                      "failure; retrying", flush=True)
            # Outages last minutes-to-hours but recover (rounds 3-4):
            # escalate the backoff instead of burning every attempt in
            # the outage's first few minutes.
            time.sleep(min(30 * (attempt + 1), 300))
        if out is None:
            results[name] = {"error": "timeout"}
            continue
        line = [ln for ln in out.splitlines()
                if ln.startswith("{")]
        if not line:
            print(out[-3000:])
            # Persist the failure signature: a rung that dies at full scale
            # but passes small-scale repros (round-3 samples_240@kinect)
            # is only root-causable from the captured tail.
            results[name] = {"error": rc, "log_tail": out[-1500:]}
            _merge_into_json(results)
            continue
        results[name] = json.loads(line[-1])
        r = results[name]
        print(f"    AUC {r['value']} CI {r['ci95']} "
              f"({r['scene_seconds_mean']}s/scene)", flush=True)
        # Persist after EVERY rung (merge-on-write): a multi-rung
        # invocation killed mid-run (round end, tunnel outage timeout)
        # must not lose the rungs that did complete.
        _merge_into_json(results)

    results = _merge_into_json(results)

    print("\n| rung | ADD-S AUC | 95% CI | <2cm % | s/scene |")
    print("|---|---|---|---|---|")
    for name, r in results.items():
        if "error" in r:
            print(f"| {name} | FAILED rc={r['error']} | | | |")
            continue
        print(f"| {name} | {r['value']} | [{r['ci95'][0]}, {r['ci95'][1]}] "
              f"| {r['under_2cm_pct']} | {r['scene_seconds_mean']} |")
    print(f"\nwrote {os.path.join(HERE, 'accuracy_ladder.json')}")


if __name__ == "__main__":
    main()
