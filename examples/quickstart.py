"""Self-contained quickstart: build a scene, recognise it, inspect outputs.

Runs everywhere (CPU or TPU) with no external data: three procedural models,
a generated observation, YCB-style candidate generation, the full greedy
pipeline with ICP refinement, and the reference-compatible output files.

    python examples/quickstart.py [output_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/perception_tpu_demo"
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks"))
    from accuracy_synthetic import build_env

    from perception_tpu.eval.dataset_gen import DatasetGenerator
    from perception_tpu.eval.metrics import adi_err
    from perception_tpu.eval.ycb import generate_candidates
    from perception_tpu.io.poses_file import write_output_poses, write_output_stats

    env = build_env()
    env.debug_dir = out_dir
    os.makedirs(out_dir, exist_ok=True)

    # 1. A random ground-truth scene, rendered into a labelled observation.
    gen = DatasetGenerator(env, np.random.default_rng(7))
    scene = gen.sample_scene(num_objects=2, x_range=(0.5, 0.8),
                             y_range=(-0.2, 0.2))
    gen.write_scene(scene, out_dir, name="observation")
    env.set_observation_from_states(scene.states)
    names = [env.bank.models[s.id].name for s in scene.states]
    print(f"scene: {names}")

    # 2. Candidates: per-object mask-centroid depth sweep x fibonacci
    #    rotations (the poses.txt contract).
    rows = generate_candidates(
        scene.depth.astype(np.float64) * 10, scene.label, names, env.camera,
        depth_factor=1000.0, num_samples=60,
        cam_to_world=env._input.cam_to_world)
    for name, r in rows.items():
        np.savetxt(os.path.join(out_dir, f"{name}_poses.txt"), r)
        print(f"  {name}: {len(r)} candidates")

    # 3. Full greedy recognition (render -> ICP -> re-render -> score ->
    #    per-model argmin).
    candidates = env.generate_successors_6dof(rows)
    state, chosen = env.compute_greedy_poses(candidates, do_icp=True)

    # 4. Outputs (reference contract) + accuracy vs the known ground truth.
    write_output_poses(
        os.path.join(out_dir, "output_poses.txt"),
        [(env.bank.models[s.id].name, s.pose,
          env.bank.models[s.id].preprocessing_transform)
         for s in state.object_states])
    write_output_stats(os.path.join(out_dir, "output_stats.txt"), env.stats)

    for sel in state.object_states:
        gt = next(s for s in scene.states if s.id == sel.id)
        model = env.bank.models[sel.id]
        pts = model.sample_surface_points(1024)
        est, gtm = sel.pose.transform(), gt.pose.transform()
        err = adi_err(est[:3, :3], est[:3, 3], gtm[:3, :3], gtm[:3, 3], pts)
        print(f"  {model.name}: ADD-S error {err * 100:.2f} cm")
    print(f"outputs in {out_dir}: output_poses.txt, output_stats.txt, "
          f"observation-*.png")


if __name__ == "__main__":
    main()
