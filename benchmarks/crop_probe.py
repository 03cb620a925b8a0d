"""Single-frame crop-selection probe: localisation error on the
camera-loop box scene (tests/test_pipeline.make_env) from a GT start,
per (icp_crop_targets, icp_crop_mode).

This is the scene behind the crop default's documented tail risk
(ops/icp.py crop_targets). Round-5 measurements (CPU composed path —
the fused kernel shares the pp_weight=0 objective):

    crop=256 near:   0.00 mm     crop=128 near:   580.64 mm
    crop=256 spread: 0.00 mm     crop=128 spread: 580.64 mm

i.e. the runaway is the pure point-to-plane tangential degeneracy on a
single close-up plane, not selection density — spread does not unlock
crop=128. Usage: python benchmarks/crop_probe.py  (CPU, ~3 min)
"""
import dataclasses, sys
import numpy as np
sys.path.insert(0, '/root/repo')
import jax; jax.config.update("jax_platforms", "cpu")
from tests.test_pipeline import make_env, gt_states

for crop, mode, share in [(256, "near", "pose"), (128, "near", "pose"),
                          (128, "spread", "pose"), (256, "spread", "pose"),
                          (256, "near", "label"), (128, "near", "label")]:
    env = make_env()
    env.env = dataclasses.replace(env.env, icp_crop_targets=crop,
                                  icp_crop_mode=mode,
                                  icp_crop_share=share)
    gt = gt_states()
    env.set_observation_from_states(gt)
    pose_lists = {"red_box": [[gt[0].pose.x, gt[0].pose.y, gt[0].pose.z,
                               0, 0, 0, 1]]}
    cands = env.generate_successors_6dof(pose_lists)
    state, _ = env.compute_greedy_poses(cands)
    errs = {}
    for obj in state.object_states:
        name = env.bank.models[obj.id].name
        g = gt[0] if name == "red_box" else gt[1]
        errs[name] = 1e3 * float(np.sqrt(
            (obj.pose.x - g.pose.x)**2 + (obj.pose.y - g.pose.y)**2
            + (obj.pose.z - g.pose.z)**2))
    print(f"crop={crop} mode={mode} share={share}: " +
          ", ".join(f"{k}={v:.2f}mm" for k, v in sorted(errs.items())),
          flush=True)
