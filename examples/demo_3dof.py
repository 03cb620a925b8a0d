"""3-DoF tabletop demo: the reference `demo.cpp` scenario, self-contained.

The reference demo loads a captured kitchen point cloud, sets a search
box over the table, and runs LocalizeObjects with MHA* over the (x, y,
yaw) grid. Here the observation is GENERATED (a synthetic scene; for the
reference's real captured demo frame see demo_reference_scene.py):
objects are dropped upright on a virtual table, the observed cloud is
built from the rendered depth, and the same 3-DoF grid search
(generate_successors -> tree search with lazy evaluation, optional
histogram/voxel pruning) recovers their poses.

    python examples/demo_3dof.py [output_dir] [--prune]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else "/tmp/perception_tpu_demo_3dof"
    prune = "--prune" in sys.argv
    os.makedirs(out_dir, exist_ok=True)

    import dataclasses

    from perception_tpu.core.config import (
        CameraIntrinsics,
        EnvConfig,
        PerchConfig,
    )
    from perception_tpu.core.mesh import ModelBank, mesh_model_from_arrays
    from perception_tpu.core.pose import CAM_TO_BODY, ContPose
    from perception_tpu.core.state import ObjectState
    from perception_tpu.pipeline.env import PerceptionEnv, RecognitionInput
    from perception_tpu.pipeline.search import TreeSearch
    from tests.test_core import make_box

    cam = CameraIntrinsics(fx=320.0, fy=320.0, cx=128.0, cy=96.0,
                           width=256, height=192)
    v1, f1 = make_box(0.10, 0.07, 0.14)     # "tide"-like carton
    v2, f2 = make_box(0.06, 0.06, 0.20)     # "tilex"-like bottle
    models = [
        mesh_model_from_arrays("carton", v1, f1,
                               colors=np.tile([220.0, 120, 40], (len(v1), 1))),
        mesh_model_from_arrays("bottle", v2, f2,
                               colors=np.tile([60.0, 120, 220], (len(v2), 1))),
    ]
    bank = ModelBank.from_models(models, t_cap=16)
    env = PerceptionEnv(
        bank, cam,
        PerchConfig(gpu_stride=2, gpu_batch_size=256,
                    sensor_resolution=0.015,
                    min_neighbor_points_for_valid_pose=8),
        EnvConfig(width=cam.width, height=cam.height, res=0.04,
                  theta_res=np.pi / 8, max_labels=4,
                  max_points_per_label=2048, max_observed_points=8192,
                  histogram_pruning=False, voxel_pruning=prune))

    # Ground truth: two objects upright on the table (3-DoF poses).
    gt = [
        ObjectState(id=0, symmetric=False,
                    pose=ContPose.from_euler(0.55, 0.10, 0.0, 0, 0, 0.4),
                    segmentation_label_id=1),
        ObjectState(id=1, symmetric=False,
                    pose=ContPose.from_euler(0.62, -0.12, 0.0, 0, 0, 1.1),
                    segmentation_label_id=2),
    ]
    depth, color, label = env.render_composite(gt)

    # demo.cpp RecognitionInput: search bounds + table height, 3-DoF mode.
    rin = RecognitionInput(
        depth_image=depth.astype(np.float64),
        color_image=color,
        depth_factor=100.0,
        cam_to_world=CAM_TO_BODY.copy(),
        segmented_object_names=["carton", "bottle"],
        x_min=0.40, x_max=0.75, y_min=-0.25, y_max=0.25,
        table_height=0.0,
        use_external_pose_list=False)
    env.set_input(rin)

    t0 = time.perf_counter()
    search = TreeSearch(env, beam_width=2, lazy_k=8)
    state = search.plan()
    dt = time.perf_counter() - t0

    print(f"planned in {dt:.1f}s, {search.stats.expands} expansions, "
          f"{search.stats.scenes_rendered} cached renders")
    worst = 0.0
    for sel in state.object_states:
        true = gt[sel.id]
        err = float(np.hypot(sel.pose.x - true.pose.x,
                             sel.pose.y - true.pose.y))
        worst = max(worst, err)
        print(f"  {bank.models[sel.id].name}: ({sel.pose.x:.3f}, "
              f"{sel.pose.y:.3f}, yaw {sel.pose.yaw:.2f}) "
              f"vs gt ({true.pose.x:.3f}, {true.pose.y:.3f}, "
              f"yaw {true.pose.yaw:.2f}) -> {err * 100:.1f} cm off")
    assert len(state.object_states) == 2, "demo failed to place both objects"
    assert worst < 0.05, f"demo pose error too large: {worst}"
    print("demo OK")


if __name__ == "__main__":
    main()
