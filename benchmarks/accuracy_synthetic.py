"""Accuracy benchmark on generated scenes: the quality counterpart of
bench.py.

Generates random multi-object scenes with the dataset generator, runs the
full greedy pipeline (candidates from the YCB-style centroid-depth sweep x
fibonacci rotations), and reports ADD/ADD-S AUC — the self-contained stand-
in for the YCB-Video sweep when the dataset is not on disk.

Usage: python benchmarks/accuracy_synthetic.py [num_scenes] [--icp/--no-icp]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_env():
    from perception_tpu.core.config import CameraIntrinsics, EnvConfig, PerchConfig
    from perception_tpu.core.mesh import ModelBank, mesh_model_from_arrays
    from perception_tpu.pipeline.env import PerceptionEnv

    cam = CameraIntrinsics(fx=320.0, fy=320.0, cx=128.0, cy=96.0,
                           width=256, height=192)

    def box(w, d, h):
        x, y = w / 2, d / 2
        verts = np.array([
            [-x, -y, 0], [x, -y, 0], [x, y, 0], [-x, y, 0],
            [-x, -y, h], [x, -y, h], [x, y, h], [-x, y, h]])
        faces = np.array([
            [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
            [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
            [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
        return verts, faces

    def cylinder(r, h, n=24):
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        bottom = np.c_[r * np.cos(ang), r * np.sin(ang), np.zeros(n)]
        top = bottom + [0, 0, h]
        verts = np.vstack([bottom, top, [[0, 0, 0]], [[0, 0, h]]])
        faces = []
        for i in range(n):
            j = (i + 1) % n
            faces += [[i, j, n + i], [j, n + j, n + i],
                      [2 * n, j, i], [2 * n + 1, n + i, n + j]]
        return verts, np.asarray(faces)

    specs = [
        ("box_a", *box(0.10, 0.07, 0.12), (200, 60, 60)),
        ("box_b", *box(0.06, 0.06, 0.18), (60, 200, 60)),
        ("cyl_a", *cylinder(0.04, 0.14), (60, 60, 200)),
    ]
    models = []
    for name, v, f, rgb in specs:
        colors = np.tile(rgb, (len(v), 1))
        models.append(mesh_model_from_arrays(
            name, v, f, colors=colors, use_external_pose_list=True))
    bank = ModelBank.from_models(models, t_cap=128)
    perch = PerchConfig(gpu_stride=4, gpu_batch_size=1024,
                        sensor_resolution=0.015,
                        min_neighbor_points_for_valid_pose=8,
                        max_icp_iterations=30)
    env_cfg = EnvConfig(width=cam.width, height=cam.height,
                        max_points_per_pose=1024, max_observed_points=4096,
                        max_points_per_label=1024, max_labels=4,
                        icp_downsample=2,
                        kernel_backend=os.environ.get("PT_KERNEL_BACKEND",
                                                      "auto"),
                        roi_size=int(os.environ.get("PT_ROI_SIZE", "0")),
                        icp_render_scale=int(
                            os.environ.get("PT_ICP_RENDER_SCALE", "1")),
                        icp_crop_targets=int(
                            os.environ.get("PT_ICP_CROP_TARGETS", "256")),
                        icp_source=os.environ.get("PT_ICP_SOURCE", "render"),
                        icp_nn_every=int(
                            os.environ.get("PT_ICP_NN_EVERY", "1")))
    return PerceptionEnv(bank, cam, perch, env_cfg)


def main() -> None:
    num_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    do_icp = "--no-icp" not in sys.argv

    from perception_tpu.eval.dataset_gen import DatasetGenerator
    from perception_tpu.eval.metrics import add_err, adi_err, compute_pose_metrics
    from perception_tpu.eval.ycb import generate_candidates

    env = build_env()
    gen = DatasetGenerator(env, np.random.default_rng(42))
    errors = []
    runtimes = []
    for si in range(num_scenes):
        scene = gen.sample_scene(num_objects=2, x_range=(0.5, 0.8),
                                 y_range=(-0.2, 0.2), z_range=(-0.08, 0.08),
                                 yaw_only=False)
        env.set_observation_from_states(scene.states)
        names = [env.bank.models[s.id].name for s in scene.states]
        cand_rows = generate_candidates(
            (scene.depth.astype(np.float64) * 10), scene.label, names,
            env.camera, depth_factor=1000.0, num_samples=60,
            cam_to_world=env._input.cam_to_world)
        # Map candidate rows to object states via the 6-DoF generator.
        t0 = time.perf_counter()
        candidates = env.generate_successors_6dof(cand_rows)
        state, chosen = env.compute_greedy_poses(candidates, do_icp=do_icp)
        runtimes.append(time.perf_counter() - t0)
        for sel in state.object_states:
            gt = next(s for s in scene.states if s.id == sel.id)
            model = env.bank.models[sel.id]
            pts = model.sample_surface_points(1024)
            est = sel.pose.transform()
            gtm = gt.pose.transform()
            e_add = add_err(est[:3, :3], est[:3, 3], gtm[:3, :3], gtm[:3, 3], pts)
            e_adi = adi_err(est[:3, :3], est[:3, 3], gtm[:3, :3], gtm[:3, 3], pts)
            errors.append(min(e_add, e_adi) if model.symmetric else e_adi)
        # Undetected *visible* objects count as max error (a fully occluded
        # object has no mask pixels and cannot be detected — the YCB
        # protocol only evaluates visible instances).
        detected_ids = {s.id for s in state.object_states}
        visible = [s for s in scene.states
                   if (scene.label == s.segmentation_label_id).sum() >= 30]
        missed = sum(1 for s in visible if s.id not in detected_ids)
        errors.extend([1.0] * missed)
        print(f"scene {si}: detected {state.num_objects}/{len(visible)}"
              f" visible t={runtimes[-1]:.2f}s", flush=True)

    m = compute_pose_metrics(np.asarray(errors))
    print(json.dumps({
        "metric": "synthetic_adds_auc",
        "value": round(m["auc"], 2),
        "unit": "auc",
        "pose_count": m["pose_count"],
        "under_2cm_pct": round(m["pose_error_less_perc"], 1),
        "mean_error_m": round(m["mean_pose_error"], 4),
        "scene_seconds_mean": round(float(np.mean(runtimes)), 2),
        "icp": do_icp,
    }))


if __name__ == "__main__":
    main()
