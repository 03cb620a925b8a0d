"""Realistic benchmark problem: a rendered multi-object scene + candidate
perturbations, at YCB scale (640x480, ~1k-triangle models).

Shared by bench.py (throughput) so the measured pipeline behaves like real
greedy recognition: candidates overlap the observed object, ICP converges,
occlusion/segment structure is genuine.
"""

from __future__ import annotations

import numpy as np


def convex_blob(rng, radius=0.06, n_pts=600):
    from scipy.spatial import ConvexHull

    pts = rng.normal(size=(n_pts, 3))
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= radius * rng.uniform(0.7, 1.3, (n_pts, 1))
    hull = ConvexHull(pts)
    return pts, hull.simplices


def build_bench_problem(n_poses=512, t_cap=1024, width=640, height=480,
                        stride=8, seed=0):
    """Returns (env, candidate ObjectStates, scorer args tuple, cfg)."""
    import jax
    import jax.numpy as jnp

    from perception_tpu.core.config import CameraIntrinsics, EnvConfig, PerchConfig
    from perception_tpu.core.mesh import ModelBank, mesh_model_from_arrays
    from perception_tpu.core.pose import ContPose, euler_xyz_to_matrix, matrix_to_quat
    from perception_tpu.core.state import ObjectState
    from perception_tpu.pipeline.env import PerceptionEnv

    rng = np.random.default_rng(seed)
    cam = CameraIntrinsics(fx=1066.778, fy=1067.487, cx=312.9869,
                           cy=241.3109, width=width, height=height)
    models = []
    for i in range(4):
        v, f = convex_blob(rng, radius=0.05 + 0.015 * i)
        colors = rng.uniform(40, 220, (len(v), 3))
        models.append(mesh_model_from_arrays(
            f"blob{i}", v, f, colors=colors, use_external_pose_list=True))
    bank = ModelBank.from_models(models, t_cap=t_cap)
    import os as _os

    perch = PerchConfig(gpu_stride=stride, gpu_batch_size=n_poses,
                        sensor_resolution=0.01,
                        min_neighbor_points_for_valid_pose=8,
                        use_color_cost=bool(int(
                            _os.environ.get("PT_USE_COLOR", "0"))))

    # Env-var knob overrides; ABSENT vars defer to the EnvConfig defaults
    # (the bench measures the shipped configuration).
    overrides: dict = {}
    for var, key in (("PT_ICP_RENDER_SCALE", "icp_render_scale"),
                     ("PT_ICP_CROP_TARGETS", "icp_crop_targets"),
                     ("PT_COST_CROP_TARGETS", "cost_crop_targets"),
                     ("PT_ICP_NN_EVERY", "icp_nn_every"),
                     ("PT_RENDER_LOD", "render_lod"),
                     ("PT_COST_AUG_SAMPLES", "cost_aug_samples")):
        if _os.environ.get(var):
            overrides[key] = int(_os.environ[var])
    if _os.environ.get("PT_ICP_SOURCE"):
        overrides["icp_source"] = _os.environ["PT_ICP_SOURCE"]
    if _os.environ.get("PT_COST_CLOUD"):
        overrides["cost_cloud"] = _os.environ["PT_COST_CLOUD"]
    if _os.environ.get("PT_ICP_MODE"):
        overrides["icp_mode"] = _os.environ["PT_ICP_MODE"]
    if _os.environ.get("PT_GICP_EPSILON"):
        overrides["icp_gicp_epsilon"] = float(_os.environ["PT_GICP_EPSILON"])
    overrides.setdefault("icp_mode", "auto")
    env_cfg = EnvConfig(width=width, height=height,
                        max_points_per_pose=1024, max_observed_points=8192,
                        max_points_per_label=1024, max_labels=4,
                        roi_size=32,
                        kernel_backend="auto", **overrides)
    env = PerceptionEnv(bank, cam, perch, env_cfg)

    gt = []
    for i in range(3):
        pose = ContPose.from_quat(
            0.55 + 0.12 * i, -0.25 + 0.22 * i, 0.02 * i,
            *matrix_to_quat(euler_xyz_to_matrix(*rng.uniform(-1.5, 1.5, 3))))
        gt.append(ObjectState(id=i, symmetric=False, pose=pose,
                              segmentation_label_id=i + 1))
    # PT_SENSOR=kinect degrades the benchmark observation with the sensor
    # model (eval/sensor_model.py) so perf can be measured on non-pristine
    # input; default stays noise-free for bit-comparability with the
    # round-1/2 numbers.
    sensor_name = _os.environ.get("PT_SENSOR", "")
    if sensor_name and sensor_name not in ("none", "off"):
        from perception_tpu.eval.sensor_model import by_name

        env.set_observation_from_states(
            gt, sensor=by_name(sensor_name),
            rng=np.random.default_rng((seed, 0xC0FFEE)))
    else:
        env.set_observation_from_states(gt)

    # Candidates: perturbations of GT across the three objects.
    cands = []
    for k in range(n_poses):
        base = gt[k % 3]
        jt = rng.normal(0, 0.02, 3)
        rot = (euler_xyz_to_matrix(*rng.normal(0, 0.15, 3))
               @ base.pose.rotation())
        pose = ContPose.from_quat(base.pose.x + jt[0], base.pose.y + jt[1],
                                  base.pose.z + jt[2], *matrix_to_quat(rot))
        cands.append(ObjectState(id=base.id, symmetric=False, pose=pose,
                                 segmentation_label_id=base.segmentation_label_id))

    cfg = env._scorer_config(do_icp=True)
    obs = env._observed
    seg_count = np.asarray(obs.seg_count, np.float32)
    poses = np.stack([env.pose_to_camera(s) for s in cands]).astype(np.float32)
    ids = np.asarray([s.id for s in cands], np.int32)
    labels = np.asarray([s.segmentation_label_id - 1 for s in cands], np.int32)
    totals = seg_count[labels]
    # Raster bank = env._render_bank so PT_RENDER_LOD reaches the measured
    # pipeline exactly as compute_greedy_poses would.
    rb_verts, rb_colors, rb_valid, _ = env._render_bank
    args = (rb_verts, rb_colors, rb_valid,
            jax.device_put(poses), jax.device_put(ids),
            jax.device_put(labels), jax.device_put(totals),
            env._proj, env._scene)
    return env, cands, args, cfg
