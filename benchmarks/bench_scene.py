"""Realistic benchmark problem: a rendered multi-object scene + candidate
perturbations at YCB image scale (640x480).

Model geometry (BENCH_MODELS env):
  blob       (default) ~160-185-triangle convex hulls, bank PADDED to
             t_cap=1024 — chunk culling skips most padding cheaply, so
             the raster's real work tracks the ~170 live triangles.
  bumpy1024  genuinely ~1024-triangle non-convex models (perturbed
             icospheres QEM-decimated to the cap) — matches the triangle
             budget a YCB mesh decimates to at load time, i.e. the
             honest YCB-scale raster workload.

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


def bumpy_blob(rng, radius=0.06, target=1024):
    """Non-convex ~target-triangle model: icosphere + smooth radial bumps,
    decimated to the cap through the configured decimator (PT_DECIMATE)."""
    from perception_tpu.core.mesh import decimate

    t = (1 + 5 ** 0.5) / 2
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
    for _ in range(4):                       # 20 -> 5120 faces
        mids, verts, out = {}, list(v), []

        def mid(a, b):
            k = (min(a, b), max(a, b))
            if k not in mids:
                mids[k] = len(verts)
                verts.append((verts[a] + verts[b]) / 2)
            return mids[k]

        for (a, b, c) in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            out += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v, f = np.asarray(verts, float), np.asarray(out)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    # Smooth low-order radial field: non-convex lobes, still star-shaped
    # (no self-intersections).
    freq = rng.uniform(1.5, 3.5, (3, 3))
    phase = rng.uniform(0, 2 * np.pi, 3)
    r = 1.0 + 0.22 * np.sum(
        [np.sin(v @ freq[i] + phase[i]) for i in range(3)], axis=0) / 3
    v = v * (radius * r[:, None])
    dv, df, _ = decimate(v, f, None, target)
    return dv, df


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
    import os as _os

    models = []
    model_kind = _os.environ.get("BENCH_MODELS", "blob")
    for i in range(4):
        if model_kind == "bumpy1024":
            v, f = bumpy_blob(rng, radius=0.05 + 0.015 * i, target=t_cap)
        else:
            v, f = convex_blob(rng, radius=0.05 + 0.015 * i)
        colors = rng.uniform(40, 220, (len(v), 3))
        models.append(mesh_model_from_arrays(
            f"blob{i}", v, f, colors=colors, use_external_pose_list=True))
    bank = ModelBank.from_models(models, t_cap=t_cap)

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
    if _os.environ.get("PT_ICP_ASSOC_TRIGGER"):
        overrides["icp_assoc_trigger"] = float(
            _os.environ["PT_ICP_ASSOC_TRIGGER"])
    if _os.environ.get("PT_ICP_CROP_MODE"):
        overrides["icp_crop_mode"] = _os.environ["PT_ICP_CROP_MODE"]
    if _os.environ.get("PT_ICP_CROP_SHARE"):
        overrides["icp_crop_share"] = _os.environ["PT_ICP_CROP_SHARE"]
    if _os.environ.get("PT_ICP_GATHER"):
        overrides["icp_gather"] = _os.environ["PT_ICP_GATHER"]
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
