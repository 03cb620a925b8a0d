"""RGBD cost (type 1): same-shape objects disambiguated by colour — the
reference's "sameshape" 3-DoF scenario (run_sameshape_gpu, cost_type 1)."""

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
def sameshape_env():
    verts, faces = make_box(w=0.08, d=0.08, h=0.10)
    red = np.tile([220.0, 30, 30], (len(verts), 1))
    blue = np.tile([30.0, 30, 220], (len(verts), 1))
    m_red = mesh_model_from_arrays("red_cube", verts, faces, colors=red)
    m_blue = mesh_model_from_arrays("blue_cube", verts, faces, colors=blue)
    bank = ModelBank.from_models([m_red, m_blue], t_cap=16)
    # use_cylinder_observed: in a multi-object 3-DoF scene, scene-total
    # observed counts would give every single-object candidate ~50% observed
    # cost and the |target-source|<30 filter would reject everything — the
    # reference's cylinder counts scope the observed cost to each pose.
    perch = PerchConfig(gpu_stride=2, gpu_batch_size=64,
                        sensor_resolution=0.02, use_color_cost=True,
                        color_distance_threshold=15.0,
                        use_cylinder_observed=True,
                        min_neighbor_points_for_valid_pose=5)
    env_cfg = EnvConfig(width=CAM.width, height=CAM.height,
                        max_points_per_pose=512, max_observed_points=4096,
                        max_points_per_label=2048, max_labels=2,
                        kernel_backend="xla")  # force composed path: colour
                                               # cost needs per-point RGB
    env = PerceptionEnv(bank, CAM, perch, env_cfg)

    # Red cube left, blue cube right, same table.
    gt_red = ObjectState(id=0, symmetric=False,
                         pose=ContPose.from_euler(0.6, 0.12, -0.08, 0, 0, 0.3),
                         segmentation_label_id=1)
    gt_blue = ObjectState(id=1, symmetric=False,
                          pose=ContPose.from_euler(0.6, -0.12, -0.08, 0, 0, 0.1),
                          segmentation_label_id=1)
    env._input = RecognitionInput(
        depth_image=np.zeros((CAM.height, CAM.width)),
        cam_to_world=CAM_TO_BODY.copy(), use_external_pose_list=False)
    depth, color, _ = env.render_composite([gt_red, gt_blue])
    rin = RecognitionInput(
        depth_image=depth.astype(np.float64),
        color_image=color.astype(np.float32),
        depth_factor=100.0,
        cam_to_world=CAM_TO_BODY.copy(),
        use_external_pose_list=False,
        x_min=0.4, x_max=0.8, y_min=-0.3, y_max=0.3, table_height=-0.08)
    env.set_input(rin)
    return env, gt_red, gt_blue


def test_rgbd_cost_type(sameshape_env):
    env, *_ = sameshape_env
    from perception_tpu.ops.cost import COST_TYPE_3DOF_RGBD

    assert env._scorer_config(do_icp=False).cost_type == COST_TYPE_3DOF_RGBD


def test_color_disambiguates_sameshape(sameshape_env):
    env, gt_red, gt_blue = sameshape_env
    # Candidates: each model at BOTH positions (geometry identical).
    swap_red = ObjectState(id=0, symmetric=False, pose=gt_blue.pose,
                           segmentation_label_id=1)
    swap_blue = ObjectState(id=1, symmetric=False, pose=gt_red.pose,
                            segmentation_label_id=1)
    scored = env.score_object_states(
        [gt_red, swap_red, gt_blue, swap_blue], do_icp=False)
    right_red, wrong_red, right_blue, wrong_blue = scored
    # The correct-colour placement must beat the swapped one for each model.
    assert right_red.target_cost < wrong_red.target_cost, (
        right_red, wrong_red)
    assert right_blue.target_cost < wrong_blue.target_cost
    # And depth-only scoring would NOT distinguish them: verify by scoring
    # with colour off.
    import dataclasses

    saved = env.perch
    env.perch = dataclasses.replace(env.perch, use_color_cost=False)
    try:
        s2 = env.score_object_states(
            [gt_red, swap_red, gt_blue, swap_blue], do_icp=False)
        assert abs(s2[0].target_cost - s2[1].target_cost) <= 5
    finally:
        env.perch = saved


def test_greedy_picks_correct_colors(sameshape_env):
    env, gt_red, gt_blue = sameshape_env
    rng = np.random.default_rng(3)
    cands = []
    for mid in (0, 1):
        for base in (gt_red, gt_blue):
            for _ in range(3):
                j = rng.normal(0, 0.01, 2)
                p = ContPose.from_euler(base.pose.x + j[0], base.pose.y + j[1],
                                        base.pose.z, 0, 0, base.pose.yaw)
                cands.append(ObjectState(id=mid, symmetric=False, pose=p,
                                         segmentation_label_id=1))
    state, chosen = env.compute_greedy_poses(cands, do_icp=False)
    assert state.num_objects == 2
    for sel in state.object_states:
        target = gt_red if sel.id == 0 else gt_blue
        err = np.hypot(sel.pose.x - target.pose.x, sel.pose.y - target.pose.y)
        assert err < 0.05, f"model {sel.id} placed at wrong cube: {err}"
