"""End-to-end pipeline tests on simulated ground-truth scenes.

Mirrors the reference's simulated-GT integration strategy
(SetObservation(object_ids, poses) fake-input path + sim_test.cpp): render a
known scene as the observation, score candidate poses, and require the
greedy pipeline to recover the ground truth.
"""

import numpy as np
import pytest

from perception_tpu.core.config import CameraIntrinsics, EnvConfig, PerchConfig
from perception_tpu.core.mesh import ModelBank, mesh_model_from_arrays
from perception_tpu.core.pose import CAM_TO_BODY, ContPose
from perception_tpu.core.state import ObjectState
from perception_tpu.pipeline.env import PerceptionEnv, RecognitionInput

from tests.test_core import make_box

CAM = CameraIntrinsics(fx=160.0, fy=160.0, cx=64.0, cy=48.0, width=128, height=96)


def make_env(models=None, **perch_kw):
    if models is None:
        v1, f1 = make_box(w=0.12, d=0.08, h=0.10)
        v2, f2 = make_box(w=0.06, d=0.06, h=0.16)
        c1 = np.tile([200.0, 40, 40], (len(v1), 1))
        c2 = np.tile([40.0, 200, 40], (len(v2), 1))
        models = [
            mesh_model_from_arrays("red_box", v1, f1, colors=c1,
                                   use_external_pose_list=True),
            mesh_model_from_arrays("green_box", v2, f2, colors=c2,
                                   use_external_pose_list=True),
        ]
    bank = ModelBank.from_models(models, t_cap=16)
    perch = PerchConfig(
        gpu_stride=2, gpu_batch_size=64, sensor_resolution=0.02,
        min_neighbor_points_for_valid_pose=5, **perch_kw)
    env_cfg = EnvConfig(
        width=CAM.width, height=CAM.height,
        max_points_per_pose=512, max_observed_points=4096,
        max_points_per_label=1024, max_labels=4, icp_downsample=2)
    return PerceptionEnv(bank, CAM, perch, env_cfg)


def gt_states():
    # Two objects in front of the camera (world frame = optical frame via
    # CAM_TO_BODY: world x forward).
    p1 = ContPose.from_quat(0.55, 0.10, -0.02, 0, 0, 0, 1)
    p2 = ContPose.from_quat(0.60, -0.12, -0.03, 0, 0, 0.2588, 0.9659)  # 30deg yaw
    return [
        ObjectState(id=0, symmetric=False, pose=p1, segmentation_label_id=1),
        ObjectState(id=1, symmetric=False, pose=p2, segmentation_label_id=2),
    ]


@pytest.fixture(scope="module")
def observed_env():
    env = make_env()
    env.set_observation_from_states(gt_states())
    return env


def test_fake_observation_structure(observed_env):
    obs = observed_env._observed
    counts = np.asarray(obs.seg_count)
    assert counts[0] > 20 and counts[1] > 20  # both objects visible
    assert counts[2] == 0
    assert int(obs.count) == counts.sum()


def test_gt_pose_scores_best(observed_env):
    env = observed_env
    gt = gt_states()
    # Candidates: GT + translated + rotated variants for object 0.
    cands = [gt[0]]
    for dx, dy in [(0.03, 0.0), (-0.03, 0.0), (0.0, 0.04), (0.05, 0.05)]:
        p = ContPose.from_quat(gt[0].pose.x + dx, gt[0].pose.y + dy,
                               gt[0].pose.z, 0, 0, 0, 1)
        cands.append(ObjectState(id=0, symmetric=False, pose=p,
                                 segmentation_label_id=1))
    scored = env.score_object_states(cands, do_icp=False)
    costs = [s.cost for s in scored]
    assert costs[0] >= 0
    assert costs[0] == min(costs), f"GT not best: {costs}"
    # GT pose should explain nearly everything.
    assert scored[0].target_cost <= 5
    assert scored[0].source_cost <= 5


def test_greedy_recovers_scene(observed_env):
    env = observed_env
    gt = gt_states()
    rng = np.random.default_rng(1)
    candidates = []
    for obj in gt:
        candidates.append(obj)
        for _ in range(10):
            jitter = rng.normal(0, 0.03, 3)
            p = ContPose.from_quat(
                obj.pose.x + jitter[0], obj.pose.y + jitter[1],
                obj.pose.z + jitter[2], *obj.pose.quaternion())
            candidates.append(ObjectState(
                id=obj.id, symmetric=False, pose=p,
                segmentation_label_id=obj.segmentation_label_id))
    state, chosen = env.compute_greedy_poses(candidates, do_icp=False)
    assert state.num_objects == 2
    for sel, true in zip(sorted(state.object_states, key=lambda s: s.id), gt):
        err = np.linalg.norm(
            np.array([sel.pose.x, sel.pose.y, sel.pose.z])
            - np.array([true.pose.x, true.pose.y, true.pose.z]))
        assert err < 0.02, f"object {sel.id} off by {err}"


def test_icp_pulls_offset_candidate_to_gt(observed_env):
    env = observed_env
    gt = gt_states()
    off = ContPose.from_quat(gt[0].pose.x + 0.015, gt[0].pose.y - 0.012,
                             gt[0].pose.z + 0.008, 0, 0, 0, 1)
    cand = ObjectState(id=0, symmetric=False, pose=off, segmentation_label_id=1)
    scored = env.score_object_states([cand], do_icp=True)
    adj = env.camera_to_world_pose(scored[0].adjusted_pose_cam, 0)
    err = np.linalg.norm(np.array([adj.x, adj.y, adj.z])
                         - np.array([gt[0].pose.x, gt[0].pose.y, gt[0].pose.z]))
    # Initial offset is ~2.1 cm; rendered depth is quantised to 1 cm
    # (reference int-cm semantics), so sub-cm is the convergence floor here.
    assert err < 0.01, f"ICP residual {err}"
    # Refined pose must score better than the unrefined offset pose.
    raw = env.score_object_states([cand], do_icp=False)
    assert scored[0].cost <= raw[0].cost


def test_icp_crop_share_label_matches_pose_when_segment_fits(monkeypatch):
    """icp_crop_share="label" (one crop per segment, centred on the
    segment centroid) must refine identically to the per-pose crop when
    every segment has <= k valid targets: both selections then keep ALL
    valid targets (invalid sort last), the kernel's NN argmin is
    selection-order independent for distinct minima, and the GN sums run
    over the unchanged source-point order. The opt-in per-frame
    precompute (PT_CROP_PRECOMP=1 -> ObservedScene.seg_pk_crop) is the
    same selection maths once more and must also match."""
    import dataclasses

    gt = gt_states()
    adj = {}
    for share in ("pose", "label", "label_precomp"):
        monkeypatch.setenv("PT_CROP_PRECOMP",
                           "1" if share == "label_precomp" else "0")
        env = make_env()
        env.env = dataclasses.replace(
            env.env, icp_crop_targets=512,
            icp_crop_share=share.split("_")[0])
        env.set_observation_from_states(gt)
        counts = np.asarray(env._observed.seg_count)
        assert counts.max() <= 512, f"scene outgrew the crop ({counts})"
        assert env._observed.seg_xyz.shape[1] > 512, "crop branch not hit"
        off = ContPose.from_quat(gt[0].pose.x + 0.015, gt[0].pose.y - 0.012,
                                 gt[0].pose.z + 0.008, 0, 0, 0, 1)
        cand = ObjectState(id=0, symmetric=False, pose=off,
                           segmentation_label_id=1)
        if share == "label_precomp":
            assert env._scene.seg_pk_crop is not None, "precompute not built"
        scored = env.score_object_states([cand], do_icp=True)
        a = env.camera_to_world_pose(scored[0].adjusted_pose_cam, 0)
        adj[share] = np.array([a.x, a.y, a.z, *a.quaternion()])
    np.testing.assert_allclose(adj["pose"], adj["label"], atol=1e-6)
    np.testing.assert_allclose(adj["label"], adj["label_precomp"],
                               atol=1e-6)


def test_icp_model_source_converges():
    """Render-free ICP source (icp_source=model): surface samples + facing
    mask refine an offset pose to the same sub-cm floor as the rendered
    source."""
    import dataclasses

    env = make_env()
    env.env = dataclasses.replace(env.env, icp_source="model")
    gt = gt_states()
    env.set_observation_from_states(gt)
    off = ContPose.from_quat(gt[0].pose.x + 0.015, gt[0].pose.y - 0.012,
                             gt[0].pose.z + 0.008, 0, 0, 0, 1)
    cand = ObjectState(id=0, symmetric=False, pose=off,
                       segmentation_label_id=1)
    scored = env.score_object_states([cand], do_icp=True)
    adj = env.camera_to_world_pose(scored[0].adjusted_pose_cam, 0)
    err = np.linalg.norm(np.array([adj.x, adj.y, adj.z])
                         - np.array([gt[0].pose.x, gt[0].pose.y, gt[0].pose.z]))
    assert err < 0.01, f"model-source ICP residual {err}"


def test_icp_fused_d2d_exact_matches_gicp_through_scorer():
    """icp_mode=fused_d2d_exact (full-covariance D2D in the fused kernel,
    per-iteration re-association) through the whole scorer path must land
    where the slow-path icp_mode=gicp lands — it exists to replace it at
    fused speed. On this clean quantised box scene all D2D modes stop
    ~1.6 cm out (the p2p mode does better noise-free; D2D's measured edge
    is under sensor noise), so the contract is gicp parity + a real
    improvement over the initial 2.1 cm offset, not an absolute floor."""
    import dataclasses

    gt = gt_states()
    off = ContPose.from_quat(gt[0].pose.x + 0.015, gt[0].pose.y - 0.012,
                             gt[0].pose.z + 0.008, 0, 0, 0, 1)
    cand = ObjectState(id=0, symmetric=False, pose=off,
                       segmentation_label_id=1)

    adj = {}
    for mode, backend in (("gicp", "xla"),
                          ("fused_d2d_exact", "pallas_interpret")):
        env = make_env()
        env.env = dataclasses.replace(env.env, icp_mode=mode,
                                      kernel_backend=backend)
        env.set_observation_from_states(gt)
        scored = env.score_object_states([cand], do_icp=True)
        a = env.camera_to_world_pose(scored[0].adjusted_pose_cam, 0)
        adj[mode] = np.array([a.x, a.y, a.z])

    gt_t = np.array([gt[0].pose.x, gt[0].pose.y, gt[0].pose.z])
    init_err = np.linalg.norm(np.array([off.x, off.y, off.z]) - gt_t)
    exact_err = np.linalg.norm(adj["fused_d2d_exact"] - gt_t)
    assert exact_err < 0.8 * init_err, (exact_err, init_err)
    np.testing.assert_allclose(adj["fused_d2d_exact"], adj["gicp"],
                               atol=5e-4)


def test_validity_pruning(observed_env):
    env = observed_env
    gt = gt_states()
    far = ObjectState(id=0, symmetric=False,
                      pose=ContPose.from_quat(2.0, 2.0, 0, 0, 0, 0, 1),
                      segmentation_label_id=1)
    assert env.is_valid_pose(gt[0])
    assert not env.is_valid_pose(far)
    sts = env.generate_successors_6dof({
        "red_box": np.array([
            [gt[0].pose.x, gt[0].pose.y, gt[0].pose.z, 0, 0, 0, 1],
            [2.0, 2.0, 0.0, 0, 0, 0, 1],
        ])})
    assert len(sts) == 1


def test_occluded_far_candidate_invalid(observed_env):
    # A candidate behind the observed scene gets its rendered pixels removed
    # (source occludes render with label mismatch) -> no points -> cost -1.
    env = observed_env
    gt = gt_states()
    behind = ContPose.from_quat(gt[0].pose.x + 1.2, gt[0].pose.y, gt[0].pose.z,
                                0, 0, 0, 1)
    cand = ObjectState(id=1, symmetric=False, pose=behind,
                       segmentation_label_id=1)
    scored = env.score_object_states([cand], do_icp=False)
    # Either removed entirely (cost -1) or hugely unexplained.
    assert scored[0].cost == -1 or scored[0].target_cost > 50


def test_pose_refinement_rounds_improve_rotation():
    """Local rotation-refinement rounds recover a rotation-perturbed
    winner (EnvConfig.pose_refinement_rounds; no reference analogue).

    The ICP budget is pinned small (8) so plain ICP stalls short of the
    optimum and the refinement mechanism has something to improve — at
    the shipped 20-iteration cap ICP alone fully recovers this scene and
    both costs tie (r5: the cap unification from 60 made the unpinned
    baseline converge)."""
    import dataclasses

    from perception_tpu.core.pose import euler_xyz_to_matrix, matrix_to_quat

    env = make_env(max_icp_iterations=8)
    env.set_observation_from_states(gt_states())
    gt = gt_states()
    pert = euler_xyz_to_matrix(0.18, -0.12, 0.15) @ gt[0].pose.rotation()
    bad = ObjectState(
        id=0, symmetric=False,
        pose=ContPose.from_quat(gt[0].pose.x, gt[0].pose.y, gt[0].pose.z,
                                *matrix_to_quat(pert)),
        segmentation_label_id=1)
    _, chosen0 = env.compute_greedy_poses([bad])
    env.env = dataclasses.replace(env.env, pose_refinement_rounds=2,
                                  pose_refinement_axes=8)
    _, chosen = env.compute_greedy_poses([bad])
    assert chosen and chosen0
    assert chosen[0].cost < chosen0[0].cost


def test_cost_crop_accounting_consistent():
    """Segments larger than cost_crop_targets must not inflate observed
    cost: the denominator is capped to the cropped subset (advisor r2
    high finding), so a perfect pose keeps |target-source| < 30 and a low
    observed cost even when the segment has many more points than the
    crop."""
    v1, f1 = make_box(w=0.16, d=0.12, h=0.12)
    c1 = np.tile([200.0, 40, 40], (len(v1), 1))
    models = [mesh_model_from_arrays("big_box", v1, f1, colors=c1,
                                     use_external_pose_list=True)]
    bank = ModelBank.from_models(models, t_cap=16)
    perch = PerchConfig(gpu_stride=1, gpu_batch_size=16,
                        sensor_resolution=0.02,
                        min_neighbor_points_for_valid_pose=5)
    env_cfg = EnvConfig(
        width=CAM.width, height=CAM.height,
        max_points_per_pose=4096, max_observed_points=8192,
        max_points_per_label=4096, max_labels=2,
        cost_crop_targets=64, icp_downsample=2)
    env = PerceptionEnv(bank, CAM, perch, env_cfg)
    pose = ContPose.from_quat(0.55, 0.0, 0.0, 0, 0, 0, 1)
    gt = [ObjectState(id=0, symmetric=False, pose=pose,
                      segmentation_label_id=1)]
    env.set_observation_from_states(gt)
    seg_count = int(np.asarray(env._observed.seg_count)[0])
    assert seg_count > 3 * 64, f"scene too small to stress the crop ({seg_count})"
    scored = env.score_object_states(gt, do_icp=False)
    su = scored[0]
    assert su.cost >= 0
    assert su.source_cost < 25.0, su.source_cost
    assert abs(su.target_cost - su.source_cost) < 30


def test_cost_aug_samples_cap_close_to_full_bank():
    """cost_cloud="transform" with a capped (strided) explain-only
    augmentation must score near the full-bank augmentation: the strided
    subsample stays uniform over the surface, so coverage-hole filling
    degrades smoothly, not cliff-wise."""
    import dataclasses

    env = make_env()
    env.set_observation_from_states(gt_states())
    gt = gt_states()
    off = ContPose.from_quat(gt[0].pose.x + 0.015, gt[0].pose.y - 0.012,
                             gt[0].pose.z + 0.008, 0, 0, 0, 1)
    cand = ObjectState(id=0, symmetric=False, pose=off,
                       segmentation_label_id=1)

    full = env.score_object_states([cand], do_icp=True)[0]

    base = make_env()
    from perception_tpu.core.config import EnvConfig
    env_cfg = EnvConfig(
        width=CAM.width, height=CAM.height,
        max_points_per_pose=512, max_observed_points=4096,
        max_points_per_label=1024, max_labels=4, icp_downsample=2,
        cost_aug_samples=64)
    capped = PerceptionEnv(base.bank, CAM, base.perch, env_cfg)
    capped.set_observation_from_states(gt_states())
    got = capped.score_object_states([cand], do_icp=True)[0]
    assert abs(got.cost - full.cost) <= max(10, 0.2 * full.cost), (
        got.cost, full.cost)
