"""MHA* planner and clutter-mode tests."""

import dataclasses

import numpy as np

from perception_tpu.core.config import CameraIntrinsics
from perception_tpu.pipeline.heuristics import Detection, DetectionHeuristicFactory
from perception_tpu.pipeline.mha_star import MHAStarPlanner

from tests.test_pipeline import gt_states, make_env
from tests.test_search_e2e import jittered_candidates


def test_mha_star_recovers_scene():
    env = make_env()
    gt = gt_states()
    env.set_observation_from_states(gt)
    cands = jittered_candidates(gt, np.random.default_rng(9), n=6)
    planner = MHAStarPlanner(env, cands, w1=2.0, max_expansions=20)
    state = planner.plan()
    assert state.num_objects == 2
    for sel in state.object_states:
        true = gt[sel.id]
        err = np.linalg.norm(
            np.array([sel.pose.x, sel.pose.y, sel.pose.z])
            - np.array([true.pose.x, true.pose.y, true.pose.z]))
        assert err < 0.02, f"object {sel.id} off by {err}"
    assert planner.stats.expands >= 2


def test_mha_star_with_detection_heuristic():
    env = make_env()
    gt = gt_states()
    env.set_observation_from_states(gt)
    cands = jittered_candidates(gt, np.random.default_rng(11), n=6)
    # Detections centred on the projected GT objects.
    cam = env.camera
    dets = []
    for obj, name in zip(gt, ["red_box", "green_box"]):
        mat = env.pose_to_camera(obj)
        u = cam.fx * mat[0, 3] / mat[2, 3] + cam.cx
        v = cam.fy * mat[1, 3] / mat[2, 3] + cam.cy
        dets.append(Detection(name=name, bbox=(u - 15, v - 15, u + 15, v + 15)))
    factory = DetectionHeuristicFactory(
        dets, cam, cam_to_world=env._input.cam_to_world)
    h = factory.heuristic([m.name for m in env.bank.models])
    planner = MHAStarPlanner(env, cands, heuristics=[h], w1=2.0, w2=2.0,
                             max_expansions=20)
    state = planner.plan()
    assert state.num_objects == 2


def test_discretized_state_identity_dedup():
    """Two continuous poses in the same discrete cell share a hash key
    (reference DiscPose equality via DiscretizationManager), so the
    planner's duplicate detection collapses them; a pose one cell over
    does not. env._disc is the single source of that identity."""
    from perception_tpu.core.pose import ContPose
    from perception_tpu.core.state import GraphState, ObjectState

    env = make_env()
    gt = gt_states()
    env.set_observation_from_states(gt)
    assert env._disc is not None
    res = env.env.res

    def obj(x, y):
        return ObjectState(id=0, symmetric=False,
                           pose=ContPose.from_quat(x, y, 0.1, 0, 0, 0, 1))

    a = GraphState((obj(0.200, 0.300),))
    b = GraphState((obj(0.200 + res * 0.2, 0.300 - res * 0.2),))
    c = GraphState((obj(0.200 + res * 1.1, 0.300),))
    assert a.hash_key(env._disc) == b.hash_key(env._disc)
    assert a.hash_key(env._disc) != c.hash_key(env._disc)

    # set_input refreshes the grid origin from the search region.
    assert env._disc.x_min == env._input.x_min
    assert env._disc.y_min == env._input.y_min


def test_clutter_mode_cost():
    env = make_env(use_clutter_mode=True, clutter_regularizer=0.5)
    gt = gt_states()
    env.set_observation_from_states(gt)
    # Candidate behind the observed scene: pixels removed as clutter.
    from perception_tpu.core.pose import ContPose
    from perception_tpu.core.state import ObjectState

    gt0 = gt[0]
    scored_gt = env.score_object_states([gt0], do_icp=False)
    assert scored_gt[0].cost >= 0
    cfg = env._scorer_config(do_icp=False)
    assert cfg.use_clutter_mode
