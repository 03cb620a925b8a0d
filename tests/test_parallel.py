"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from perception_tpu.parallel.sharding import make_pose_mesh, score_pose_batch_multichip
from tests.test_pipeline import gt_states, make_env


def _aux_banks(env):
    """The per-model aux banks the single-device env path passes to
    score_pose_batch; the sharded path must forward the same set or the
    scores diverge (e.g. cost_cloud="transform" loses its explain-only
    augmentation points)."""
    return dict(bank_backface=env._render_bank[3],
                bank_icp_samples=env._bank_icp_samples,
                bank_icp_normals=env._bank_icp_normals,
                bank_tri_lab=env._render_bank_lab)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_scores_match_single_device():
    env = make_env()
    env.set_observation_from_states(gt_states())
    gt = gt_states()
    rng = np.random.default_rng(3)
    from perception_tpu.core.pose import ContPose
    from perception_tpu.core.state import ObjectState

    cands = []
    for obj in gt:
        for _ in range(5):
            j = rng.normal(0, 0.02, 3)
            p = ContPose.from_quat(obj.pose.x + j[0], obj.pose.y + j[1],
                                   obj.pose.z + j[2], *obj.pose.quaternion())
            cands.append(ObjectState(id=obj.id, symmetric=False, pose=p,
                                     segmentation_label_id=obj.segmentation_label_id))

    # Single-device reference result.
    ref = env.score_object_states(cands, do_icp=False)

    # Sharded result (10 poses over 8 devices -> padded to 16).
    cfg = env._scorer_config(do_icp=False)
    obs = env._observed
    poses = np.stack([env.pose_to_camera(s) for s in cands]).astype(np.float32)
    ids = np.asarray([s.id for s in cands], np.int32)
    labels = np.asarray([s.segmentation_label_id - 1 for s in cands], np.int32)
    totals = np.asarray(obs.seg_count, np.float32)[labels]

    mesh = make_pose_mesh()
    scores = score_pose_batch_multichip(
        mesh, env._bank_tri_verts, env._bank_tri_colors, env._bank_tri_valid,
        poses, ids, labels, totals,
        env._proj, env._scene, cfg, **_aux_banks(env))

    got = np.asarray(scores.total_cost)
    want = np.asarray([s.cost for s in ref])
    np.testing.assert_array_equal(got, want)


def _candidate_problem(env, n_per_obj=5, seed=3):
    gt = gt_states()
    rng = np.random.default_rng(seed)
    from perception_tpu.core.pose import ContPose
    from perception_tpu.core.state import ObjectState

    cands = []
    for obj in gt:
        for _ in range(n_per_obj):
            j = rng.normal(0, 0.02, 3)
            p = ContPose.from_quat(obj.pose.x + j[0], obj.pose.y + j[1],
                                   obj.pose.z + j[2], *obj.pose.quaternion())
            cands.append(ObjectState(id=obj.id, symmetric=False, pose=p,
                                     segmentation_label_id=obj.segmentation_label_id))
    obs = env._observed
    poses = np.stack([env.pose_to_camera(s) for s in cands]).astype(np.float32)
    ids = np.asarray([s.id for s in cands], np.int32)
    labels = np.asarray([s.segmentation_label_id - 1 for s in cands], np.int32)
    totals = np.asarray(obs.seg_count, np.float32)[labels]
    return cands, poses, ids, labels, totals


def test_sharded_icp_scores_match_single_device():
    """Round-2 gap: sharded == single-device WITH the ICP refine stage on
    (the reference's whole distribution story is distributing refinement,
    search_env.cpp:920-1023)."""
    env = make_env()
    env.set_observation_from_states(gt_states())
    cands, poses, ids, labels, totals = _candidate_problem(env)

    ref = env.score_object_states(cands, do_icp=True)
    cfg = env._scorer_config(do_icp=True)
    mesh = make_pose_mesh()
    scores = score_pose_batch_multichip(
        mesh, env._bank_tri_verts, env._bank_tri_colors, env._bank_tri_valid,
        poses, ids, labels, totals, env._proj, env._scene, cfg,
        **_aux_banks(env))

    got = np.asarray(scores.total_cost)
    want = np.asarray([s.cost for s in ref])
    np.testing.assert_array_equal(got, want)
    # Non-degenerate: the candidates straddle good and bad fits.
    assert np.ptp(got) > 0


def test_sharded_pallas_interpret_matches_single_device():
    """GSPMD + the pallas kernel stack (interpret mode on the virtual CPU
    mesh): the compiled-kernel path and the sharding annotations compose."""
    import dataclasses

    from perception_tpu.pipeline.scorer import score_pose_batch

    env = make_env()
    env.set_observation_from_states(gt_states())
    cands, poses, ids, labels, totals = _candidate_problem(env, n_per_obj=3)

    cfg = dataclasses.replace(env._scorer_config(do_icp=True),
                              backend="pallas_direct_interpret")
    args = (env._bank_tri_verts, env._bank_tri_colors, env._bank_tri_valid,
            poses, ids, labels, totals, env._proj, env._scene)
    aux = _aux_banks(env)
    single = score_pose_batch(*args, cfg, **aux)
    mesh = make_pose_mesh()
    sharded = score_pose_batch_multichip(mesh, *args, cfg, **aux)
    np.testing.assert_array_equal(np.asarray(sharded.total_cost),
                                  np.asarray(single.total_cost))
    assert np.ptp(np.asarray(sharded.total_cost)) > 0
