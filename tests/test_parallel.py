"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from perception_tpu.parallel.sharding import make_pose_mesh, score_pose_batch_multichip
from tests.test_pipeline import gt_states, make_env


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
        env._proj, env._scene, cfg)

    got = np.asarray(scores.total_cost)
    want = np.asarray([s.cost for s in ref])
    np.testing.assert_array_equal(got, want)
