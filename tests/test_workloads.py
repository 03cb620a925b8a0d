"""Per-workload entry points: same-shape multi-instance + conveyor."""

import numpy as np
import pytest

from perception_tpu.core.config import CameraIntrinsics, EnvConfig, PerchConfig
from perception_tpu.core.mesh import ModelBank, mesh_model_from_arrays
from perception_tpu.core.pose import ContPose
from perception_tpu.core.state import ObjectState
from perception_tpu.pipeline.env import PerceptionEnv, RecognitionInput

from tests.test_core import make_box

CAM = CameraIntrinsics(fx=160.0, fy=160.0, cx=64.0, cy=48.0,
                       width=128, height=96)


class _BoxRecognizer:
    """Minimal recognizer facade over a prebuilt env (no mesh files)."""

    def __init__(self, env):
        self.env = env
        self.bank = env.bank

    def localize_objects_greedy_render(self, rin, pose_lists,
                                       output_dir=None):
        env = self.env
        env.set_input(rin)
        candidates = env.generate_successors_6dof(pose_lists)
        state, chosen = env.compute_greedy_poses(candidates)
        import dataclasses

        @dataclasses.dataclass
        class R:
            names: list
            poses: list

        names = [self.bank.models[s.id].name for s in state.object_states]
        return R(names=names, poses=[s.pose for s in state.object_states])


@pytest.fixture
def box_env():
    v, f = make_box(0.08, 0.06, 0.10)
    v = v - [0, 0, 0.05]   # centred: preprocessing shift ~0, so GT-state
    #                        positions coincide with the observed cloud
    #                        (the validity radius is pose-origin based)
    model = mesh_model_from_arrays("box", v, f,
                                   use_external_pose_list=True)
    bank = ModelBank.from_models([model], t_cap=16)
    env = PerceptionEnv(
        bank, CAM,
        PerchConfig(gpu_stride=2, gpu_batch_size=256,
                    sensor_resolution=0.02,
                    min_neighbor_points_for_valid_pose=5,
                    max_icp_iterations=15),
        EnvConfig(width=CAM.width, height=CAM.height,
                  max_points_per_pose=512, max_observed_points=4096,
                  max_points_per_label=1024, max_labels=4))
    return env


def test_run_sameshape_two_instances(box_env):
    """Two instances of the SAME model in different segments both get
    localized (per-(model, segment) argmin)."""
    from perception_tpu.eval.workloads import run_sameshape

    env = box_env
    gt = [
        ObjectState(id=0, symmetric=False,
                    pose=ContPose.from_quat(-0.10, 0.0, 0.55, 0, 0, 0, 1),
                    segmentation_label_id=1),
        ObjectState(id=0, symmetric=False,
                    pose=ContPose.from_quat(0.10, 0.02, 0.60, 0, 0, 0, 1),
                    segmentation_label_id=2),
    ]
    env._input = RecognitionInput(
        depth_image=np.zeros((CAM.height, CAM.width)),
        cam_to_world=np.eye(4))
    depth, color, label = env.render_composite(gt)
    assert set(np.unique(label)) == {0, 1, 2}

    # Plumbing exactness: suffixed segment names resolve to the shared
    # model (index_of) and the per-(model, segment) argmin returns ONE
    # winner per instance — with GT poses among the candidates both land
    # exactly.
    rin = RecognitionInput(
        depth_image=depth.astype(np.float64) * 100.0, label_mask=label,
        depth_factor=10000.0, cam_to_world=np.eye(4),
        segmented_object_names=["box#1", "box#2"],
        use_external_pose_list=True)
    env.set_input(rin)
    state, chosen = env.compute_greedy_poses(list(gt))
    assert [s.segmentation_label_id for s in state.object_states] == [1, 2]
    for s, true in zip(state.object_states, gt):
        err = np.linalg.norm([s.pose.x - true.pose.x,
                              s.pose.y - true.pose.y,
                              s.pose.z - true.pose.z])
        assert err < 1e-3, err

    # End-to-end sweep through run_sameshape: both instances detected;
    # pose quality is bounded loosely (the coarse sweep on a symmetric-ish
    # box hits the documented single-view ambiguity — accuracy is
    # measured properly by benchmarks/accuracy_synthetic.py).
    rec = _BoxRecognizer(env)
    depth_sensor = depth.astype(np.float64) * 100.0  # cm -> 10000-factor
    result = run_sameshape(rec, depth_sensor, label, "box", 2, CAM,
                           depth_factor=10000.0, num_samples=40)
    assert len(result.poses) == 2
    from perception_tpu.eval.metrics import adi_err

    pts = env.bank.models[0].sample_surface_points(512)
    for p in result.poses:
        est = p.transform()
        best = min(
            adi_err(est[:3, :3], est[:3, 3], s.pose.transform()[:3, :3],
                    s.pose.transform()[:3, 3], pts)
            for s in gt)
        assert best < 0.10, best


def test_run_on_conveyor_warm_start(box_env):
    """Conveyor: frame 2 with a sparse sweep still lands on GT because the
    warm start injects frame 1's detection as a candidate."""
    from perception_tpu.eval.ycb import YCBFrame
    from perception_tpu.eval.workloads import run_on_conveyor

    env = box_env
    pose = ContPose.from_quat(0.02, -0.01, 0.55, 0, 0, 0, 1)
    gt = [ObjectState(id=0, symmetric=False, pose=pose,
                      segmentation_label_id=1)]
    env._input = RecognitionInput(
        depth_image=np.zeros((CAM.height, CAM.width)),
        cam_to_world=np.eye(4))
    depth, color, label = env.render_composite(gt)

    model = env.bank.models[0]
    gt_raw = pose.transform() @ model.preprocessing_transform
    frames = []
    for idx in ("000001", "000002"):
        frames.append(YCBFrame(
            scene="conv", frame=idx, color=color.astype(np.uint8),
            depth=(depth.astype(np.float64) * 100.0).astype(np.uint16),
            label=label.astype(np.uint8),
            gt_poses={"box": gt_raw}, intrinsics=CAM,
            class_list=["box"]))

    rec = _BoxRecognizer(env)
    # Direct warm-start value check: with the GT pose injected as the
    # previous-frame detection, a SPARSE sweep (4 rotation samples) lands
    # exactly; without it, it cannot.
    from perception_tpu.eval.workloads import _evaluate_with_extra_candidates

    q = pose.quaternion()
    gt_rows = {"box": np.asarray([[pose.x, pose.y, pose.z, *q]])}
    warm = _evaluate_with_extra_candidates(
        rec, frames[1], gt_rows, ["box"], 4, None)
    cold = _evaluate_with_extra_candidates(
        rec, frames[1], None, ["box"], 4, None)
    assert warm.errors["box"] < 0.01
    assert cold.errors["box"] > warm.errors["box"]

    # Sequence driver: two frames, detections propagate.
    results = run_on_conveyor(rec, frames, object_names=["box"],
                              num_samples=20)
    assert len(results) == 2
    assert all("box" in r.errors for r in results)
    assert results[1]._detected_poses is not None
    # Frame 2 cannot be worse than frame 1: it has frame 1's pose as an
    # extra candidate on an identical observation.
    assert results[1].errors["box"] <= results[0].errors["box"] + 1e-9
