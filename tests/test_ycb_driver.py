"""End-to-end YCB-layout driver test on a synthetic mini-dataset.

Builds a fake YCB-Video directory (rendered with the library itself),
then runs the full keyframe sweep: mask -> candidate generation ->
greedy recognition -> ADD/ADD-S AUC report.
"""

import numpy as np
import pytest

from perception_tpu.core.config import CameraIntrinsics, EnvConfig, PerchConfig
from perception_tpu.core.pose import ContPose
from perception_tpu.core.state import ObjectState
from perception_tpu.eval import ycb as ycb_mod

from tests.test_core import make_box
from tests.test_search_e2e import _write_box_ply

CAM = CameraIntrinsics(fx=160.0, fy=160.0, cx=64.0, cy=48.0, width=128, height=96)


@pytest.fixture(scope="module")
def fake_ycb(tmp_path_factory):
    import cv2
    from scipy.io import savemat

    from perception_tpu.core.mesh import ModelBank, mesh_model_from_arrays
    from perception_tpu.pipeline.env import PerceptionEnv

    root = tmp_path_factory.mktemp("ycb")
    (root / "image_sets").mkdir()
    (root / "data" / "0001").mkdir(parents=True)
    (root / "models" / "red_box").mkdir(parents=True)
    (root / "models" / "green_box").mkdir(parents=True)

    (root / "image_sets" / "classes.txt").write_text("red_box\ngreen_box\n")
    (root / "image_sets" / "keyframe.txt").write_text("0001/000001\n")

    _write_box_ply(root / "models" / "red_box" / "textured.ply",
                   0.12, 0.08, 0.10, (200, 40, 40))
    _write_box_ply(root / "models" / "green_box" / "textured.ply",
                   0.06, 0.06, 0.16, (40, 200, 40))

    # Render the GT scene. Models here are loaded 6-DoF-preprocessed; the
    # meta.mat GT must be raw-model-frame -> camera.
    v1, f1 = make_box(0.12, 0.08, 0.10)
    v2, f2 = make_box(0.06, 0.06, 0.16)
    m1 = mesh_model_from_arrays("red_box", v1, f1, use_external_pose_list=True)
    m2 = mesh_model_from_arrays("green_box", v2, f2, use_external_pose_list=True)
    bank = ModelBank.from_models([m1, m2], t_cap=16)
    env = PerceptionEnv(bank, CAM,
                        PerchConfig(gpu_stride=2),
                        EnvConfig(width=CAM.width, height=CAM.height,
                                  max_labels=4))
    gt_cam = {
        "red_box": ContPose.from_quat(0.02, -0.01, 0.55, 0, 0, 0, 1),
        "green_box": ContPose.from_quat(-0.08, 0.02, 0.60,
                                        0, 0, 0.2588, 0.9659),
    }
    # Camera frame == world frame for the fake input.
    import dataclasses as dc

    states = [
        ObjectState(id=0, symmetric=False, pose=gt_cam["red_box"],
                    segmentation_label_id=1),
        ObjectState(id=1, symmetric=False, pose=gt_cam["green_box"],
                    segmentation_label_id=2),
    ]
    from perception_tpu.pipeline.env import RecognitionInput
    env._input = RecognitionInput(
        depth_image=np.zeros((CAM.height, CAM.width)),
        cam_to_world=np.eye(4))
    depth, color, label = env.render_composite(states)

    base = root / "data" / "0001" / "000001"
    depth_sensor = (depth.astype(np.float64) / 100.0
                    * ycb_mod.YCB_DEPTH_FACTOR).astype(np.uint16)
    cv2.imwrite(str(base) + "-depth.png", depth_sensor)
    cv2.imwrite(str(base) + "-color.png", color[..., ::-1].astype(np.uint8))
    # Label image with class ids (1-based classes.txt order).
    cv2.imwrite(str(base) + "-label.png", label.astype(np.uint8))

    poses = np.zeros((3, 4, len(states)))
    cls = []
    for i, (name, pose) in enumerate(gt_cam.items()):
        model = bank.models[i]
        raw_to_cam = pose.transform() @ model.preprocessing_transform
        poses[:, :, i] = raw_to_cam[:3, :]
        cls.append(i + 1)
    savemat(str(base) + "-meta.mat", {
        "cls_indexes": np.asarray(cls).reshape(-1, 1),
        "poses": poses,
        "intrinsic_matrix": CAM.matrix().astype(np.float64),
    })
    return root, gt_cam


def test_candidate_generation(fake_ycb):
    root, gt = fake_ycb
    ds = ycb_mod.YCBVideoDataset(str(root))
    frame = ds.load_frame("0001", "000001")
    mask = ycb_mod.mask_from_labels(frame.label, [1, 2])
    cands = ycb_mod.generate_candidates(
        frame.depth, mask, ["red_box", "green_box"], frame.intrinsics,
        num_samples=20, depth_factor=ycb_mod.YCB_DEPTH_FACTOR)
    assert set(cands) == {"red_box", "green_box"}
    for name, rows in cands.items():
        assert rows.shape[1] == 7
        assert len(rows) >= 10
        # Candidate centroids bracket the GT depth.
        zs = rows[:, 2]
        assert zs.min() <= gt[name].z + 0.03
        assert zs.max() >= gt[name].z - 0.12


def test_full_dataset_sweep(fake_ycb, tmp_path):
    root, gt = fake_ycb
    from perception_tpu.pipeline.recognizer import ModelSpec, ObjectRecognizer

    ds = ycb_mod.YCBVideoDataset(str(root))
    specs = [
        ModelSpec(name="red_box",
                  path=str(root / "models" / "red_box" / "textured.ply")),
        ModelSpec(name="green_box",
                  path=str(root / "models" / "green_box" / "textured.ply")),
    ]
    rec = ObjectRecognizer(
        specs, CAM,
        PerchConfig(gpu_stride=2, gpu_batch_size=256, sensor_resolution=0.02,
                    min_neighbor_points_for_valid_pose=5,
                    max_icp_iterations=20),
        EnvConfig(width=CAM.width, height=CAM.height, max_points_per_pose=512,
                  max_observed_points=4096, max_points_per_label=1024,
                  max_labels=4, max_triangles_per_model=16),
        use_external_pose_list=True, target_triangles=16)
    report = ycb_mod.run_dataset(rec, ds, num_samples=16,
                                 output_root=str(tmp_path / "out"))
    assert "red_box" in report["objects"]
    assert "green_box" in report["objects"]
    # Centroid-depth sweep x rotation samples + GICP should land within the
    # AUC window comfortably on this clean synthetic scene.
    assert report["overall"]["auc"] > 40, report
    assert (tmp_path / "out" / "accuracy.json").exists()
