"""Localisation service round-trip + edge-case robustness tests."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from perception_tpu.core.pose import CAM_TO_BODY
from perception_tpu.core.state import ObjectState
from perception_tpu.pipeline.env import RecognitionInput

from tests.test_pipeline import gt_states, make_env


class _FakeRecognizer:
    """Adapter: PerceptionEnv-based recogniser for the service without
    loading meshes from disk."""

    def __init__(self, env):
        self.env = env
        import dataclasses as dc

        self.specs = [dc.make_dataclass("S", ["name"])(m.name)
                      for m in env.bank.models]

    def localize_objects_greedy_render(self, rin, pose_lists):
        from perception_tpu.pipeline.recognizer import ObjectRecognizer

        env = self.env
        env.set_input(rin)
        cands = env.generate_successors_6dof(pose_lists)
        state, _ = env.compute_greedy_poses(cands)
        self.last_state = state   # visualisation surface (overlay endpoint)
        names, poses, tfs = [], [], []
        for obj in state.object_states:
            model = env.bank.models[obj.id]
            names.append(model.name)
            poses.append(obj.pose)
            tfs.append(obj.pose.transform() @ model.preprocessing_transform)
        import types

        return types.SimpleNamespace(names=names, poses=poses,
                                     object_transforms=tfs)


def test_service_round_trip():
    from perception_tpu.serve import serve

    env = make_env()
    gt = gt_states()
    env.set_observation_from_states(gt)
    depth_cm = np.asarray(env._input.depth_image)
    label = np.asarray(env._input.label_mask)
    server = serve(_FakeRecognizer(env), port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        payload = {
            "depth_image": depth_cm.tolist(),
            "label_mask": label.tolist(),
            "depth_factor": 100.0,
            "cam_to_world": CAM_TO_BODY.tolist(),
            "segmented_object_names": ["red_box", "green_box"],
            "pose_lists": {
                "red_box": [[gt[0].pose.x, gt[0].pose.y, gt[0].pose.z,
                             0, 0, 0, 1]],
            },
            "mode": "greedy",
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/localize",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert "detections" in out
        assert out["detections"][0]["name"] == "red_box"
        t_est = out["detections"][0]["translation"]
        assert abs(t_est[0] - gt[0].pose.x) < 0.03

        # Visualisation surface: status page + pose-overlay PNG (the
        # reference's pose_rgb_pub_ image publication served over GET).
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/status", timeout=30) as resp:
            status = json.loads(resp.read())
        assert status["detections"][0]["name"] == "red_box"
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=30) as resp:
            page = resp.read().decode()
        assert "red_box" in page and "/overlay.png" in page
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/overlay.png", timeout=60) as resp:
            png = resp.read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        server.shutdown()


def test_overlay_before_first_localization_404s():
    from perception_tpu.serve import LocalizerService, serve

    env = make_env()
    service = LocalizerService(_FakeRecognizer(env))
    assert service.render_overlay() is None
    server = serve(_FakeRecognizer(env), port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/overlay.png", timeout=30)
        assert exc.value.code == 404
    finally:
        server.shutdown()


def test_empty_candidate_list():
    env = make_env()
    env.set_observation_from_states(gt_states())
    state, chosen = env.compute_greedy_poses([])
    assert state.num_objects == 0
    assert chosen == []


def test_all_invalid_candidates():
    from perception_tpu.core.pose import ContPose

    env = make_env()
    env.set_observation_from_states(gt_states())
    # Behind the camera: renders empty -> cost -1 -> nothing selected.
    far = ObjectState(id=0, symmetric=False,
                      pose=ContPose.from_quat(-5.0, 0, 0, 0, 0, 0, 1),
                      segmentation_label_id=1)
    scored = env.score_object_states([far], do_icp=False)
    assert scored[0].cost == -1
    state, _ = env.compute_greedy_poses([far])
    assert state.num_objects == 0


def test_empty_observation():
    env = make_env()
    rin = RecognitionInput(
        depth_image=np.zeros((env.camera.height, env.camera.width)),
        label_mask=np.zeros((env.camera.height, env.camera.width), np.int32),
        depth_factor=100.0, cam_to_world=CAM_TO_BODY.copy(),
        use_external_pose_list=True)
    env.set_input(rin)
    assert int(env._observed.count) == 0
    # Scoring against an empty scene: no observed points -> everything
    # unexplained or empty, but no crash and no selection.
    gt = gt_states()
    scored = env.score_object_states([gt[0]], do_icp=False)
    assert scored[0].cost == -1 or scored[0].target_cost >= 99


def test_warmup_compiles_serving_path(tmp_path):
    """ObjectRecognizer.warmup(): the boot-time synthetic localisation
    (serve --warmup) must run the real greedy serving path end-to-end
    and leave the recogniser serviceable — the warmup observation is the
    bank's own models, so it should detect them at their nominal poses."""
    from perception_tpu.core.config import CameraIntrinsics, EnvConfig, PerchConfig
    from perception_tpu.pipeline.recognizer import ModelSpec, ObjectRecognizer
    from tests.test_search_e2e import _write_box_ply

    cam = CameraIntrinsics(fx=160.0, fy=160.0, cx=64.0, cy=48.0,
                           width=128, height=96)
    _write_box_ply(tmp_path / "red.ply", 0.12, 0.08, 0.10, (200, 40, 40))
    _write_box_ply(tmp_path / "green.ply", 0.06, 0.06, 0.16, (40, 200, 40))
    rec = ObjectRecognizer(
        [ModelSpec(name="red_box", path=str(tmp_path / "red.ply")),
         ModelSpec(name="green_box", path=str(tmp_path / "green.ply"))],
        cam,
        PerchConfig(gpu_stride=2, gpu_batch_size=64, sensor_resolution=0.02,
                    min_neighbor_points_for_valid_pose=5),
        EnvConfig(width=cam.width, height=cam.height, max_points_per_pose=512,
                  max_observed_points=4096, max_points_per_label=1024,
                  max_labels=4, max_triangles_per_model=16),
        use_external_pose_list=True, target_triangles=16)
    dt = rec.warmup()
    assert dt > 0
    # The warmup localisation itself must have found the bank's models.
    assert rec.last_state.num_objects == 2
    names = {rec.bank.models[o.id].name for o in rec.last_state.object_states}
    assert names == {"red_box", "green_box"}
