"""Frame-watch camera loop (camera_loop.py): the perception_interface
robot-integration analogue — spool-directory frame contract, payload
assembly, in-process + HTTP dispatch, restart safety."""

import json
import threading

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from perception_tpu.camera_loop import FrameWatcher
from perception_tpu.core.pose import CAM_TO_BODY
from perception_tpu.serve import LocalizerService, serve

from tests.test_pipeline import gt_states, make_env
from tests.test_serve import _FakeRecognizer


def _drop_frame(spool, key, env, gt):
    depth_cm = np.asarray(env._input.depth_image).astype(np.uint16)
    label = np.asarray(env._input.label_mask).astype(np.uint8)
    cv2.imwrite(str(spool / f"{key}-depth.png"), depth_cm)
    cv2.imwrite(str(spool / f"{key}-labels.png"), label)
    with open(spool / f"{key}-request.json", "w") as f:
        json.dump({
            "depth_factor": 100.0,
            "cam_to_world": CAM_TO_BODY.tolist(),
            "segmented_object_names": ["red_box", "green_box"],
            "pose_lists": {"red_box": [[gt[0].pose.x, gt[0].pose.y,
                                        gt[0].pose.z, 0, 0, 0, 1]]},
        }, f)


@pytest.fixture(scope="module")
def scene():
    env = make_env()
    gt = gt_states()
    env.set_observation_from_states(gt)
    return env, gt


def test_in_process_frame_localisation(tmp_path, scene):
    env, gt = scene
    service = LocalizerService(_FakeRecognizer(env))
    _drop_frame(tmp_path, "frame0001", env, gt)

    w = FrameWatcher(str(tmp_path), service=service, depth_factor=100.0)
    assert w.pending_keys() == ["frame0001"]
    done = w.scan_once()
    assert done == ["frame0001"]

    out = json.load(open(tmp_path / "frame0001-detections.json"))
    assert out["frame"] == "frame0001"
    names = [d["name"] for d in out["detections"]]
    assert "red_box" in names
    det = out["detections"][names.index("red_box")]
    np.testing.assert_allclose(
        det["translation"], [gt[0].pose.x, gt[0].pose.y, gt[0].pose.z],
        atol=5e-3)

    # Pose-overlay visualisation written next to the frame (the
    # reference's pose_rgb_pub_ publication, perception_interface.cpp:541).
    import cv2
    overlay = cv2.imread(str(tmp_path / "frame0001-overlay.png"))
    assert overlay is not None
    assert overlay.shape[:2] == (env.camera.height, env.camera.width)

    # Restart safety: the detections file marks the frame processed.
    assert w.pending_keys() == []
    assert FrameWatcher(str(tmp_path), service=service).scan_once() == []


def test_http_dispatch(tmp_path, scene):
    env, gt = scene
    server = serve(_FakeRecognizer(env), port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        _drop_frame(tmp_path, "f2", env, gt)
        url = f"http://127.0.0.1:{server.server_address[1]}/localize"
        w = FrameWatcher(str(tmp_path), url=url, depth_factor=100.0)
        result = w.process("f2")
        assert [d["name"] for d in result["detections"]].count("red_box") == 1
        assert result["latency_s"] >= 0
    finally:
        server.shutdown()


def test_requires_exactly_one_dispatcher(tmp_path):
    with pytest.raises(ValueError):
        FrameWatcher(str(tmp_path))
    with pytest.raises(ValueError):
        FrameWatcher(str(tmp_path), service=object(), url="http://x")


def test_bad_frame_recorded_not_fatal(tmp_path, scene):
    env, gt = scene
    service = LocalizerService(_FakeRecognizer(env))
    # A depth PNG that is not a PNG.
    (tmp_path / "bad-depth.png").write_bytes(b"not a png")
    _drop_frame(tmp_path, "good", env, gt)
    w = FrameWatcher(str(tmp_path), service=service, depth_factor=100.0)
    # First failing poll: the bad frame might still be mid-write (the
    # producer is non-atomic), so it is retried, not recorded.
    done = w.scan_once()
    assert done == ["good"]
    assert not (tmp_path / "bad-detections.json").exists()
    # Second poll with an unchanged file: the failure is terminal.
    done = w.scan_once()
    assert done == ["bad"]
    bad = json.load(open(tmp_path / "bad-detections.json"))
    assert bad["detections"] == [] and "error" in bad
    good = json.load(open(tmp_path / "good-detections.json"))
    assert good["detections"]
    assert w.pending_keys() == []     # neither retries


def test_partial_write_retried_then_succeeds(tmp_path, scene):
    env, gt = scene
    service = LocalizerService(_FakeRecognizer(env))
    # Simulate a producer caught mid-write: truncated bytes first...
    (tmp_path / "slow-depth.png").write_bytes(b"partial")
    w = FrameWatcher(str(tmp_path), service=service, depth_factor=100.0)
    assert w.scan_once() == []
    # ...then the writer finishes before the next poll.
    _drop_frame(tmp_path, "slow", env, gt)
    assert w.scan_once() == ["slow"]
    out = json.load(open(tmp_path / "slow-detections.json"))
    assert "error" not in out
