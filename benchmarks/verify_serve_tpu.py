"""End-to-end verify drive on the real TPU (run from anywhere;
imports tests/ from the repo root). Round-5 provenance: this exact
drive caught the XLA excess-precision elision silently bf16-rounding
the one-hot ICP target gather (53 mm single-plane drift) that every
CPU-side unit test missed — keep running it on-chip after scorer/ICP
changes.

Drive: real ObjectRecognizer from
disk meshes -> warmup() (full greedy serving path incl. fused ICP + crop gather) -> HTTP serve() -> POST /localize -> check detections
against the warmup scene's nominal poses + /status + /overlay.png."""
import json
import sys
import tempfile
import threading
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from perception_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from perception_tpu.core.config import CameraIntrinsics, EnvConfig, PerchConfig
from perception_tpu.core.pose import CAM_TO_BODY
from perception_tpu.pipeline.recognizer import ModelSpec, ObjectRecognizer
from perception_tpu.serve import serve

from tests.test_search_e2e import _write_box_ply

tmp = Path(tempfile.mkdtemp())
cam = CameraIntrinsics(fx=160.0, fy=160.0, cx=64.0, cy=48.0,
                       width=128, height=96)
_write_box_ply(tmp / "red.ply", 0.12, 0.08, 0.10, (200, 40, 40))
_write_box_ply(tmp / "green.ply", 0.06, 0.06, 0.16, (40, 200, 40))
rec = ObjectRecognizer(
    [ModelSpec(name="red_box", path=str(tmp / "red.ply")),
     ModelSpec(name="green_box", path=str(tmp / "green.ply"))],
    cam,
    PerchConfig(gpu_stride=2, gpu_batch_size=64, sensor_resolution=0.02,
                min_neighbor_points_for_valid_pose=5),
    EnvConfig(width=cam.width, height=cam.height, max_points_per_pose=512,
              max_observed_points=4096, max_points_per_label=1024,
              max_labels=4, max_triangles_per_model=16),
    use_external_pose_list=True, target_triangles=16)

import jax
print("devices:", jax.devices(), flush=True)
dt = rec.warmup()
print(f"warmup: {dt:.1f}s, detected {rec.last_state.num_objects} objects",
      flush=True)
assert rec.last_state.num_objects == 2
names = {rec.bank.models[o.id].name for o in rec.last_state.object_states}
assert names == {"red_box", "green_box"}, names

# HTTP round-trip on the warmup frame (env._input was set by warmup).
env = rec.env
depth_cm = np.asarray(env._input.depth_image)
label = np.asarray(env._input.label_mask)
server = serve(rec, port=0)
port = server.server_address[1]
threading.Thread(target=server.serve_forever, daemon=True).start()
payload = {
    "depth_image": depth_cm.tolist(),
    "label_mask": label.tolist(),
    "depth_factor": 100.0,
    "cam_to_world": CAM_TO_BODY.tolist(),
    "segmented_object_names": ["red_box", "green_box"],
    "pose_lists": {
        "red_box": [[0.58, -0.06, -0.02, 0, 0, 0, 1]],
        "green_box": [[0.58, 0.06, -0.02, 0, 0, 0, 1]],
    },
    "mode": "greedy",
}
req = urllib.request.Request(
    f"http://127.0.0.1:{port}/localize",
    data=json.dumps(payload).encode(),
    headers={"Content-Type": "application/json"})
with urllib.request.urlopen(req, timeout=600) as resp:
    out = json.loads(resp.read())
print(json.dumps(out)[:600], flush=True)
dets = {d["name"]: d for d in out["detections"]}
assert set(dets) == {"red_box", "green_box"}, dets
for name, y in (("red_box", -0.06), ("green_box", 0.06)):
    t = dets[name]["translation"]
    err = np.linalg.norm(np.asarray(t) - np.asarray([0.58, y, -0.02]))
    print(f"{name}: translation {t}, err {err * 1000:.2f} mm", flush=True)
    assert err < 0.02, (name, t)
with urllib.request.urlopen(f"http://127.0.0.1:{port}/status",
                            timeout=60) as resp:
    status = json.loads(resp.read())
assert {d["name"] for d in status["detections"]} == {"red_box", "green_box"}
with urllib.request.urlopen(f"http://127.0.0.1:{port}/overlay.png",
                            timeout=120) as resp:
    png = resp.read()
assert png[:8] == b"\x89PNG\r\n\x1a\n"
server.shutdown()
print("VERIFY-SERVE-TPU: OK", flush=True)
