"""Localisation service: a long-lived recogniser behind a JSON/HTTP API.

Replaces the reference's ROS service surface (`object_recognition_node`:
`object_localizer_service` exposing LocalizeObjects.srv, C26) with a
dependency-free HTTP endpoint. The model bank loads once (compiles once);
each request carries one observation and returns detected poses.

    python -m perception_tpu.serve --config scene.yaml --port 8765

Request (POST /localize, JSON):
    {"depth_image": [[...]], "label_mask": [[...]],
     "color_image": [[[...]]] | null,
     "depth_factor": 10000, "cam_to_world": [[...4x4]] | null,
     "pose_lists": {"obj": [[x,y,z,qx,qy,qz,qw], ...]} | null,
     "mode": "greedy"}

Response:
    {"detections": [{"name", "translation", "quaternion_xyzw",
                     "transform"}], "stats": {...}}

For robot integration, pair with perception_tpu.utils.cloud_utils (plane
removal / clustering) upstream of the request, as the reference's
perception_interface does.
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


class LocalizerService:
    def __init__(self, recognizer):
        self.recognizer = recognizer

    def handle(self, payload: dict) -> dict:
        from perception_tpu.pipeline.env import RecognitionInput

        depth = np.asarray(payload["depth_image"], np.float64)
        label = (np.asarray(payload["label_mask"], np.int32)
                 if payload.get("label_mask") is not None else None)
        color = (np.asarray(payload["color_image"], np.float32)
                 if payload.get("color_image") is not None else None)
        cam_to_world = np.asarray(
            payload.get("cam_to_world") or np.eye(4).tolist(), np.float64)
        use_external = label is not None
        rin = RecognitionInput(
            depth_image=depth, color_image=color, label_mask=label,
            depth_factor=float(payload.get("depth_factor", 100.0)),
            cam_to_world=cam_to_world,
            segmented_object_names=payload.get(
                "segmented_object_names",
                [s.name for s in self.recognizer.specs]),
            use_external_pose_list=use_external)
        # 3-DoF support-surface region, as perception_interface's
        # table-height filtering supplies it (perception_interface.cpp:61).
        for field in ("table_height", "x_min", "x_max", "y_min", "y_max"):
            if field in payload:
                setattr(rin, field, float(payload[field]))

        mode = payload.get("mode", "greedy")
        if mode == "greedy":
            pose_lists = {
                k: np.asarray(v, np.float64)
                for k, v in (payload.get("pose_lists") or {}).items()}
            result = self.recognizer.localize_objects_greedy_render(
                rin, pose_lists)
        elif mode == "tree":
            result = self.recognizer.localize_objects(rin)
        else:
            result = self.recognizer.localize_objects_greedy_icp(rin)

        stats = self.recognizer.env.stats
        return {
            "detections": [
                {
                    "name": name,
                    "translation": [pose.x, pose.y, pose.z],
                    "quaternion_xyzw": list(pose.quaternion()),
                    "transform": np.asarray(tf, float).tolist(),
                }
                for name, pose, tf in zip(result.names, result.poses,
                                          result.object_transforms)
            ],
            "stats": {
                "scenes_rendered": stats.scenes_rendered,
                "time": stats.time,
                "gpu_time": stats.gpu_time,
            },
        }


def serve(recognizer, port: int = 8765) -> HTTPServer:
    service = LocalizerService(recognizer)

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/localize":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(length))
                out = service.handle(payload)
                body = json.dumps(out).encode()
                self.send_response(200)
            except Exception as exc:  # report errors to the client
                body = json.dumps({"error": str(exc)}).encode()
                self.send_response(500)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    return HTTPServer(("127.0.0.1", port), Handler)


def main(argv=None) -> int:
    from perception_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--port", type=int, default=8765)
    args = parser.parse_args(argv)

    import yaml

    from perception_tpu.core.config import CameraIntrinsics, EnvConfig, PerchConfig
    from perception_tpu.pipeline.recognizer import ModelSpec, ObjectRecognizer

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    cam = CameraIntrinsics(**cfg["camera"])
    recognizer = ObjectRecognizer(
        [ModelSpec(name=m["name"], path=m["path"])
         for m in cfg["model_bank"]],
        cam, PerchConfig.from_yaml_dict(cfg),
        EnvConfig.from_yaml_dict(cfg.get("env_params", {})))
    server = serve(recognizer, args.port)
    print(f"perception_tpu localizer on :{args.port}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
