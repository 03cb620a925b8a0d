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

Visualisation (GET — the reference's image/marker publications,
perception_interface.cpp:529-541, served over HTTP instead of ROS):
    /             HTML status page: last detections + pose overlay
    /status       last /localize response as JSON
    /overlay.png  detected poses rendered over the last observation

For robot integration, pair with perception_tpu.utils.cloud_utils (plane
removal / clustering) upstream of the request, as the reference's
perception_interface does.
"""

from __future__ import annotations

import argparse
import html
import json
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


class LocalizerService:
    def __init__(self, recognizer):
        self.recognizer = recognizer
        # Visualisation state (the reference's pose_rgb_pub_ /
        # mesh_marker_pub_ surface, perception_interface.cpp:529-541):
        # last observation + detections, composited on demand.
        self.last_observation: dict | None = None
        self.last_response: dict | None = None

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
        self.last_observation = {"depth": depth, "color": color,
                                 "depth_factor": rin.depth_factor}
        out = {
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
        self.last_response = out
        return out

    def render_overlay(self) -> "np.ndarray | None":
        """Composite the last detections over the last observation.

        RGB uint8 [H, W, 3], or None before the first localisation (or
        when the recogniser does not expose its final GraphState). This is
        the reference's pose-overlaid RGB publication
        (perception_interface.cpp:541 pose_rgb_pub_), served as an image
        instead of a ROS topic.
        """
        state = getattr(self.recognizer, "last_state", None)
        env = getattr(self.recognizer, "env", None)
        if (state is None or env is None or self.last_observation is None
                or not state.object_states):
            return None
        obs = self.last_observation
        if obs["color"] is not None:
            base = np.asarray(obs["color"], np.float64)
        else:
            from perception_tpu.utils.debug import colorize_depth
            base = colorize_depth(
                np.asarray(obs["depth"], np.float64)
                / obs["depth_factor"]).astype(np.float64)
        det_depth, det_color, _ = env.render_composite(state.object_states)
        h = min(base.shape[0], det_depth.shape[0])
        w = min(base.shape[1], det_depth.shape[1])
        overlay = base[:h, :w].copy()
        mask = det_depth[:h, :w] > 0
        overlay[mask] = (0.45 * overlay[mask]
                         + 0.55 * det_color[:h, :w][mask])
        return np.clip(overlay, 0, 255).astype(np.uint8)


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

        def do_GET(self):
            # Visualisation surface (reference: perception_interface's
            # image/marker publications + the rviz view of them).
            if self.path in ("/", "/index.html"):
                body = _status_page(service).encode()
                ctype = "text/html"
                code = 200
            elif self.path == "/status":
                body = json.dumps(service.last_response or {}).encode()
                ctype = "application/json"
                code = 200
            elif self.path == "/overlay.png":
                png = _encode_overlay_png(service)
                if png is None:
                    self.send_error(404, "no localisation yet")
                    return
                body, ctype, code = png, "image/png", 200
            else:
                self.send_error(404)
                return
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    return HTTPServer(("127.0.0.1", port), Handler)


def _encode_overlay_png(service: LocalizerService) -> bytes | None:
    overlay = service.render_overlay()
    if overlay is None:
        return None
    try:
        import cv2
        ok, buf = cv2.imencode(".png", overlay[:, :, ::-1])
        return buf.tobytes() if ok else None
    except ImportError:
        import io
        import zlib
        # Minimal uncompressed-PNG fallback so the endpoint works without
        # OpenCV (pure stdlib: zlib level-0 deflate of filtered scanlines).
        h, w, _ = overlay.shape
        raw = b"".join(b"\x00" + overlay[y].tobytes() for y in range(h))

        def chunk(tag: bytes, data: bytes) -> bytes:
            crc = zlib.crc32(tag + data) & 0xFFFFFFFF
            return (len(data).to_bytes(4, "big") + tag + data
                    + crc.to_bytes(4, "big"))

        out = io.BytesIO()
        out.write(b"\x89PNG\r\n\x1a\n")
        ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes([8, 2, 0, 0, 0]))
        out.write(chunk(b"IHDR", ihdr))
        out.write(chunk(b"IDAT", zlib.compress(raw, 0)))
        out.write(chunk(b"IEND", b""))
        return out.getvalue()


def _status_page(service: LocalizerService) -> str:
    resp = service.last_response
    if resp is None:
        rows = "<p>No localisation served yet. POST to /localize.</p>"
        img = ""
    else:
        dets = resp.get("detections", [])
        rows = "<table border=1 cellpadding=4><tr><th>object</th>" \
               "<th>x</th><th>y</th><th>z</th></tr>"
        for d in dets:
            t = d["translation"]
            name = html.escape(str(d["name"]))
            rows += (f"<tr><td>{name}</td><td>{t[0]:.3f}</td>"
                     f"<td>{t[1]:.3f}</td><td>{t[2]:.3f}</td></tr>")
        rows += "</table>"
        img = '<p><img src="/overlay.png" alt="pose overlay"></p>'
    return ("<html><head><title>perception_tpu localizer</title></head>"
            "<body><h2>perception_tpu localizer</h2>"
            f"{rows}{img}</body></html>")


def main(argv=None) -> int:
    from perception_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--warmup", action="store_true",
                        help="compile the serving path at boot (one "
                             "synthetic localisation) so the first client "
                             "request is served at steady-state latency")
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
    if args.warmup:
        dt = recognizer.warmup()
        print(f"warmup: serving path compiled in {dt:.1f}s")
    server = serve(recognizer, args.port)
    print(f"perception_tpu localizer on :{args.port}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
