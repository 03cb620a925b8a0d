"""Frame-watch camera loop: robot integration without ROS.

TPU-native replacement for the reference's `perception_interface`
(object_recognition_node/src/perception_interface.cpp:57-320, component
C26): the reference subscribes to camera cloud/colour topics, waits for
a requested-objects trigger, filters the observation around the support
table, calls the LocalizeObjects ROS service, and republishes detected
poses + visualisation markers. Here the transport is the filesystem
instead of ROS topics — a watcher polls a spool directory for frame
drops, builds the LocalizeObjects payload (the same JSON contract
`serve.py` exposes over HTTP), dispatches it to an in-process
`LocalizerService` or a remote `serve.py` endpoint, and writes a
detections JSON next to the frames (the marker/pose publication
analogue a downstream consumer tails).

Frame contract per key (any filename prefix):

    <key>-depth.png      16-bit depth PNG (required; triggers processing)
    <key>-color.png      8-bit RGB (optional)
    <key>-labels.png     8-/16-bit instance mask, 1-based (optional)
    <key>-request.json   payload overrides: depth_factor, cam_to_world,
                         pose_lists, mode, segmented_object_names,
                         table_height (optional — the requested-objects
                         trigger analogue)

    <key>-detections.json   written on completion; its existence marks
                            the frame processed (restart-safe).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


class FrameWatcher:
    """Polls a spool directory and localises each new frame once."""

    def __init__(self, spool_dir: str, service=None, url: str | None = None,
                 depth_factor: float = 10000.0, poll_seconds: float = 0.5):
        if (service is None) == (url is None):
            raise ValueError("pass exactly one of service=, url=")
        self.spool_dir = spool_dir
        self.service = service
        self.url = url
        self.depth_factor = depth_factor
        self.poll_seconds = poll_seconds
        # key -> frame-file stat snapshot at the poll its processing last
        # failed; a failure is terminal only once the snapshot repeats
        # (the producer is non-atomic: a half-written depth.png decodes
        # to None and must be retried, not recorded as the frame's result).
        self._failed_snapshot: dict[str, tuple] = {}

    # -- frame discovery ---------------------------------------------------
    def pending_keys(self) -> list[str]:
        keys = []
        for name in sorted(os.listdir(self.spool_dir)):
            if not name.endswith("-depth.png"):
                continue
            key = name[: -len("-depth.png")]
            if not os.path.exists(self._path(key, "detections.json")):
                keys.append(key)
        return keys

    def _path(self, key: str, suffix: str) -> str:
        return os.path.join(self.spool_dir, f"{key}-{suffix}")

    # -- payload assembly (the LocalizeObjects.srv request analogue) ------
    def build_payload(self, key: str) -> dict:
        import cv2

        depth = cv2.imread(self._path(key, "depth.png"), cv2.IMREAD_UNCHANGED)
        if depth is None:
            raise ValueError(
                f"missing or undecodable depth PNG: {self._path(key, 'depth.png')}")
        payload: dict = {
            "depth_image": np.asarray(depth, np.float64).tolist(),
            "depth_factor": self.depth_factor,
            "mode": "greedy",
        }
        color_path = self._path(key, "color.png")
        if os.path.exists(color_path):
            bgr = cv2.imread(color_path)
            payload["color_image"] = bgr[:, :, ::-1].tolist()
        labels_path = self._path(key, "labels.png")
        if os.path.exists(labels_path):
            mask = cv2.imread(labels_path, cv2.IMREAD_UNCHANGED)
            payload["label_mask"] = np.asarray(mask, np.int64).tolist()
        req_path = self._path(key, "request.json")
        if os.path.exists(req_path):
            with open(req_path) as f:
                payload.update(json.load(f))
        return payload

    # -- dispatch ----------------------------------------------------------
    def _localize(self, payload: dict) -> dict:
        if self.service is not None:
            return self.service.handle(payload)
        import urllib.request

        req = urllib.request.Request(
            self.url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    def process(self, key: str) -> dict:
        t0 = time.perf_counter()
        result = self._localize(self.build_payload(key))
        result["frame"] = key
        result["latency_s"] = round(time.perf_counter() - t0, 3)
        out = self._path(key, "detections.json")
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=1)
        os.replace(tmp, out)   # atomic: consumers never see partial JSON
        self._write_overlay(key)
        return result

    def _write_overlay(self, key: str) -> None:
        """Pose-composited RGB next to the frame (the reference's
        pose_rgb_pub_ image publication, perception_interface.cpp:541).
        In-process mode only: a remote serve.py exposes the same image at
        GET /overlay.png instead."""
        if self.service is None:
            return
        try:
            overlay = self.service.render_overlay()
            if overlay is None:
                return
            import cv2

            cv2.imwrite(self._path(key, "overlay.png"),
                        overlay[:, :, ::-1])
        except Exception:
            pass   # visualisation must never fail the frame

    def _frame_snapshot(self, key: str) -> tuple:
        snap = []
        for suffix in ("depth.png", "color.png", "labels.png",
                       "request.json"):
            try:
                st = os.stat(self._path(key, suffix))
                snap.append((suffix, st.st_size, st.st_mtime_ns))
            except OSError:
                snap.append((suffix, None, None))
        return tuple(snap)

    def scan_once(self) -> list[str]:
        done = []
        for key in self.pending_keys():
            try:
                self.process(key)
            except Exception as e:
                # A malformed frame must not kill the loop (the reference's
                # topic callback logs and waits for the next frame) — and
                # must not retry hot. But the producer is non-atomic: a
                # frame picked up mid-write fails to decode and would be
                # permanently recorded as failed even though the writer was
                # about to finish. Gate on stability: only a frame whose
                # files are byte-identical (size/mtime) across two failing
                # polls is terminally recorded; otherwise retry next poll.
                snap = self._frame_snapshot(key)
                if self._failed_snapshot.get(key) != snap:
                    self._failed_snapshot[key] = snap
                    continue
                self._failed_snapshot.pop(key, None)
                with open(self._path(key, "detections.json"), "w") as f:
                    json.dump({"frame": key, "error": repr(e),
                               "detections": []}, f)
            else:
                self._failed_snapshot.pop(key, None)
            done.append(key)
        return done

    def run_forever(self) -> None:
        while True:
            for key in self.scan_once():
                print(f"localised frame {key}", flush=True)
            time.sleep(self.poll_seconds)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--spool", required=True, help="frame drop directory")
    parser.add_argument("--config", help="scene YAML (in-process recogniser)")
    parser.add_argument("--url", help="remote serve.py /localize endpoint")
    parser.add_argument("--depth-factor", type=float, default=10000.0)
    parser.add_argument("--poll-seconds", type=float, default=0.5)
    parser.add_argument("--warmup", action="store_true",
                        help="compile the scoring path before watching "
                             "(first frame served at steady-state latency)")
    args = parser.parse_args(argv)

    service = None
    if args.config:
        from perception_tpu.utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()
        import yaml

        from perception_tpu.core.config import (CameraIntrinsics, EnvConfig,
                                                PerchConfig)
        from perception_tpu.pipeline.recognizer import (ModelSpec,
                                                        ObjectRecognizer)
        from perception_tpu.serve import LocalizerService

        with open(args.config) as f:
            cfg = yaml.safe_load(f)
        cam = CameraIntrinsics(**cfg["camera"])
        service = LocalizerService(ObjectRecognizer(
            [ModelSpec(name=m["name"], path=m["path"])
             for m in cfg["model_bank"]],
            cam, PerchConfig.from_yaml_dict(cfg),
            EnvConfig.from_yaml_dict(cfg.get("env_params", {}))))
        if args.warmup:
            dt = service.recognizer.warmup()
            print(f"warmup: scoring path compiled in {dt:.1f}s", flush=True)
    elif not args.url:
        parser.error("pass --config (in-process) or --url (remote)")

    watcher = FrameWatcher(args.spool, service=service, url=args.url,
                           depth_factor=args.depth_factor,
                           poll_seconds=args.poll_seconds)
    print(f"watching {args.spool}", flush=True)
    watcher.run_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
