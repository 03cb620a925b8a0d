"""Detection-driven search heuristics.

Replaces the reference `RCNNHeuristicFactory`
(sbpl_perception/src/rcnn_heuristic_factory.cpp:124-519): per-object ROIs
(bounding boxes + detection scores, loaded from disk or passed in) turn into
heuristics that order/prune candidate poses for the tree search — a
candidate whose projected position falls far from its object's detected
bbox is expanded late (or pruned). The MHA* multi-queue machinery the
reference feeds these into becomes the candidate-ordering hook of
perception_tpu.pipeline.search.TreeSearch.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from perception_tpu.core.config import CameraIntrinsics
from perception_tpu.core.state import ObjectState


@dataclasses.dataclass
class Detection:
    name: str
    bbox: tuple[float, float, float, float]   # x1, y1, x2, y2 (pixels)
    score: float = 1.0

    @property
    def center(self) -> np.ndarray:
        return np.array([(self.bbox[0] + self.bbox[2]) / 2,
                         (self.bbox[1] + self.bbox[3]) / 2])


def load_detections(path: str) -> list[Detection]:
    """Load per-ROI detection files.

    Supports the reference's on-disk contract (one json with
    [{"name"/"category", "bbox", "score"}] — the factory's
    LoadHeuristicsFromDisk reads per-ROI bbox+score files) and plain lists.
    """
    with open(path) as f:
        raw = json.load(f)
    out = []
    for d in raw if isinstance(raw, list) else raw.get("detections", []):
        out.append(Detection(
            name=d.get("name") or d.get("category"),
            bbox=tuple(d["bbox"]),
            score=float(d.get("score", 1.0))))
    return out


class DetectionHeuristicFactory:
    def __init__(self, detections: list[Detection],
                 camera: CameraIntrinsics,
                 cam_to_world: np.ndarray | None = None):
        self.camera = camera
        self.world_to_cam = (np.linalg.inv(cam_to_world)
                             if cam_to_world is not None else np.eye(4))
        self.by_name: dict[str, Detection] = {}
        for d in detections:
            if d.name not in self.by_name or d.score > self.by_name[d.name].score:
                self.by_name[d.name] = d

    def _project(self, state: ObjectState) -> np.ndarray | None:
        p = self.world_to_cam @ np.array(
            [state.pose.x, state.pose.y, state.pose.z, 1.0])
        if p[2] <= 1e-6:
            return None
        cam = self.camera
        return np.array([cam.fx * p[0] / p[2] + cam.cx,
                         cam.fy * p[1] / p[2] + cam.cy])

    def heuristic(self, names: list[str]):
        """Candidate-ordering key: pixel distance of the candidate's
        projected centre to its object's detected bbox centre (the
        reference's per-queue heuristic value, rcnn_heuristic_factory.cpp
        GenericDetectionHeuristic)."""

        def h(state: ObjectState) -> float:
            name = names[state.id] if state.id < len(names) else None
            det = self.by_name.get(name)
            if det is None:
                return 0.0
            uv = self._project(state)
            if uv is None:
                return float("inf")
            return float(np.linalg.norm(uv - det.center))

        return h

    def prune(self, states: list[ObjectState], names: list[str],
              max_pixel_dist: float = 80.0) -> list[ObjectState]:
        """Drop candidates whose projection is far outside their detection."""
        h = self.heuristic(names)
        return [s for s in states if h(s) <= max_pixel_dist]


def save_rois(color_image: np.ndarray, detections: list[Detection],
              out_dir: str) -> list[str]:
    """Crop and save per-detection ROIs (the factory's SaveROIsToDisk used
    for offline CNN labelling)."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, d in enumerate(detections):
        x1, y1, x2, y2 = (int(v) for v in d.bbox)
        crop = color_image[max(y1, 0):y2, max(x1, 0):x2]
        path = os.path.join(out_dir, f"roi_{i}_{d.name}.png")
        cv2.imwrite(path, crop[..., ::-1])
        paths.append(path)
    return paths
