"""Synthetic ground-truth scene generation.

Replaces the reference `DatasetGenerator`
(sbpl_perception/src/utils/dataset_generator.cpp: render random valid object
placements through kinect_sim to produce labelled depth scenes for
experiments) using this framework's own renderer instead of an OpenGL
simulator.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from perception_tpu.core.pose import ContPose
from perception_tpu.core.state import ObjectState


@dataclasses.dataclass
class GeneratedScene:
    states: list[ObjectState]
    depth: np.ndarray        # [H, W] int32 cm
    color: np.ndarray        # [H, W, 3]
    label: np.ndarray        # [H, W] int32 1-based instance ids


class DatasetGenerator:
    def __init__(self, env, rng: np.random.Generator | None = None):
        """env: a PerceptionEnv whose model bank supplies the objects."""
        self.env = env
        self.rng = rng or np.random.default_rng(0)

    def sample_scene(
        self,
        num_objects: int | None = None,
        x_range: tuple[float, float] = (0.45, 0.75),
        y_range: tuple[float, float] = (-0.2, 0.2),
        z_range: tuple[float, float] = (-0.05, 0.05),
        yaw_only: bool = False,
        min_separation: float = 0.08,
        max_attempts: int = 100,
    ) -> GeneratedScene:
        """Random non-overlapping placements of distinct models, rendered to
        a labelled observation (dataset_generator.cpp GenerateHaltonPoses /
        GenerateScenes semantics, with rejection instead of Halton
        sequences)."""
        bank = self.env.bank
        n_models = len(bank.models)
        count = num_objects or self.rng.integers(1, n_models + 1)
        count = min(count, n_models)
        model_ids = self.rng.choice(n_models, size=count, replace=False)

        states: list[ObjectState] = []
        placed: list[np.ndarray] = []
        for mid in model_ids:
            for _ in range(max_attempts):
                pos = np.array([
                    self.rng.uniform(*x_range),
                    self.rng.uniform(*y_range),
                    self.rng.uniform(*z_range),
                ])
                if all(np.linalg.norm(pos[:2] - p[:2]) >= min_separation
                       for p in placed):
                    break
            else:
                continue
            placed.append(pos)
            if yaw_only:
                pose = ContPose.from_euler(
                    *pos, 0.0, 0.0, self.rng.uniform(0, 2 * np.pi))
            else:
                q = self.rng.normal(size=4)
                q /= np.linalg.norm(q)
                pose = ContPose.from_quat(*pos, *q)
            states.append(ObjectState(
                id=int(mid), symmetric=bank.models[mid].symmetric, pose=pose,
                segmentation_label_id=len(states) + 1))

        depth, color, label = self.env.render_composite(states)
        return GeneratedScene(states=states, depth=depth, color=color,
                              label=label)

    def write_scene(self, scene: GeneratedScene, out_dir: str,
                    name: str = "scene") -> dict:
        """Persist a generated scene as depth/color/label PNGs + GT json."""
        import cv2

        os.makedirs(out_dir, exist_ok=True)
        cv2.imwrite(os.path.join(out_dir, f"{name}-depth.png"),
                    (scene.depth * 10).astype(np.uint16))  # cm -> mm png
        cv2.imwrite(os.path.join(out_dir, f"{name}-color.png"),
                    scene.color[..., ::-1].astype(np.uint8))
        cv2.imwrite(os.path.join(out_dir, f"{name}-label.png"),
                    scene.label.astype(np.uint8))
        gt = {
            "objects": [
                {
                    "name": self.env.bank.models[s.id].name,
                    "pose": [s.pose.x, s.pose.y, s.pose.z,
                             *s.pose.quaternion()],
                    "label": s.segmentation_label_id,
                }
                for s in scene.states
            ],
            "depth_factor": 1000,
        }
        import json

        with open(os.path.join(out_dir, f"{name}-gt.json"), "w") as f:
            json.dump(gt, f, indent=2)
        return gt
