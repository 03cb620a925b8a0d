"""Graph states and discretisation for the pose search.

Mirrors the reference state layer (sbpl_perception/src/object_state.cpp,
graph_state.cpp, discretization_manager.cpp): continuous poses, discretised
poses for hashing/equality, object states tagged with model id + symmetry +
segmentation label, and order-independent graph-state hashing (replacing the
external sbpl_utils HashManager).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from perception_tpu.core.pose import ContPose


@dataclasses.dataclass(frozen=True)
class Discretizer:
    """World-grid discretiser (reference DiscretizationManager — a monostate;
    here a value object passed where needed)."""

    x_min: float = -1.0
    x_max: float = 1.0
    y_min: float = -1.0
    y_max: float = 1.0
    res: float = 0.04           # translation resolution (m)
    theta_res: float = math.pi / 8

    def disc_x(self, x: float) -> int:
        return int(round((x - self.x_min) / self.res))

    def cont_x(self, xd: int) -> float:
        return xd * self.res + self.x_min

    def disc_y(self, y: float) -> int:
        return int(round((y - self.y_min) / self.res))

    def cont_y(self, yd: int) -> float:
        return yd * self.res + self.y_min

    def disc_angle(self, theta: float) -> int:
        two_pi = 2 * math.pi
        norm = theta % two_pi
        return int(round(norm / self.theta_res)) % max(1, int(round(two_pi / self.theta_res)))

    def cont_angle(self, td: int) -> float:
        return td * self.theta_res


@dataclasses.dataclass(frozen=True)
class DiscPose:
    """Discretised pose used for equality/hashing (object_state.h DiscPose)."""

    x: int
    y: int
    z: int
    roll: int
    pitch: int
    yaw: int

    @classmethod
    def from_cont(cls, pose: ContPose, disc: Discretizer) -> "DiscPose":
        if pose.uses_euler:
            roll, pitch, yaw = pose.roll, pose.pitch, pose.yaw
        else:
            # Recover euler for hashing purposes (rarely used in 6-DoF mode,
            # where external_pose_id disambiguates instead).
            rot = pose.rotation()
            yaw = math.atan2(rot[1, 0], rot[0, 0])
            pitch = math.asin(max(-1.0, min(1.0, -rot[2, 0])))
            roll = math.atan2(rot[2, 1], rot[2, 2])
        return cls(
            x=disc.disc_x(pose.x), y=disc.disc_y(pose.y),
            z=int(round(pose.z / disc.res)),
            roll=disc.disc_angle(roll), pitch=disc.disc_angle(pitch),
            yaw=disc.disc_angle(yaw))


@dataclasses.dataclass(frozen=True)
class ObjectState:
    """One placed object: model id + symmetry + pose + segmentation label.

    Equality is discrete and symmetry-aware in the reference
    (object_state.cpp operator==: symmetric objects ignore yaw); here
    `hash_key` reproduces that for graph-state dedup.
    """

    id: int
    symmetric: bool
    pose: ContPose
    segmentation_label_id: int = 0
    external_pose_id: int = -1

    def hash_key(self, disc: Discretizer) -> tuple:
        if self.external_pose_id >= 0:
            return (self.id, self.external_pose_id)
        dp = DiscPose.from_cont(self.pose, disc)
        yaw = 0 if self.symmetric else dp.yaw
        return (self.id, dp.x, dp.y, dp.z, dp.roll, dp.pitch, yaw)


@dataclasses.dataclass(frozen=True)
class GraphState:
    """A scene state: set of placed objects (graph_state.h). Hash is
    order-independent (objects sorted by key)."""

    object_states: tuple[ObjectState, ...] = ()

    def append(self, obj: ObjectState) -> "GraphState":
        return GraphState(self.object_states + (obj,))

    @property
    def num_objects(self) -> int:
        return len(self.object_states)

    def hash_key(self, disc: Discretizer) -> tuple:
        return tuple(sorted(o.hash_key(disc) for o in self.object_states))


class StateHashManager:
    """State <-> id bijection (replaces the external sbpl_utils
    HashManager<GraphState>, search_env.h:26,541)."""

    def __init__(self, disc: Discretizer):
        self._disc = disc
        self._key_to_id: dict[tuple, int] = {}
        self._states: list[GraphState] = []

    def get_id(self, state: GraphState) -> int:
        key = state.hash_key(self._disc)
        sid = self._key_to_id.get(key)
        if sid is None:
            sid = len(self._states)
            self._key_to_id[key] = sid
            self._states.append(state)
        return sid

    def get_state(self, sid: int) -> GraphState:
        return self._states[sid]

    def __len__(self) -> int:
        return len(self._states)
