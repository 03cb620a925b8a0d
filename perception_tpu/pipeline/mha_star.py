"""Multi-Heuristic A* over scene states.

Faithful planner-level replacement for the reference's external
`sbpl_perch` improved-MHA* (`MHAPlanner::replan` driving
`EnvObjectRecognition::GetSuccs`, object_recognizer.cpp:402-521): an anchor
queue ordered by g + w1*h_anchor plus any number of inadmissible queues
(e.g. detection-distance heuristics from pipeline/heuristics.py — the
reference's RCNN queues), with round-robin expansion gated by
min_key_i <= w2 * min_key_anchor (Aine et al., SMHA*).

TPU-native twist: expanding a state evaluates *all* its successor edges in
one batched device dispatch against the state's composed occlusion context
— the role the reference gives its MPI scatter/gather
(ComputeCostsInParallel) is played by the pose axis of score_pose_batch.
`pipeline/search.py TreeSearch` remains as the cheap beam-search mode;
this module is the full-parity planner.
"""

from __future__ import annotations

import dataclasses
import heapq
import itertools
from typing import Callable, Sequence

import numpy as np

from perception_tpu.core.state import GraphState, ObjectState
from perception_tpu.utils.stats import EnvStats


@dataclasses.dataclass
class _Node:
    state: GraphState
    g: int
    source_depth: np.ndarray
    source_label: np.ndarray
    placed_ids: frozenset
    closed_anchor: bool = False
    closed_inad: bool = False


class MHAStarPlanner:
    def __init__(
        self,
        env,
        candidates_per_model: Sequence[ObjectState],
        heuristics: Sequence[Callable[[ObjectState], float]] = (),
        w1: float = 3.0,
        w2: float = 1.4,
        max_expansions: int = 200,
        max_successors_per_model: int = 256,
    ):
        self.env = env
        self.w1 = w1
        self.w2 = w2
        self.max_expansions = max_expansions
        self.stats = EnvStats()
        self._heuristics = list(heuristics)
        self._per_model: dict[int, list[ObjectState]] = {}
        for st in candidates_per_model:
            self._per_model.setdefault(st.id, []).append(st)
        for mid in self._per_model:
            self._per_model[mid] = \
                self._per_model[mid][:max_successors_per_model]
        self._counter = itertools.count()
        self._h_inad_mins: dict[int, dict[int, float]] = {}

    # -- heuristics ----------------------------------------------------

    def _h_anchor(self, node: _Node) -> float:
        """Admissible: 0 (edge costs can be 0 for a perfect placement)."""
        return 0.0

    def _h_inad(self, idx: int, node: _Node) -> float:
        """Inadmissible queue idx: mean detection-heuristic value over the
        cheapest candidate of each unplaced model (reference: heuristic of
        the state's last object; extended to remaining work).

        The value depends only on (idx, placed_ids); the per-model minima
        are additive, so precompute them once and sum — O(models) per push
        instead of O(models x candidates)."""
        mins = self._h_inad_mins.setdefault(idx, {
            mid: min(self._heuristics[idx](c) for c in cands)
            for mid, cands in self._per_model.items()})
        return sum(v for mid, v in mins.items()
                   if mid not in node.placed_ids)

    # -- expansion -----------------------------------------------------

    def _expand(self, node: _Node):
        from perception_tpu.pipeline.search import TreeSearch

        env = self.env
        remaining = [m for m in self._per_model if m not in node.placed_ids]
        cands: list[ObjectState] = []
        for mid in remaining:
            cands.extend(self._per_model[mid])
        if not cands:
            return []
        self.stats.expands += 1
        searcher = TreeSearch(env)  # reuse its source-swap scoring helper
        scored = searcher._score_with_source(
            cands, node.source_depth, node.source_label)
        out = []
        for su in scored:
            if su.cost < 0:
                continue
            obj = su.state
            depth, label = searcher._compose(node, obj)
            child = _Node(
                state=node.state.append(obj),
                g=node.g + su.cost,
                source_depth=depth,
                source_label=label,
                placed_ids=node.placed_ids | {obj.id})
            out.append(child)
        return out

    # -- main loop -----------------------------------------------------

    def plan(self) -> GraphState:
        env = self.env
        num_queues = 1 + len(self._heuristics)
        open_q: list[list] = [[] for _ in range(num_queues)]
        stride = int(env.perch.gpu_stride)
        h = env.camera.height // stride
        w = env.camera.width // stride
        root = _Node(GraphState(), 0, np.asarray(env._source_depth),
                     np.zeros((h, w), np.int32), frozenset())
        best_goal: _Node | None = None
        seen: dict[tuple, int] = {}

        def push(node: _Node):
            # Reference state identity: DiscPose-quantised, symmetry-aware
            # (graph_state.cpp operator== via DiscretizationManager).
            # env._disc is always set (PerceptionEnv.__init__/set_input).
            key = node.state.hash_key(env._disc)
            old = seen.get(key)
            if old is not None and old <= node.g:
                return
            seen[key] = node.g
            k0 = node.g + self.w1 * self._h_anchor(node)
            heapq.heappush(open_q[0], (k0, next(self._counter), node))
            for i in range(len(self._heuristics)):
                ki = node.g + self.w1 * self._h_inad(i, node)
                heapq.heappush(open_q[i + 1], (ki, next(self._counter), node))

        push(root)
        total_levels = len(self._per_model)
        expansions = 0
        rr = 0
        while open_q[0] and expansions < self.max_expansions:
            # Pick queue: round-robin over inadmissible queues whose min key
            # passes the anchor gate (SMHA*).
            anchor_key = open_q[0][0][0]
            qi = 0
            if len(open_q) > 1:
                for step in range(len(open_q) - 1):
                    cand = 1 + (rr + step) % (len(open_q) - 1)
                    if open_q[cand] and open_q[cand][0][0] <= self.w2 * anchor_key:
                        qi = cand
                        rr = (rr + step + 1) % (len(open_q) - 1)
                        break
            _, _, node = heapq.heappop(open_q[qi])

            # SMHA* closed lists: every push lands in all queues, so a node
            # would otherwise be re-expanded once per queue (each duplicate
            # is a full batched device dispatch). Anchor expansion closes a
            # node everywhere; inadmissible expansion closes it for the
            # inadmissible queues only (Aine et al.).
            if node.closed_anchor or (qi > 0 and node.closed_inad):
                continue
            if qi == 0:
                node.closed_anchor = True
                node.closed_inad = True
            else:
                node.closed_inad = True

            if node.state.num_objects == total_levels:
                if best_goal is None or node.g < best_goal.g:
                    best_goal = node
                break  # first goal under the gate: weighted-A*-style return

            expansions += 1
            for child in self._expand(node):
                if child.state.num_objects == total_levels:
                    if best_goal is None or child.g < best_goal.g:
                        best_goal = child
                push(child)
            if best_goal is not None and best_goal.g <= anchor_key:
                break

        self.stats.expands = expansions
        if best_goal is None:
            # Fall back to the deepest/cheapest partial assignment.
            frontier = [item[2] for q in open_q for item in q]
            if not frontier:
                return GraphState()
            best_goal = max(frontier,
                            key=lambda n: (n.state.num_objects, -n.g))
        self.stats.cost = best_goal.g
        return best_goal.state
