"""Multi-object scene search over composed states (PERCH 1.0 parity).

The reference solves multi-object scenes as graph search over "scene
states" (sets of placed objects) with an external MHA* planner
(sbpl_perch MHAPlanner::replan driving EnvObjectRecognition::GetSuccs /
GetLazySuccs, search_env.cpp:576-1023, 2653+; object_recognizer.cpp:402-521)
where edge costs come from rendering the new object on top of the composed
scene-so-far and measuring newly-unexplained points, distributed over MPI
ranks.

TPU-native re-design: the search tree is shallow (depth = number of
objects) and branching is wide (all poses of all unplaced models), so the
planner becomes host-side *beam search over levels* with the entire
frontier's successor costs evaluated in one batched device dispatch per
expansion — the MPI scatter/gather of single-edge evaluations becomes the
pose axis of `score_pose_batch`. Occlusion context is carried exactly as in
the reference: each state's composed depth image is the occlusion source
for its successors (GetComposedDepthImage, search_env.cpp:7492-7554).

beam_width=1 reproduces greedy commit ordering; wider beams approximate the
reference's focal-list exploration. An optional heuristic hook mirrors the
RCNN heuristic factory's candidate ordering (rcnn_heuristic_factory.cpp).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np

from perception_tpu.core.state import GraphState, ObjectState
from perception_tpu.utils.stats import EnvStats


@dataclasses.dataclass
class _Node:
    state: GraphState
    g: int                       # accumulated cost
    source_depth: np.ndarray     # composed strided depth (render units)
    source_label: np.ndarray     # composed strided labels (1-based model id)
    placed_ids: frozenset
    counted: np.ndarray | None = None   # [h, w] observed pixels already
                                        # claimed by placed objects
                                        # (counted_pixels mode)


class TreeSearch:
    def __init__(
        self,
        env,
        beam_width: int = 2,
        candidates_per_model: Sequence[ObjectState] | None = None,
        heuristic: Callable[[ObjectState], float] | None = None,
        max_successors_per_model: int = 512,
        lazy_k: int = 0,
        counted_pixels: bool = False,
    ):
        """lazy_k > 0 enables lazy successor evaluation (reference
        GetLazySuccs/GetTrueCost, search_env.cpp:2653+, 2846-2933): beyond
        the first level, candidates are ordered by their cached root-level
        cost (cheap estimate that ignores the newly composed occluders) and
        only the best lazy_k per model are re-scored against the node's
        composed source image.

        counted_pixels=True enables the reference's per-state observed-cost
        accounting (GetSourceCost + counted_pixels_map_,
        search_env.cpp:4137-4310, 658/731): each placed object CLAIMS the
        not-yet-counted observed pixels inside its mesh (6-DoF) or
        footprint (3-DoF), its source cost is the fraction of claimed
        pixels its own render leaves unexplained, and claimed pixels are
        excluded from every deeper level — no observed point is ever
        counted twice along a search branch."""
        self.env = env
        self.beam_width = beam_width
        self.counted_pixels = counted_pixels
        self.heuristic = heuristic
        self.max_successors_per_model = max_successors_per_model
        self.lazy_k = lazy_k
        self._root_costs: dict[tuple, int] = {}
        self._candidates = candidates_per_model
        # Single-object strided depth renders, keyed by candidate value:
        # each chosen object is rendered ONCE and composed from cache on
        # every later expansion that places it (the reference caches
        # per-object depth images the same way for lazy composition —
        # search_env.cpp:741-771, GetLazyCost:3060-3360).
        self._render_cache: dict[tuple, np.ndarray] = {}
        self.stats = EnvStats()

    # ------------------------------------------------------------------

    def _initial_candidates(self) -> dict[int, list[ObjectState]]:
        if self._candidates is not None:
            per_model: dict[int, list[ObjectState]] = {}
            for st in self._candidates:
                per_model.setdefault(st.id, []).append(st)
        else:
            per_model = {}
            for st in self.env.generate_successors_3dof():
                per_model.setdefault(st.id, []).append(st)
        if self.heuristic is not None:
            for mid in per_model:
                per_model[mid].sort(key=self.heuristic)
        for mid in per_model:
            per_model[mid] = per_model[mid][:self.max_successors_per_model]
        return per_model

    def _score_with_source(self, states: list[ObjectState],
                           source_depth, source_label):
        """Batch-score candidates against a specific composed source image."""
        import jax.numpy as jnp

        env = self.env
        saved = (env._source_depth, env._source_label, env._scene)
        env._source_depth = jnp.asarray(source_depth)
        env._source_label = jnp.asarray(source_label)
        env._scene = env._scene._replace(
            source_depth=env._source_depth, source_label=env._source_label)
        try:
            return env.score_object_states(states, do_icp=False)
        finally:
            env._source_depth, env._source_label, env._scene = saved

    @staticmethod
    def _state_key(st: ObjectState) -> tuple:
        """Value-based key for the lazy root-cost cache (keying by `id(st)`
        silently loses all entries when callers rebuild candidate pools)."""
        if st.external_pose_id >= 0:
            return (st.id, st.external_pose_id)
        p = st.pose
        return (st.id, round(p.x, 6), round(p.y, 6), round(p.z, 6),
                round(p.roll, 6), round(p.pitch, 6), round(p.yaw, 6))

    def _candidate_depths(self, states: list[ObjectState]) -> np.ndarray:
        """Strided single-object depth renders for each state, via the
        per-candidate cache (misses render in ONE batched dispatch)."""
        import jax.numpy as jnp

        from perception_tpu.ops.rasterizer import render_pose_batch

        env = self.env
        stride = int(env.perch.gpu_stride)
        miss = [s for s in states
                if self._state_key(s) not in self._render_cache]
        if miss:
            poses = np.stack([env.pose_to_camera(s) for s in miss]).astype(
                np.float32)
            ids = np.asarray([s.id for s in miss], np.int32)
            out = render_pose_batch(
                env._bank_tri_verts, env._bank_tri_colors,
                env._bank_tri_valid, jnp.asarray(poses), jnp.asarray(ids),
                env._proj, width=env.camera.width, height=env.camera.height,
                stride=stride, backend=env.env.kernel_backend,
                bank_backface=env._bank_backface)
            depths = np.asarray(out.depth).astype(np.int32)
            for s, d in zip(miss, depths):
                self._render_cache[self._state_key(s)] = d
                self.stats.scenes_rendered += 1
        return np.stack([self._render_cache[self._state_key(s)]
                         for s in states])

    def _observed_grid(self):
        """(obs_depth [h, w] render units, pts_cam [h, w, 3], pts_world)
        of the ORIGINAL observation, cached."""
        if getattr(self, "_obs_grid", None) is None:
            env = self.env
            stride = int(env.perch.gpu_stride)
            cam = env.camera
            depth = np.asarray(env._source_depth).astype(np.float64)
            ys, xs = np.mgrid[0:depth.shape[0], 0:depth.shape[1]]
            z = depth / env.env.gpu_depth_factor
            x = (xs * stride - cam.cx) / cam.fx * z
            y = (ys * stride - cam.cy) / cam.fy * z
            pts_cam = np.stack([x, y, z], axis=-1)
            c2w = env._input.cam_to_world
            pts_world = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
            self._obs_grid = (np.asarray(env._source_depth), pts_cam,
                              pts_world)
        return self._obs_grid

    def _counted_costs(self, node: _Node, scored: list) -> list[tuple]:
        """Reference counted-pixels true costs: for each survivor, the
        claimed-pixel mask and the corrected total cost
        (target% + unexplained-claimed%)."""
        env = self.env
        obs_depth, pts_cam, pts_world = self._observed_grid()
        valid = (obs_depth > 0) & (node.counted == 0)
        thresh = env.perch.sensor_resolution * env.env.gpu_depth_factor
        states = [su.state for su in scored]
        depths = self._candidate_depths(states)
        out = []
        for su, cand_depth in zip(scored, depths):
            model = env.bank.models[su.state.id]
            rad = model.inflation_factor * model.circumscribed_radius_3d
            if env._input.use_external_pose_list:
                # Candidate-radius prefilter (the reference's radiusSearch)
                # then exact mesh containment. Mesh transformed to the
                # camera frame; observed points are already camera-frame
                # (PointsInsideMesh semantics).
                center = su.adjusted_pose_cam[:3, 3]
                near = valid & (
                    ((pts_cam - center) ** 2).sum(axis=-1) <= rad * rad)
                inside = np.zeros_like(valid)
                if near.any():
                    inside[near] = model.points_inside(
                        pts_cam[near], transform=su.adjusted_pose_cam,
                        inflation=model.inflation_factor)
            else:
                p = su.state.pose
                near = valid & (
                    ((pts_world[..., :2] - [p.x, p.y]) ** 2).sum(axis=-1)
                    <= rad * rad)
                inside = np.zeros_like(valid)
                if near.any():
                    inside[near] = model.points_inside_footprint(
                        pts_world[near][:, :2],
                        yaw_cos_sin=(np.cos(p.yaw), np.sin(p.yaw)),
                        xy=(p.x, p.y))
            claimed = valid & inside
            explained = (cand_depth > 0) & (
                np.abs(cand_depth.astype(np.float64) - obs_depth) <= thresh)
            unexplained = claimed & ~explained
            n_claimed = int(claimed.sum())
            src = (100.0 * unexplained.sum() / n_claimed
                   if n_claimed else 100.0)
            out.append((int(su.target_cost + src), claimed))
        return out

    def _compose(self, node: _Node, obj: ObjectState):
        """Merge obj's (cached) single-object render into the node's
        composed source images. Cache hits skip the device round-trip
        entirely; min-depth composition of cached singles is exact (depth
        z-buffering commutes: compose(render(a), render(b)) ==
        render([a, b]), asserted in tests/test_search_e2e.py)."""
        key = self._state_key(obj)
        d = self._render_cache.get(key)
        if d is None:
            env = self.env
            depth, _, _ = env.render_composite([obj])
            stride = int(env.perch.gpu_stride)
            d = depth[::stride, ::stride].astype(np.int32)
            self._render_cache[key] = d
            self.stats.scenes_rendered += 1
        closer = (d > 0) & ((node.source_depth == 0) | (d < node.source_depth))
        new_depth = np.where(closer, d, node.source_depth)
        new_label = np.where(closer, obj.id + 1, node.source_label)
        return new_depth.astype(np.int32), new_label.astype(np.int32)

    # ------------------------------------------------------------------

    def plan(self) -> GraphState:
        env = self.env
        per_model = self._initial_candidates()
        if not per_model:
            return GraphState()

        stride = int(env.perch.gpu_stride)
        h = env.camera.height // stride
        w = env.camera.width // stride
        # Root: occlusion source = observed scene itself (so clutter in the
        # input can occlude candidates), labels empty.
        root_depth = np.asarray(env._source_depth)
        root = _Node(GraphState(), 0, root_depth,
                     np.zeros((h, w), np.int32), frozenset(),
                     counted=(np.zeros((h, w), bool)
                              if self.counted_pixels else None))
        frontier = [root]

        num_levels = len(per_model)
        for _ in range(num_levels):
            expansions: list[tuple[_Node, ObjectState]] = []
            scored_all: list = []
            for node in frontier:
                remaining = [m for m in per_model if m not in node.placed_ids]
                cands: list[ObjectState] = []
                for mid in remaining:
                    pool = per_model[mid]
                    if self.lazy_k and node.state.num_objects > 0:
                        # Lazy ordering by cached root-level cost; true-cost
                        # only the best lazy_k against the composed source.
                        pool = sorted(
                            pool,
                            key=lambda s: self._root_costs.get(
                                self._state_key(s), 10**9))[:self.lazy_k]
                    cands.extend(pool)
                if not cands:
                    continue
                self.stats.expands += 1
                scored = self._score_with_source(
                    cands, node.source_depth, node.source_label)
                if node.state.num_objects == 0:
                    for su, st in zip(scored, cands):
                        cost = su.cost if su.cost >= 0 else 10**9
                        self._root_costs[self._state_key(st)] = cost
                survivors = [su for su in scored if su.cost >= 0]
                if self.counted_pixels:
                    # True costs under the counted-pixels accounting; the
                    # claimed mask rides along to update the child's
                    # counted set (counted_pixels_map_ semantics).
                    for su, (cost, claimed) in zip(
                            survivors, self._counted_costs(node, survivors)):
                        expansions.append((node, su, cost, claimed))
                else:
                    expansions.extend(
                        (node, su, su.cost, None) for su in survivors)
                scored_all.extend(scored)

            if not expansions:
                break
            expansions.sort(key=lambda e: e[0].g + e[2])

            new_frontier: list[_Node] = []
            seen_keys = set()
            for node, su, cost, claimed in expansions:
                if len(new_frontier) >= self.beam_width:
                    break
                obj = su.state
                key = (node.placed_ids, obj.id,
                       round(obj.pose.x, 3), round(obj.pose.y, 3))
                if key in seen_keys:
                    continue
                seen_keys.add(key)
                depth, label = self._compose(node, obj)
                new_frontier.append(_Node(
                    state=node.state.append(obj),
                    g=node.g + cost,
                    source_depth=depth,
                    source_label=label,
                    placed_ids=node.placed_ids | {obj.id},
                    counted=(node.counted | claimed
                             if claimed is not None else None)))
            if not new_frontier:
                break
            frontier = new_frontier

        best = min(frontier, key=lambda n: n.g)
        self.stats.cost = best.g
        return best.state
