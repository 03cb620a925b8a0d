"""Recognition environment: observed-input processing + candidate scoring.

Host-side orchestration equal to the reference `EnvObjectRecognition`
(sbpl_perception/src/search_env.cpp) minus the MPI/ROS plumbing:

  * `set_input` mirrors SetInput (search_env.cpp:5862-6213): ingest the
    observed RGB-D frame + instance mask, build the strided label-partitioned
    observed cloud (device) and world-frame KD-trees (host) for validity
    pruning;
  * `score_object_states` mirrors ComputeGreedyCostsInParallelGPU
    (search_env.cpp:1782-2052): dispatch pose batches through the jitted
    scoring pipeline in gpu_batch_size chunks;
  * `compute_greedy_poses` mirrors ComputeGreedyRenderPoses
    (search_env.cpp:2462-2651): per-model argmin with the
    |target - source| < 30 consistency filter;
  * `set_observation_from_states` mirrors the simulated-GT fake-input path
    (SetObservation(object_ids, poses), search_env.cpp:5777-5824) used by
    integration tests.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Sequence

import numpy as np
import jax.numpy as jnp
from scipy.spatial import cKDTree

from perception_tpu.core.config import CameraIntrinsics, EnvConfig, PerchConfig
from perception_tpu.core.mesh import ModelBank
from perception_tpu.core.pose import CAM_TO_BODY, ContPose, world_to_optical_cam
from perception_tpu.core.state import Discretizer, GraphState, ObjectState
from perception_tpu.ops.cost import (
    COST_TYPE_3DOF_DEPTH,
    COST_TYPE_3DOF_RGBD,
    COST_TYPE_6DOF,
    COST_TYPE_6DOF_RGB,
)
from perception_tpu.ops.icp import cloud_normals
from perception_tpu.ops.pointcloud import observed_cloud_from_depth
from perception_tpu.pipeline.scorer import (
    ObservedScene,
    PoseScores,
    ScorerConfig,
    score_pose_batch,
)
from perception_tpu.utils.stats import EnvStats


def _resolve_streak_env(streak: int) -> int:
    """Fused-ICP early-exit overrides (PT_ICP_NO_EARLY_EXIT=1 disables,
    PT_ICP_STREAK=<n> sets the stagnation streak), applied host-side so
    the value reaching the jitted kernel is always an explicit static."""
    if os.environ.get("PT_ICP_NO_EARLY_EXIT"):
        return 10**9
    v = os.environ.get("PT_ICP_STREAK")
    return int(v) if v else streak


@dataclasses.dataclass
class RecognitionInput:
    """Observed scene input (reference RecognitionInput, utils/utils.h:31-80)."""

    depth_image: np.ndarray                 # [H, W] raw sensor units
    color_image: np.ndarray | None = None   # [H, W, 3]
    label_mask: np.ndarray | None = None    # [H, W] int, 1-based instances
    depth_factor: float = 100.0             # sensor units per metre
    cam_to_world: np.ndarray = dataclasses.field(
        default_factory=lambda: CAM_TO_BODY.copy())  # camera optical -> world
    segmented_object_names: list[str] = dataclasses.field(default_factory=list)
    # 3-DoF support-surface search region (world frame).
    x_min: float = -1.0
    x_max: float = 1.0
    y_min: float = -1.0
    y_max: float = 1.0
    table_height: float = 0.0
    use_external_pose_list: bool = True     # 6-DoF mode


@dataclasses.dataclass
class ScoredState:
    """Per-candidate result unit (reference CostComputationOutput)."""

    state: ObjectState
    cost: int
    target_cost: int       # rendered cost %
    source_cost: int       # observed cost %
    last_level_cost: int   # points-diff
    adjusted_pose_cam: np.ndarray  # [4, 4] model->camera (post-ICP)


class PerceptionEnv:
    def __init__(
        self,
        bank: ModelBank,
        camera: CameraIntrinsics,
        perch: PerchConfig | None = None,
        env: EnvConfig | None = None,
    ):
        self.bank = bank
        self.camera = camera
        self.perch = perch or PerchConfig()
        self.env = env or EnvConfig(width=camera.width, height=camera.height)
        self.stats = EnvStats()
        # World-grid discretiser for graph-state identity (the reference's
        # DiscretizationManager::Initialize from EnvConfig resolutions,
        # discretization_manager.cpp:20-45): MHA*/tree-search duplicate
        # detection goes through GraphState.hash_key(self._disc) so two
        # continuous poses in the same discrete cell deduplicate exactly as
        # the reference's DiscPose equality does. Bounds are refreshed with
        # the input's search region at set_input.
        self._disc = Discretizer(res=self.env.res,
                                 theta_res=self.env.theta_res)
        self._input: RecognitionInput | None = None
        self._observed = None
        self._seg_normals = None
        self._source_depth = None
        self._source_label = None
        self._world_kdtree: cKDTree | None = None
        self._seg_kdtrees: list[cKDTree | None] = []
        self.debug_dir: str | None = None
        self._proj = jnp.asarray(camera.projection())
        self._bank_tri_verts = jnp.asarray(bank.tri_verts)
        self._bank_tri_colors = jnp.asarray(bank.tri_colors)
        self._bank_tri_valid = jnp.asarray(bank.tri_valid)
        self._bank_backface = jnp.asarray(bank.backface_cull)
        samp, snrm = bank.surface_samples(env.icp_model_samples)
        self._bank_icp_samples = jnp.asarray(samp)
        self._bank_icp_normals = jnp.asarray(snrm)
        if env.render_lod and env.render_lod < bank.tri_valid.shape[1]:
            lod = bank.decimated(env.render_lod)
            self._render_bank = (jnp.asarray(lod.tri_verts),
                                 jnp.asarray(lod.tri_colors),
                                 jnp.asarray(lod.tri_valid),
                                 jnp.asarray(lod.backface_cull))
        else:
            self._render_bank = (self._bank_tri_verts, self._bank_tri_colors,
                                 self._bank_tri_valid, self._bank_backface)
        # Face colours in CIELAB, converted once: the colour-gated fused
        # cost renders Lab directly instead of converting [N, P, 3] RGB
        # every batch (scorer.py).
        from perception_tpu.ops.color import rgb_to_lab as _r2l

        self._render_bank_lab = jnp.asarray(_r2l(self._render_bank[1]))

    # ------------------------------------------------------------------
    # Input processing
    # ------------------------------------------------------------------

    def _build_scene(self, rin: RecognitionInput, stride: int):
        """Observed-scene device tensors at a given pixel stride. Point
        capacities scale with the pixel density so finer strides don't
        truncate clouds."""
        cam, env = self.camera, self.env
        cap_scale = max(1, (int(self.perch.gpu_stride) // stride) ** 2)
        h, w = rin.depth_image.shape
        assert (h, w) == (cam.height, cam.width), "depth image size mismatch"
        color = rin.color_image if rin.color_image is not None else np.zeros(
            (h, w, 3), np.float32)
        if rin.use_external_pose_list:
            label = rin.label_mask
            assert label is not None, "6-DoF mode needs an instance mask"
        else:
            label = np.ones((h, w), np.int32)

        use_label = bool(rin.use_external_pose_list)
        bounds = None
        cam_to_world = jnp.asarray(rin.cam_to_world.astype(np.float32))
        use_bounds = not use_label
        if use_bounds:
            bounds = jnp.asarray([
                rin.x_max, rin.x_min, rin.y_max, rin.y_min,
                rin.table_height + 2.0, rin.table_height - 0.01,
            ], jnp.float32)

        observed = observed_cloud_from_depth(
            jnp.asarray(np.ascontiguousarray(rin.depth_image, np.float32)),
            jnp.asarray(np.ascontiguousarray(color, np.float32)),
            jnp.asarray(np.ascontiguousarray(label, np.int32)),
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            width=cam.width, height=cam.height, stride=stride,
            depth_factor=float(rin.depth_factor),
            max_points=env.max_observed_points * cap_scale,
            seg_cap=env.max_points_per_label * cap_scale,
            num_labels=env.max_labels,
            use_label_filter=use_label,
            use_bounds_filter=use_bounds,
            bounds=bounds,
            cam_to_world=cam_to_world)

        # Normals for point-to-plane refinement (per segment).
        seg_normals = cloud_normals(observed.seg_xyz, observed.seg_valid, k=10)

        # Strided source images in render units (int cm): the occlusion
        # comparison input (search_env.cpp:2484-2498 depth division).
        division = float(rin.depth_factor) / env.gpu_depth_factor
        src = rin.depth_image[::stride, ::stride].astype(np.float64) / division
        source_depth = jnp.asarray(src.astype(np.int32))
        source_label = jnp.asarray(label[::stride, ::stride].astype(np.int32))

        # Organised observed maps (strided grid) for projective ICP
        # association (the reference's Scene_projective strategy).
        h_s, w_s = src.shape
        npix = h_s * w_s
        pix_idx = np.asarray(observed.pixel)
        valid_pts = np.asarray(observed.valid)
        map_xyz = np.zeros((npix, 3), np.float32)
        map_normals = np.zeros((npix, 3), np.float32)
        map_valid = np.zeros((npix,), bool)
        map_label = np.full((npix,), -1, np.int32)
        sel = pix_idx[valid_pts]
        map_xyz[sel] = np.asarray(observed.xyz)[valid_pts]
        map_label[sel] = np.asarray(observed.label)[valid_pts]
        map_valid[sel] = True
        whole_normals = np.asarray(cloud_normals(
            observed.xyz[None], observed.valid[None], k=10))[0]
        map_normals[sel] = whole_normals[valid_pts]
        from perception_tpu.ops.color import rgb_to_lab

        # Frame-invariant ICP target crop (icp_crop_share="label"): one
        # selection per segment, packed once — every scoring batch of this
        # frame reuses it (scorer.py ObservedScene.seg_pk_crop).
        seg_pk_crop = None
        k_crop = int(env.icp_crop_targets or 0)
        # PT_CROP_PRECOMP=1: host-side A/B knob — precompute the label
        # crop once per frame (ObservedScene.seg_pk_crop) instead of the
        # scorer's inline branch. Priced a quantified NEGATIVE on-chip
        # (round 5, paired, same semantics): feeding the cropped pack as
        # a jit INPUT measures 73.3k poses/s where the in-graph inline
        # crop measures 105.3k — XLA schedules the in-graph producer far
        # better than the equivalent input-fed gather (both reproduced
        # twice). Default stays inline.
        precomp = os.environ.get("PT_CROP_PRECOMP", "0") == "1"
        if (precomp and env.icp_crop_share == "label" and 0 < k_crop
                and k_crop < observed.seg_xyz.shape[1]):
            from perception_tpu.ops.icp import crop_targets
            from perception_tpu.ops.pallas_icp import pack_targets

            seg_pk = pack_targets(observed.seg_xyz, observed.seg_valid,
                                  seg_normals)
            segc = (jnp.sum(observed.seg_xyz
                            * observed.seg_valid[..., None], axis=1)
                    / jnp.maximum(
                        observed.seg_valid.sum(axis=1), 1)[:, None])
            cidx_l = crop_targets(observed.seg_xyz, observed.seg_valid,
                                  segc, k_crop, mode=env.icp_crop_mode)
            seg_pk_crop = jnp.take_along_axis(
                seg_pk, cidx_l[..., None], axis=1)

        scene = ObservedScene(
            seg_xyz=observed.seg_xyz, seg_rgb=observed.seg_rgb,
            seg_lab=jnp.asarray(rgb_to_lab(observed.seg_rgb)),
            seg_valid=observed.seg_valid, seg_normals=seg_normals,
            seg_pk_crop=seg_pk_crop,
            map_xyz=jnp.asarray(map_xyz),
            map_normals=jnp.asarray(map_normals),
            map_valid=jnp.asarray(map_valid),
            map_label=jnp.asarray(map_label),
            source_depth=source_depth,
            source_label=source_label)
        return scene, observed, seg_normals

    def set_input(self, rin: RecognitionInput) -> None:
        t0 = time.perf_counter()
        self._input = rin
        self._disc = Discretizer(
            x_min=rin.x_min, x_max=rin.x_max,
            y_min=rin.y_min, y_max=rin.y_max,
            res=self.env.res, theta_res=self.env.theta_res)
        stride = int(self.perch.gpu_stride)
        self._scene, self._observed, self._seg_normals = self._build_scene(
            rin, stride)
        self._source_depth = self._scene.source_depth
        self._source_label = self._scene.source_label
        # Optional finer-stride scene for coarse-to-fine re-scoring.
        self._scene_fine = None
        self._observed_fine = None
        if self.env.fine_stride and self.env.fine_stride < stride:
            self._scene_fine, self._observed_fine, _ = self._build_scene(
                rin, int(self.env.fine_stride))

        # Host-side world-frame KD-trees for validity checks
        # (SetObservation's knn / segmented_object_knn, search_env.cpp:5542+).
        xyz = np.asarray(self._observed.xyz)
        valid = np.asarray(self._observed.valid)
        labels = np.asarray(self._observed.label)
        pts_cam = xyz[valid]
        pts_world = pts_cam @ rin.cam_to_world[:3, :3].T + rin.cam_to_world[:3, 3]
        self._world_points = pts_world
        self._world_labels = labels[valid]
        self._world_kdtree = cKDTree(pts_world) if len(pts_world) else None
        self._seg_kdtrees = []
        for l in range(self.env.max_labels):
            seg = pts_world[self._world_labels == l]
            self._seg_kdtrees.append(cKDTree(seg) if len(seg) else None)
        self.stats.input_time = time.perf_counter() - t0

    def set_observation_from_states(
        self, states: Sequence[ObjectState],
        noise_std: float = 0.0,
        rng: np.random.Generator | None = None,
        sensor=None,
    ) -> None:
        """Simulated ground-truth input: render the given scene state and use
        it as the observation (reference fake-input path,
        search_env.cpp:5777-5824). Labels are assigned per object in order.

        `sensor` (eval.sensor_model.SensorModel) degrades the rendered
        observation the way the reference's simulator does before scoring
        (kinect_sim addNoise, range_likelihood.cpp:1203-1241): Gaussian +
        quantisation depth noise, edge dropout, colour perturbation.
        Without it the observation is bit-identical to the candidate
        renderer's output at GT — fine for unit tests, circular for
        accuracy claims. `noise_std` is the legacy plain-Gaussian knob.
        """
        depth, color, label = self.render_composite(states)
        depth_m = depth.astype(np.float64) / self.env.gpu_depth_factor
        if sensor is not None:
            rng = rng or np.random.default_rng(0)
            depth_m, color = sensor.apply(depth_m, color, rng)
            # Dropped pixels keep their instance label: the reference's
            # masks come from a CNN/GT mask, not from depth validity, and
            # segment packing filters depth<=0 itself.
        elif noise_std > 0:
            rng = rng or np.random.default_rng(0)
            depth_m[depth_m > 0] += rng.normal(0, noise_std, (depth_m > 0).sum())
        rin = RecognitionInput(
            depth_image=(depth_m * 100.0),     # store in cm, factor 100
            color_image=color,
            label_mask=label,
            depth_factor=100.0,
            cam_to_world=CAM_TO_BODY.copy(),
            segmented_object_names=[self.bank.models[s.id].name for s in states],
            use_external_pose_list=True,
        )
        self.set_input(rin)

    def render_composite(self, states: Sequence[ObjectState]):
        """Render a multi-object scene into one depth/color/label image at
        full stride-1 resolution (reference single_result_image mode)."""
        cam = self.camera
        from perception_tpu.ops.rasterizer import render_pose_batch

        poses = np.stack([self.pose_to_camera(s) for s in states])
        ids = np.asarray([s.id for s in states], np.int32)
        out = render_pose_batch(
            self._bank_tri_verts, self._bank_tri_colors, self._bank_tri_valid,
            jnp.asarray(poses.astype(np.float32)), jnp.asarray(ids),
            self._proj, width=cam.width, height=cam.height, stride=1,
            tile=min(256, self.bank.tri_verts.shape[1]))
        depths = np.asarray(out.depth)   # [N, H, W]
        colors = np.asarray(out.color)
        empty = depths == 0
        depths_inf = np.where(empty, np.iinfo(np.int32).max, depths)
        winner = depths_inf.argmin(axis=0)
        depth = np.take_along_axis(depths_inf, winner[None], axis=0)[0]
        depth = np.where(depth == np.iinfo(np.int32).max, 0, depth)
        color = np.take_along_axis(
            colors, winner[None, ..., None], axis=0)[0]
        label = np.where(depth > 0, winner + 1, 0).astype(np.int32)
        return depth, color, label

    # ------------------------------------------------------------------
    # Pose transforms
    # ------------------------------------------------------------------

    def pose_to_camera(self, state: ObjectState) -> np.ndarray:
        """World-frame ContPose -> model->camera matrix incl. preprocessing
        (search_env.cpp:1555-1575)."""
        cam_to_world = (self._input.cam_to_world if self._input is not None
                        else CAM_TO_BODY.copy())
        # cam_to_world here maps optical camera frame -> world directly;
        # reference composes cam_to_world_ (body) with CAM_TO_BODY. We store
        # the optical transform, so the inverse is direct.
        cam_matrix = np.linalg.inv(cam_to_world)
        transform = state.pose.transform()
        pre = self.bank.models[state.id].preprocessing_transform
        return (cam_matrix @ transform @ pre).astype(np.float32)

    def camera_to_world_pose(self, mat_cam: np.ndarray, model_id: int,
                             remove_preprocessing: bool = True) -> ContPose:
        """Inverse of pose_to_camera for reporting adjusted poses
        (search_env.cpp:1996-2012)."""
        cam_to_world = self._input.cam_to_world
        m = cam_to_world @ mat_cam
        if remove_preprocessing:
            pre = self.bank.models[model_id].preprocessing_transform
            m = m @ np.linalg.inv(pre)
        return ContPose.from_matrix(m)

    # ------------------------------------------------------------------
    # Validity pruning (IsValidPose, search_env.cpp:309-528)
    # ------------------------------------------------------------------

    def is_valid_pose(self, state: ObjectState, placed: GraphState | None = None,
                      after_refinement: bool = False) -> bool:
        model = self.bank.models[state.id]
        perch, env = self.perch, self.env
        p = np.array([state.pose.x, state.pose.y, state.pose.z])

        grid_rad = 0.0 if after_refinement else float(np.hypot(env.res / 2, env.res / 2))
        min_pts = perch.min_neighbor_points_for_valid_pose

        if self._input is not None and self._input.use_external_pose_list:
            rad = max(model.inflation_factor * model.circumscribed_radius_3d,
                      grid_rad)
            tree = None
            if 0 <= state.segmentation_label_id - 1 < len(self._seg_kdtrees):
                tree = self._seg_kdtrees[state.segmentation_label_id - 1]
            if tree is None:
                tree = self._world_kdtree
            if tree is None:
                return False
            count = len(tree.query_ball_point(p, rad))
            if count < min_pts:
                return False
        else:
            rad = max(model.circumscribed_radius, grid_rad)
            if self._world_kdtree is None:
                return False
            # Projected (x, y) search like the reference's projected_knn_.
            xy = self._world_points[:, :2]
            d2 = ((xy - p[:2]) ** 2).sum(axis=1)
            if (d2 <= rad * rad).sum() < min_pts:
                return False
            # Pairwise inscribed-circle collision with already-placed objects.
            if placed is not None:
                r1 = model.inscribed_radius
                for other in placed.object_states:
                    r2 = self.bank.models[other.id].inscribed_radius
                    dx = state.pose.x - other.pose.x
                    dy = state.pose.y - other.pose.y
                    if dx * dx + dy * dy < (r1 + r2) ** 2:
                        return False
            # Footprint within the support surface bounds.
            hull = model.footprint_hull()
            rot = state.pose.rotation()[:2, :2]
            fp = hull @ rot.T + [state.pose.x, state.pose.y]
            tol = perch.footprint_tolerance
            rin = self._input
            if ((fp[:, 0] < rin.x_min - tol).any()
                    or (fp[:, 0] > rin.x_max + tol).any()
                    or (fp[:, 1] < rin.y_min - tol).any()
                    or (fp[:, 1] > rin.y_max + tol).any()):
                return False
        return True

    # ------------------------------------------------------------------
    # Scoring
    # ------------------------------------------------------------------

    @staticmethod
    def _resolve_icp_mode(mode: str) -> str:
        if mode != "auto":
            return mode
        from perception_tpu.ops.rasterizer import default_backend

        return "fused" if default_backend() == "pallas" else "nn"

    def _scorer_config(self, do_icp: bool | None = None,
                       stride: int | None = None) -> ScorerConfig:
        """Build the device-side config. Env-var knobs (PT_ICP_*) are
        resolved HERE, in host code, on every call: the jitted kernels only
        ever see explicit static arguments, so in-process A/B runs that
        mutate os.environ between calls get fresh values instead of a
        stale traced capture."""
        cam, perch, env = self.camera, self.perch, self.env
        six_dof = self._input.use_external_pose_list
        if six_dof:
            cost_type = (COST_TYPE_6DOF_RGB if perch.use_color_cost
                         else COST_TYPE_6DOF)
        elif perch.use_color_cost:
            cost_type = COST_TYPE_3DOF_RGBD
        else:
            cost_type = COST_TYPE_3DOF_DEPTH
        if do_icp is None:
            do_icp = perch.icp_type == 3
        stride = int(stride or perch.gpu_stride)
        roi = None
        if env.roi_size:
            # Keep the ROI's physical extent constant across strides.
            scale = int(perch.gpu_stride) // stride
            roi = (min(env.roi_size * scale, cam.height // stride),
                   min(env.roi_size * scale, cam.width // stride))
        cap_scale = max(1, (int(perch.gpu_stride) // stride) ** 2)
        return ScorerConfig(
            width=cam.width, height=cam.height, stride=stride,
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            max_points_per_pose=env.max_points_per_pose * cap_scale,
            cost_type=cost_type,
            sensor_resolution=perch.sensor_resolution,
            color_distance_threshold=perch.color_distance_threshold,
            occlusion_threshold=perch.gpu_occlusion_threshold,
            use_segmentation_label=six_dof,
            use_tree_occlusion=perch.use_tree_occlusion,
            do_icp=do_icp,
            icp_mode=self._resolve_icp_mode(env.icp_mode),
            icp_max_iterations=min(perch.max_icp_iterations, 60),
            icp_max_correspondence=perch.icp_max_correspondence,
            icp_downsample=env.icp_downsample,
            icp_render_scale=env.icp_render_scale,
            icp_crop_targets=env.icp_crop_targets,
            icp_crop_mode=env.icp_crop_mode,
            cost_crop_targets=env.cost_crop_targets,
            icp_source=env.icp_source,
            cost_cloud=env.cost_cloud,
            cost_aug_samples=env.cost_aug_samples,
            icp_gicp_epsilon=env.icp_gicp_epsilon,
            icp_d2d_symmetric=env.icp_d2d_symmetric,
            icp_nn_every=env.icp_nn_every,
            icp_assoc_trigger=env.icp_assoc_trigger,
            icp_crop_share=env.icp_crop_share,
            icp_gather=env.icp_gather,
            icp_exact_nn_every=env.icp_exact_nn_every,
            icp_stagnation_streak=_resolve_streak_env(
                env.icp_stagnation_streak),
            depth_factor=env.gpu_depth_factor,
            roi_shape=roi,
            backend=env.kernel_backend,
            use_clutter_mode=perch.use_clutter_mode,
            clutter_regularizer=perch.clutter_regularizer,
        )

    def score_object_states(
        self, states: Sequence[ObjectState], do_icp: bool | None = None,
        fine: bool = False,
    ) -> list[ScoredState]:
        """Score candidate single-object placements in gpu_batch_size chunks.

        fine=True re-scores against the finer-stride scene (requires
        EnvConfig.fine_stride; used by the coarse-to-fine greedy pass).
        """
        assert self._observed is not None, "call set_input first"
        if fine:
            assert self._scene_fine is not None, "EnvConfig.fine_stride unset"
            cfg = self._scorer_config(do_icp, stride=self.env.fine_stride)
            obs = self._observed_fine
            scene = self._scene_fine
        else:
            cfg = self._scorer_config(do_icp)
            obs = self._observed
            scene = self._scene
        seg_count = np.asarray(obs.seg_count, np.float32)
        total_points = float(np.asarray(obs.count))

        results: list[ScoredState] = []
        batch = int(self.perch.gpu_batch_size)
        for start in range(0, len(states), batch):
            chunk = list(states[start:start + batch])
            n = len(chunk)
            # Pad the last chunk to the full batch size: one compiled shape
            # for every dispatch (the reference's fixed gpu_batch_size
            # chunking; padded entries are dropped below).
            if n < batch:
                chunk = chunk + [chunk[0]] * (batch - n)
            poses = np.stack([self.pose_to_camera(s) for s in chunk])
            ids = np.asarray([s.id for s in chunk], np.int32)
            labels = np.asarray(
                [max(s.segmentation_label_id - 1, 0) for s in chunk], np.int32)
            if self._input.use_external_pose_list:
                observed_total = seg_count[labels]
            elif self.perch.use_cylinder_observed:
                # Observed points inside each pose's inflated circumscribing
                # cylinder (projected x/y search — GetStateImagesUnifiedGPU,
                # search_env.cpp:1593-1613).
                observed_total = np.empty(len(chunk), np.float32)
                xy = self._world_points[:, :2]
                for i, st in enumerate(chunk):
                    model = self.bank.models[st.id]
                    rad = model.inflation_factor * model.circumscribed_radius
                    d2 = ((xy - [st.pose.x, st.pose.y]) ** 2).sum(axis=1)
                    observed_total[i] = float((d2 <= rad * rad).sum())
            else:
                observed_total = np.full(len(chunk), total_points, np.float32)

            t0 = time.perf_counter()
            rb_verts, rb_colors, rb_valid, rb_backface = self._render_bank
            scores: PoseScores = score_pose_batch(
                rb_verts, rb_colors, rb_valid,
                jnp.asarray(poses.astype(np.float32)), jnp.asarray(ids),
                jnp.asarray(labels), jnp.asarray(observed_total),
                self._proj, scene, cfg,
                bank_backface=rb_backface,
                bank_icp_samples=self._bank_icp_samples,
                bank_icp_normals=self._bank_icp_normals,
                bank_tri_lab=self._render_bank_lab)
            total = np.asarray(scores.total_cost)
            rendered = np.asarray(scores.rendered_cost)
            observed = np.asarray(scores.observed_cost)
            diff = np.asarray(scores.points_diff_cost)
            adjusted = np.asarray(scores.adjusted_poses)
            self.stats.gpu_time += time.perf_counter() - t0
            self.stats.scenes_rendered += n

            for i, st in enumerate(chunk[:n]):
                # (100, 100) degenerate diff rule (search_env.cpp:2030-2033).
                d = diff[i]
                if int(rendered[i]) == 100 and int(observed[i]) == 100:
                    d = 100.0
                results.append(ScoredState(
                    state=st,
                    cost=int(total[i]),
                    target_cost=int(rendered[i]),
                    source_cost=int(observed[i]),
                    last_level_cost=int(d),
                    adjusted_pose_cam=adjusted[i],
                ))
        return results

    # ------------------------------------------------------------------
    # Greedy recognition (PERCH 2.0 flagship path)
    # ------------------------------------------------------------------

    def compute_greedy_poses(
        self, candidates: Sequence[ObjectState], do_icp: bool | None = None,
        collision_ordering: bool = False,
    ) -> tuple[GraphState, list[ScoredState]]:
        """Per-model argmin over scored candidates with the
        |target - source| < 30 filter (search_env.cpp:2542-2583).

        collision_ordering=True (3-DoF mode) replaces the independent
        per-model argmin with the reference greedy-ICP baseline's commit
        ordering (ComputeGreedyICPPoses, search_env.cpp:6500-6766): every
        permutation of model commit order is tried, each model commits its
        cheapest candidate that does not collide with already-committed
        objects (IsValidPose(committed_state, ...) — the inscribed-circle
        pairwise check), and the cheapest-total permutation wins. Without
        it, two models can claim the same physical object (no segmentation
        labels separate instances in 3-DoF mode).

        With EnvConfig.fine_stride set, the best fine_top_k candidates per
        model (post-refinement poses) are re-scored at the finer stride and
        the final argmin uses the fine costs (coarse-to-fine; no reference
        analogue — the reference runs one stride).
        """
        t0 = time.perf_counter()
        scored = self.score_object_states(candidates, do_icp)

        if self._scene_fine is not None:
            survivors = [su for su in scored
                         if su.cost >= 0
                         and abs(su.target_cost - su.source_cost) < 30]
            # Group by the same key the final argmin uses: (model, segment)
            # in 6-DoF external-pose-list mode, so one dominant instance of
            # a model cannot claim every fine_top_k slot and starve other
            # segments of the same model.
            six = (self._input is not None
                   and self._input.use_external_pose_list)
            groups: dict[tuple, list[ScoredState]] = {}
            for su in survivors:
                key = ((su.state.id, su.state.segmentation_label_id)
                       if six else (su.state.id,))
                groups.setdefault(key, []).append(su)
            top: list[ScoredState] = []
            for key in sorted(groups):
                per = sorted(groups[key], key=lambda su: su.cost)
                top.extend(per[:self.env.fine_top_k])
            if top:
                # Re-score the refined poses at the fine stride (no second
                # refinement round).
                fine_states = []
                for su in top:
                    pose = self.camera_to_world_pose(
                        su.adjusted_pose_cam, su.state.id)
                    fine_states.append(dataclasses.replace(
                        su.state, pose=pose))
                scored = self.score_object_states(
                    fine_states, do_icp=False, fine=True)

        # Argmin per recognised object. In 6-DoF mode an "object" is a
        # (model, segment) pair — several instances of the SAME model in
        # different segments each get their own winner (the reference's
        # per-segmented-object contract, run_sameshape_gpu); in 3-DoF grid
        # mode it stays per model.
        six_dof = (self._input is not None
                   and self._input.use_external_pose_list)
        if collision_ordering and not six_dof:
            best = self._commit_with_collisions(scored)
        else:
            best = {}
            for su in scored:
                if su.cost in (-1, -2):
                    continue
                if abs(su.target_cost - su.source_cost) >= 30:
                    continue
                mid = su.state.id
                key = (mid, su.state.segmentation_label_id) if six_dof \
                    else (mid,)
                if key not in best or su.cost < best[key].cost:
                    best[key] = su
        if self.env.pose_refinement_rounds and best:
            best = self._refine_winners(best, do_icp, six_dof)

        state = GraphState()
        chosen = []
        for key in sorted(best):
            su = best[key]
            mid = su.state.id
            adjusted_pose = self.camera_to_world_pose(
                su.adjusted_pose_cam, mid, remove_preprocessing=True)
            adj_state = ObjectState(
                id=mid, symmetric=su.state.symmetric, pose=adjusted_pose,
                segmentation_label_id=su.state.segmentation_label_id)
            state = state.append(adj_state)
            chosen.append(dataclasses.replace(su, state=adj_state))
        self.stats.time = time.perf_counter() - t0
        if self.perch.vis_expanded_states and self.debug_dir and state.num_objects:
            # Final greedy-state dump (reference PrintStateGPU at the end of
            # ComputeGreedyRenderPoses, search_env.cpp:2645).
            from perception_tpu.utils.debug import save_batch_grid, save_depth_image

            depth, color, _ = self.render_composite(state.object_states)
            save_depth_image(depth, f"{self.debug_dir}/depth_greedy_state.png")
            import cv2

            cv2.imwrite(f"{self.debug_dir}/color_greedy_state.png",
                        color[..., ::-1].astype(np.uint8))
        self.stats.scenes_valid = sum(1 for s in scored if s.cost >= 0)
        return state, chosen

    def _commit_with_collisions(
            self, scored: Sequence[ScoredState]) -> dict:
        """Reference greedy commit ordering (ComputeGreedyICPPoses,
        search_env.cpp:6500-6766): try model permutations, committing each
        model's cheapest non-colliding candidate; cheapest total wins.
        Scores are already computed, so this is pure host bookkeeping."""
        import itertools

        per_model: dict[int, list[ScoredState]] = {}
        adj_world: dict[int, ObjectState] = {}
        for i, su in enumerate(scored):
            if su.cost in (-1, -2):
                continue
            if abs(su.target_cost - su.source_cost) >= 30:
                continue
            per_model.setdefault(su.state.id, []).append(su)
            # Collision checks run on the post-ICP world pose (the pose
            # that will actually be committed).
            adj_world[id(su)] = dataclasses.replace(
                su.state, pose=self.camera_to_world_pose(
                    su.adjusted_pose_cam, su.state.id))
        for mid in per_model:
            per_model[mid].sort(key=lambda su: su.cost)
        mids = sorted(per_model)
        # The reference fixes 100 as the missing-model score; costs here are
        # target% + source% <= 200, so 200 keeps "place if at all possible".
        miss_penalty = 200
        orders = (itertools.permutations(mids) if len(mids) <= 5
                  else [tuple(sorted(
                      mids, key=lambda m: per_model[m][0].cost))])
        best_total, best_sel = None, {}
        for order in orders:
            placed = GraphState()
            sel: dict[tuple, ScoredState] = {}
            total = 0
            for mid in order:
                chosen = None
                for su in per_model[mid]:
                    if self.is_valid_pose(adj_world[id(su)], placed=placed,
                                          after_refinement=True):
                        chosen = su
                        break
                if chosen is None:
                    total += miss_penalty
                    continue
                total += chosen.cost
                sel[(mid,)] = chosen
                placed = placed.append(adj_world[id(chosen)])
            if best_total is None or total < best_total:
                best_total, best_sel = total, sel
        return best_sel

    def _refine_winners(self, best: dict, do_icp, six_dof: bool) -> dict:
        """Local rotation-refinement rounds around the greedy winners.

        No reference analogue (the reference runs one sweep): each round
        re-scores every winner under a deterministic set of small rotation
        perturbations (fibonacci axes x two magnitudes, applied in the
        CAMERA frame about the object's own origin) plus the unperturbed
        pose, and keeps the per-(model, segment) argmin. ICP re-runs on
        every perturbation, so each round is a restart ladder that escapes
        the local basin the sweep's nearest rotation sample landed in.
        Cost: rounds x |winners| x (axes x mags + 1) scored poses — tiny
        next to the sweep itself.
        """
        from perception_tpu.eval.sampling import sphere_fibonacci_grid

        axes = sphere_fibonacci_grid(self.env.pose_refinement_axes)
        mags = (self.env.pose_refinement_angle,
                self.env.pose_refinement_angle / 3.0)

        def rodrigues(axis, angle):
            k = np.asarray([[0, -axis[2], axis[1]],
                            [axis[2], 0, -axis[0]],
                            [-axis[1], axis[0], 0]])
            return (np.eye(3) + np.sin(angle) * k
                    + (1 - np.cos(angle)) * (k @ k))

        for _ in range(self.env.pose_refinement_rounds):
            cands: list[ObjectState] = []
            for key in sorted(best):
                su = best[key]
                mid = su.state.id
                a = su.adjusted_pose_cam     # preprocessed-model -> camera
                for axis in axes:
                    for mag in mags:
                        m = a.copy()
                        m[:3, :3] = rodrigues(axis, mag) @ a[:3, :3]
                        cand_pose = self.camera_to_world_pose(
                            m, mid, remove_preprocessing=True)
                        cands.append(ObjectState(
                            id=mid, symmetric=su.state.symmetric,
                            pose=cand_pose,
                            segmentation_label_id=su.state.segmentation_label_id))
            if not cands:
                break
            scored = self.score_object_states(cands, do_icp)
            for su in scored:
                if su.cost in (-1, -2):
                    continue
                if abs(su.target_cost - su.source_cost) >= 30:
                    continue
                key = ((su.state.id, su.state.segmentation_label_id)
                       if six_dof else (su.state.id,))
                if key in best and su.cost < best[key].cost:
                    best[key] = su
        return best

    # ------------------------------------------------------------------
    # Successor generation (GenerateSuccessorStates, search_env.cpp:7091+)
    # ------------------------------------------------------------------

    def generate_successors_6dof(
        self, pose_lists: dict[str, np.ndarray],
    ) -> list[ObjectState]:
        """Candidate object states from per-object pose arrays [K, 7]
        (x y z qx qy qz qw — the poses.txt contract), validity-pruned."""
        out = []
        names = self._input.segmented_object_names
        for model_name, arr in pose_lists.items():
            mid = self.bank.index_of(model_name)
            model = self.bank.models[mid]
            label_id = (names.index(model_name) + 1
                        if model_name in names else 1)
            ext_id = 0
            for row in np.asarray(arr):
                pose = ContPose.from_quat(*row[:7])
                st = ObjectState(id=mid, symmetric=model.symmetric, pose=pose,
                                 segmentation_label_id=label_id,
                                 external_pose_id=ext_id)
                ext_id += 1
                if self.is_valid_pose(st):
                    out.append(st)
        return out

    def generate_successors_3dof(self) -> list[ObjectState]:
        """Grid successor generation (x, y, theta) over the support surface
        (search_env.cpp:7270-7350)."""
        rin, env = self._input, self.env
        out = []
        for mid, model in enumerate(self.bank.models):
            res = env.res
            x = rin.x_min
            while x <= rin.x_max + 1e-9:
                y = rin.y_min
                while y <= rin.y_max + 1e-9:
                    theta = 0.0
                    n_theta = 1 if model.symmetric else max(
                        1, int(round(2 * np.pi / env.theta_res)))
                    for k in range(n_theta):
                        pose = ContPose.from_euler(
                            x, y, rin.table_height, 0.0, 0.0, k * env.theta_res)
                        st = ObjectState(id=mid, symmetric=model.symmetric,
                                         pose=pose, segmentation_label_id=1)
                        if self.is_valid_pose(st):
                            out.append(st)
                    y += res
                x += res
        if env.histogram_pruning or env.voxel_pruning:
            from perception_tpu.pipeline.pruning import prune_successors

            out = prune_successors(
                self, out, use_histogram=env.histogram_pruning,
                use_voxels=env.voxel_pruning)
        return out
