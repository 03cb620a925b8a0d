"""Configuration dataclasses mirroring the reference's layered param system.

The reference loads env/planner YAML configs through the ROS parameter server
(`sbpl_perception/config/*.yaml`, read in object_recognizer.cpp:55-153 and
search_env.h:106-190 `PERCHParams`). Here the same knobs are plain frozen
dataclasses, loadable from the same YAML shape, with the ROS plumbing gone.

Shape-affecting fields (width/height/stride/caps) are static under jit; a
config change retraces.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import numpy as np


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """Pinhole intrinsics of the observed RGB-D camera."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    def matrix(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )

    def projection(self, near: float = 10.0, far: float = 10000.0) -> np.ndarray:
        """OpenGL-style projection from intrinsics.

        Mirrors `cuda_renderer::compute_proj` (cuda_renderer/src/renderer.cpp:
        199-223) including its sign flips; near/far are in render units (cm).
        """
        w, h = float(self.width), float(self.height)
        p = np.zeros((4, 4), dtype=np.float32)
        p[0, 0] = 2 * self.fx / w
        p[0, 1] = 2 * 0.0 / w
        p[0, 2] = 2 * self.cx / w - 1.0
        p[1, 1] = -2 * self.fy / h
        p[1, 2] = 1.0 - 2 * self.cy / h
        p[2, 2] = (far + near) / (far - near)
        p[2, 3] = -2 * far * near / (far - near)
        p[3, 2] = 1.0
        return p


@dataclasses.dataclass(frozen=True)
class PerchConfig:
    """Search/scoring parameters (reference `PERCHParams`, search_env.h:106-190).

    Field names follow the reference YAML keys (pr3_env_config.yaml etc.) so
    reference config files load directly.
    """

    sensor_resolution: float = 0.01           # m; NN match radius for cost
    min_neighbor_points_for_valid_pose: int = 30
    min_points_for_constraint_cloud: int = 50
    max_icp_iterations: int = 20              # round 5: 20 unifies the
                                              # bench budget with the
                                              # shipped default; paired
                                              # 150-scene TPU delta vs the
                                              # ladder's 30-cap default is
                                              # -0.57 [-1.46, +0.32]
                                              # (neutral; streak-8 early
                                              # exit fires well before
                                              # either cap on converged
                                              # poses). Reference YAMLs
                                              # (max 150) still load their
                                              # own value.
    icp_max_correspondence: float = 0.05      # m
    use_model_specific_search_resolution: bool = False
    icp_type: int = 3                         # 3 = integrated on-device GICP
    use_color_cost: bool = False
    color_distance_threshold: float = 15.0    # CIEDE2000 units
    use_downsampling: bool = False
    downsampling_leaf_size: float = 0.01
    use_clutter_mode: bool = False
    clutter_regularizer: float = 0.1
    use_gpu: bool = True                      # kept for config parity; always on-device here
    gpu_batch_size: int = 700                 # poses per device dispatch
    gpu_stride: int = 8                       # pixel stride for cloud sampling
    gpu_occlusion_threshold: float = 1.0      # cm
    use_tree_occlusion: bool = False          # render-occludes-source pose
                                              # invalidation; the reference
                                              # ships with USE_TREE 0
                                              # (model.h:17) so greedy mode
                                              # must leave this off
    use_cylinder_observed: bool = False
    footprint_tolerance: float = 0.05         # m
    depth_median_blur: int = 5
    vis_expanded_states: bool = False
    vis_successors: bool = False
    print_expanded_states: bool = False
    debug_verbose: bool = False
    use_rcnn_heuristic: bool = False
    use_adaptive_resolution: bool = False

    @classmethod
    def from_yaml_dict(cls, d: Mapping[str, Any]) -> "PerchConfig":
        """Build from a reference-style `perch_params:` YAML mapping."""
        if "perch_params" in d:
            d = d["perch_params"]
        aliases = {
            "sensor_resolution_radius": "sensor_resolution",
            "visualize_expanded_states": "vis_expanded_states",
            "visualize_successors": "vis_successors",
        }
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {}
        for key, value in d.items():
            key = aliases.get(key, key)
            if key in fields:
                kwargs[key] = value
        return cls(**kwargs)


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Scene/search-space parameters (reference `EnvParams`, search_env.h)."""

    width: int = 640
    height: int = 480
    # 3-DoF search grid.
    x_min: float = -1.0
    x_max: float = 1.0
    y_min: float = -1.0
    y_max: float = 1.0
    table_height: float = 0.0
    res: float = 0.04                         # translation grid resolution (m)
    theta_res: float = 0.3926991              # yaw grid resolution (rad)
    # 6-DoF external-pose mode (poses read from per-object poses.txt).
    use_external_pose_list: int = 0
    shift_pose_centroid: int = 0
    # Depth-unit conversions: rendered depth is int cm (factor 100); input
    # sensor PNGs vary (YCB-Video: 10000) (search_env.cpp:2487-2497).
    gpu_depth_factor: float = 100.0
    input_depth_factor: float = 100.0
    # Static-shape capacities (TPU-specific; no reference analogue — the
    # reference compacts dynamically with thrust scans).
    max_triangles_per_model: int = 1024       # after decimation/padding
    max_points_per_pose: int = 1024           # rendered-cloud cap per pose
    max_observed_points: int = 8192           # total observed-cloud cap
    max_points_per_label: int = 4096          # per-segment observed cap
    max_labels: int = 32                      # max object instances per scene
    icp_downsample: int = 4                   # extra stride applied to rendered
                                              # cloud inside GICP refinement
    # TPU performance knobs (no reference analogue).
    roi_size: int = 0                         # strided ROI side; 0 = full frame
    icp_render_scale: int = 1                 # coarse pre-ICP render factor
                                              # (needs roi_size). Renders the
                                              # pre-ICP pass at stride*scale.
                                              # Paired 150-scene zoo delta at
                                              # 2: -0.6 [-2.5, +1.1] AUC (an
                                              # earlier 12-scene -6.5 reading
                                              # was noise) — opt-in with the
                                              # other mild-negative knobs.
                                              # Round 5: ALSO slower at the
                                              # bench (56.0k vs 64.9k
                                              # poses/s) — at roi32 a
                                              # stride-x2 render leaves
                                              # 16-pixel rows under the
                                              # 128-lane vregs, so the
                                              # raster loses more to lane
                                              # waste than it saves in
                                              # entries. Dead on both axes
                                              # at bench shapes.
    render_lod: int = 256                     # raster-bank triangle target
                                              # (0 = full t_cap). Strided
                                              # rasterisation samples the
                                              # surface at stride spacing,
                                              # so a resolution-matched
                                              # decimated bank renders the
                                              # same sampled geometry with
                                              # proportionally fewer
                                              # (tri x pixel) coverage ops
                                              # (mesh.py ModelBank.decimated).
                                              # Default 256 since round 3:
                                              # under the QEM decimator the
                                              # LOD-256 surface is 0.10 mm
                                              # from full (hires zoo) and
                                              # paired AUC is neutral at 256
                                              # AND 128 (-0.35 [-2.5, +1.9] /
                                              # -0.04 [-3.1, +3.0], 30-scene
                                              # hires zoo; round-2's -2.37 at
                                              # lod128 was the CLUSTERING
                                              # decimator). 0 restores the
                                              # full bank.
    icp_crop_targets: int = 256               # per-pose target crop for the
                                              # fused/NN ICP sweep (0 = off)
    icp_crop_mode: str = "near"               # "near" | "spread": plain
                                              # nearest-k vs valid-
                                              # preferring interleave over
                                              # the 2k nearest (fixes the
                                              # single-plane runaway at
                                              # small k; ops/icp.py
                                              # crop_targets)
    icp_crop_share: str = "label"             # "label" (default since round
                                              # 5): ONE ICP target crop per
                                              # segment, centred on the
                                              # segment's valid centroid —
                                              # scene-only, so it hoists out
                                              # of multi-batch loops and off
                                              # the render->crop serial
                                              # chain. (A per-frame
                                              # precompute variant is priced
                                              # negative: PT_CROP_PRECOMP
                                              # in env.py.)
                                              # "pose": reference-shaped crop
                                              # around each hypothesis's
                                              # transformed source centroid
                                              # (N selections + an [N, k, 8]
                                              # element gather, ~5.6 ms/2048
                                              # EVERY batch, and a serial
                                              # render->centers->crop->kernel
                                              # chain). For segments with
                                              # <= k valid targets the kept
                                              # valid set is identical
                                              # (test_pipeline); they differ
                                              # only when a segment has > k
                                              # valid points AND a hypothesis
                                              # sits far from the segment
                                              # centroid. Evidence (round 5):
                                              # paired 150-scene zoo delta
                                              # -0.61 [-2.20, +0.96] neutral,
                                              # @kinect -0.38 [-1.61, +0.92]
                                              # neutral; single-frame probe
                                              # 0.00 mm at k=256
                                              # (crop_probe.py); bench
                                              # 63.2k -> 105.2k poses/s.
    cost_crop_targets: int = 256              # cost-stage target prefix cap
                                              # (exact for segments with <=
                                              # cap valid points — segments
                                              # are valid-prefix compacted;
                                              # 0 = full segment). 256 vs
                                              # full measured AUC-neutral
                                              # (paired 150-scene zoo delta
                                              # +0.3 [-0.6, 1.2]) and
                                              # -3.6 ms/1024-pose batch.
    icp_nn_every: int = 2                     # fused-ICP NN re-association
                                              # period (1 = every iteration,
                                              # reference-faithful; 2 skips
                                              # alternate [S, P] sweeps —
                                              # point-to-plane is near-linear
                                              # per association). Paired
                                              # 150-scene zoo delta at 2:
                                              # +1.1 [-0.9, 3.1] AUC (an
                                              # earlier 24-scene -6.5 reading
                                              # was small-sample noise).
                                              # Round 5 priced going deeper
                                              # (-5.9 ms/batch at 4): 4 is
                                              # -1.76 [-3.41, -0.02]
                                              # SIGNIFICANT, 3 is -1.19
                                              # [-2.63, +0.19] (fails the
                                              # point > -1 rule) — 2 stays.
                                              # 0 = adaptive: re-associate
                                              # when the accumulated pose-
                                              # motion bound exceeds
                                              # icp_assoc_trigger
                                              # (pallas_icp.py). Priced a
                                              # DEAD perf lever on-chip:
                                              # ~18 ms/2048 at any trigger
                                              # 0.002-0.008 (== nn_every=1's
                                              # cost, vs 14.4 at the
                                              # default 2) — early GN steps
                                              # always exceed a sane motion
                                              # trigger and association is
                                              # group-wide, so the sweep
                                              # never amortises. Kept as an
                                              # opt-in fidelity mode.
    icp_assoc_trigger: float = 0.004          # adaptive-association motion
                                              # trigger in meters (read only
                                              # when icp_nn_every == 0)
    icp_gather: str = "take"                  # cropped packed-target gather:
                                              # "take" (generic gather) |
                                              # "onehot" (bit-exact one-hot
                                              # MXU matmul). Priced on-chip
                                              # paired: take 6.25 / onehot
                                              # 6.57 ms/2048 — onehot's
                                              # apparent win in earlier
                                              # probes was an XLA excess-
                                              # precision elision silently
                                              # bf16-rounding every gathered
                                              # target (53 mm single-plane
                                              # ICP drift); with the split
                                              # pinned exact it loses, so
                                              # take stays default.
    icp_source: str = "render"                # "render" (reference-faithful
                                              # pre-ICP render) | "model"
                                              # (render-free: surface samples
                                              # + facing-cosine mask as ICP
                                              # source, skips one raster
                                              # pass, ~+15% pipeline speed).
                                              # Paired 150-scene zoo delta:
                                              # -0.9 [-3.1, +1.3] AUC alone
                                              # but combos trend -2 —
                                              # kept opt-in.
    icp_model_samples: int = 256              # sample count for icp_source=
                                              # "model"
    cost_cloud: str = "transform"             # post-ICP cost cloud:
                                              # "transform" (default: move
                                              # the first-pass cloud by the
                                              # ICP delta + explain-only
                                              # surface-sample augmentation;
                                              # skips the re-render raster
                                              # pass, 41.5k -> 57.7k poses/s,
                                              # paired AUC delta -0.98
                                              # [-2.75, +0.64] n.s.) or
                                              # "render" (re-render at the
                                              # refined pose, reference
                                              # semantics renderer.cu:
                                              # 1740-1817)
    icp_stagnation_streak: int = 8            # fused-ICP early exit: stop a
                                              # pose after N iterations with
                                              # no best-rmse improvement.
                                              # Paired 150-scene zoo deltas:
                                              # streak 5 costs -1.56
                                              # [-2.69, -0.46] AUC vs
                                              # disabled (significant!) for
                                              # +13% speed; 8 recovers most
                                              # of it (measured in
                                              # accuracy_ladder.json).
    # 3-DoF successor pruning (reference kUseHistogramPruning /
    # kUseOctomapPruning compile-time switches, search_env.cpp:7331-7420):
    # batched candidate renders filtered by HS-histogram similarity /
    # voxel-occupancy change fraction (pipeline/pruning.py).
    histogram_pruning: bool = False
    voxel_pruning: bool = False
    fine_stride: int = 0                      # coarse-to-fine: re-score top
                                              # candidates at this finer stride
                                              # (0 = off). Mechanically correct
                                              # but measured ADD-S-negative on
                                              # synthetic scenes: finer scoring
                                              # sharpens the visible-surface
                                              # cost, which is ambiguous about
                                              # hidden geometry, so plausible-
                                              # but-wrong poses win more often
                                              # (single-view limitation shared
                                              # with the reference cost).
    # Local rotation-refinement rounds around the greedy winners: each
    # round re-scores every winner under pose_refinement_axes x 2 small
    # camera-frame rotations (fibonacci axes; angles angle and angle/3)
    # plus ICP, keeping the per-object argmin (pipeline/env.py
    # _refine_winners; no reference analogue). 0 = off.
    pose_refinement_rounds: int = 0
    pose_refinement_axes: int = 12
    pose_refinement_angle: float = 0.25       # rad
    fine_top_k: int = 8                       # candidates per model to refine
    icp_mode: str = "auto"                    # "auto" (fused on TPU, nn on
                                              # CPU) | "nn" | "fused" |
                                              # "fused_d2d" (split GICP
                                              # weighting in the fused
                                              # kernel) | "fused_d2d_exact"
                                              # (full 3x3 covariance GN —
                                              # icp_gicp_batch semantics —
                                              # in the fused kernel, with
                                              # per-iteration
                                              # re-association) |
                                              # "projective" | "gicp"
    cost_aug_samples: int = 0                 # cost_cloud="transform": cap
                                              # on the explain-only samples
                                              # appended per pose (0 = full
                                              # bank; strided subsample
                                              # otherwise — scorer.py)
    icp_exact_nn_every: int = 1               # fused_d2d_exact NN re-
                                              # association period (1 =
                                              # per-iteration, the
                                              # icp_gicp_batch reference
                                              # semantics the +3.21@kinect
                                              # evidence was measured at).
                                              # Priced round 5 at 150
                                              # paired scenes @kinect:
                                              # nn2 saves 17% scene time
                                              # (0.81 -> 0.67 s) but its
                                              # point delta vs nn1 is
                                              # -1.18 [-2.82, +0.52] —
                                              # fails the > -1 bar, so 1
                                              # stays (ladder rung
                                              # d2dexact_nn2@kinect)
    icp_d2d_symmetric: bool = False           # fused_d2d: include the
                                              # source-covariance plane
                                              # term (pallas_icp sym
                                              # mode). With render-source
                                              # k-NN normals: gains did
                                              # not transfer and the
                                              # normals cost 6x (round 4).
                                              # Re-tested round 5 with
                                              # icp_source=model (free
                                              # exact bank normals):
                                              # sym+model is +1.20
                                              # [-0.36, +2.77] over
                                              # model-source non-sym and
                                              # +1.29 [-0.92, +3.66] over
                                              # default @kinect at THE
                                              # SAME 0.44 s/scene — but
                                              # fused_d2d_exact is still
                                              # +1.92 [-0.21, +4.05] over
                                              # it, so noisy_profile()
                                              # keeps exact; sym+model is
                                              # the documented option when
                                              # noisy robustness must come
                                              # at default latency
                                              # (d2d_model_sym@kinect)
    icp_gicp_epsilon: float = 0.05            # GICP plane-covariance floor
                                              # (fast_gicp uses 1e-3 with
                                              # k=20 covariances; with this
                                              # framework's sparser clouds
                                              # the 1/(2 eps) normal-dir
                                              # weight at 1e-3 overfits
                                              # noisy correspondences —
                                              # measured 5x worse on the
                                              # noisy-target probe and -9.5
                                              # AUC on the zoo ladder)
    kernel_backend: str = "auto"              # "pallas" | "xla" | "auto"

    @classmethod
    def from_yaml_dict(cls, d: Mapping[str, Any]) -> "EnvConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in fields}
        return cls(**kwargs)

    def fast_profile(self) -> "EnvConfig":
        """The documented speed profile: every knob whose paired 150-scene
        AUC delta was a small, non-significant negative, combined
        (+~25% throughput over the accuracy-first defaults; measured
        point deltas in the field comments / accuracy_ladder.json). Use
        when throughput matters more than the last ~2 AUC."""
        return dataclasses.replace(
            self, icp_source="model", icp_stagnation_streak=5,
            icp_crop_targets=128)

    def noisy_profile(self) -> "EnvConfig":
        """The documented real-sensor profile: the exact-covariance fused
        D2D refiner, which wins +3.21 [+1.06, +5.34] paired AUC over the
        p2p default UNDER THE KINECT NOISE MODEL at ~2x scene latency
        (0.81 vs 0.43 s/scene) but is n.s. NEGATIVE noise-free (-1.08
        [-3.17, +0.89]) — so it does not meet the default-flip rule
        (positive or speed-neutral on the default noise-free harness; see
        ARCHITECTURE.md "Default-flip decision rule") and ships as the
        recommended opt-in for physical depth cameras instead."""
        return dataclasses.replace(self, icp_mode="fused_d2d_exact")


def load_yaml_config(path: str) -> tuple[PerchConfig, EnvConfig]:
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    return PerchConfig.from_yaml_dict(raw), EnvConfig.from_yaml_dict(raw)
