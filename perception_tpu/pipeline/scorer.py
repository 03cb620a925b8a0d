"""The unified candidate-pose scoring pipeline.

One jitted, shardable program equal to the reference's
`render_cuda_multi_unified` COST stage (cuda_renderer/src/cuda/renderer.cu:
1431-1934):

    render -> depth->cloud -> [ICP refine -> re-render -> re-cloud]
           -> 1-NN -> costs

All stages operate on the full pose batch with static shapes; the host never
sees intermediates (the reference crosses the device boundary twice per
batch; here the only outputs are per-pose scalars and adjusted pose
matrices). The pose axis is the natural sharding axis for multi-chip
execution (see perception_tpu.parallel).

Performance modes (all semantically equivalent where they overlap):
  * roi_shape: render/unproject only a per-pose window around the projected
    object instead of the full strided frame (~5x less raster/cloud work,
    and removes the cloud-compaction argsort entirely);
  * icp_mode="projective": reference-style Scene_projective data
    association (O(P) gathers per iteration) instead of per-iteration
    brute-force NN;
  * backend="pallas": fused VMEM kernels for rasterisation and 1-NN.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from perception_tpu.ops.cost import COST_TYPE_6DOF, CostOutput, compute_costs
from perception_tpu.ops.icp import icp_point_to_plane_batch, icp_projective_batch
from perception_tpu.ops.knn import nn1_batch
from perception_tpu.ops.pointcloud import depth_to_cloud_batch, depth_to_cloud_roi
from perception_tpu.ops.rasterizer import default_backend, render_pose_batch


class ObservedScene(NamedTuple):
    """Device-resident observed-scene tensors consumed by the scorer.

    Built once per frame by PerceptionEnv.set_input. `seg_*` is the
    label-partitioned cloud (reference sorted-by-label ranges); `map_*` is
    the organised strided-grid view used for projective ICP association;
    `source_*` are the occlusion-comparison images.
    """

    seg_xyz: jax.Array       # [L, S, 3]
    seg_rgb: jax.Array       # [L, S, 3]
    seg_lab: jax.Array       # [L, S, 3] CIELAB of seg_rgb (precomputed once
                             # per scene: the in-batch rgb->lab transcendental
                             # chain measured ~2x the whole pipeline)
    seg_valid: jax.Array     # [L, S]
    seg_normals: jax.Array   # [L, S, 3]
    map_xyz: jax.Array       # [Npix, 3]
    map_normals: jax.Array   # [Npix, 3]
    map_valid: jax.Array     # [Npix]
    map_label: jax.Array     # [Npix] int32 0-based (-1 invalid)
    source_depth: jax.Array  # [h_s, w_s] int32 render units
    source_label: jax.Array  # [h_s, w_s] int32 1-based
    seg_pk_crop: jax.Array | None = None
                             # [L, k, 8] pre-cropped packed ICP target rows
                             # (icp_crop_share="label", opt-in
                             # PT_CROP_PRECOMP=1): built once per frame by
                             # PerceptionEnv._build_scene. Priced a
                             # quantified NEGATIVE on-chip — the input-fed
                             # pack measures 73.3k poses/s where the
                             # semantically identical IN-GRAPH crop
                             # measures 105.3k (each reproduced twice;
                             # see env.py and ARCHITECTURE) — so the
                             # default is None = crop inline.


@dataclasses.dataclass(frozen=True)
class ScorerConfig:
    """Static (shape/trace-affecting) pipeline parameters."""

    width: int = 640
    height: int = 480
    stride: int = 8
    fx: float = 1066.778
    fy: float = 1067.487
    cx: float = 312.9869
    cy: float = 241.3109
    max_points_per_pose: int = 1024
    cost_type: int = COST_TYPE_6DOF
    sensor_resolution: float = 0.01
    color_distance_threshold: float = 15.0
    occlusion_threshold: float = 1.0
    use_segmentation_label: bool = True
    # Render-occludes-source pose invalidation: compiled out of the
    # reference's shipped greedy build (USE_TREE 0) — see rasterizer.py.
    use_tree_occlusion: bool = False
    do_icp: bool = True
    icp_mode: str = "nn"    # "nn" | "fused" | "fused_d2d" |
                            # "fused_d2d_exact" | "projective" | "gicp"
    icp_max_iterations: int = 30
    icp_max_correspondence: float = 0.05
    icp_rotation_epsilon: float = 2e-3
    icp_transformation_epsilon: float = 5e-4
    icp_downsample: int = 4
    icp_crop_targets: int = 256   # per-pose target crop for NN ICP (0 = off)
    icp_crop_mode: str = "near"   # "near" | "spread" (ops/icp.py
                                  # crop_targets: plain nearest-k vs
                                  # valid-preferring interleave over 2k)
    icp_render_scale: int = 1     # >1: render the pre-ICP pass at
                                  # stride*scale (the ICP source cloud is
                                  # downsampled anyway; replaces
                                  # icp_downsample when active)
    icp_exact_nn_every: int = 1   # fused_d2d_exact: re-association period
                                  # (1 = per-iteration, the icp_gicp_batch
                                  # reference semantics; >1 amortises the
                                  # [S, P] sweep like icp_nn_every does
                                  # for p2p — ladder-priced before any
                                  # profile change)
    icp_nn_every: int = 2         # fused ICP: re-associate NN every Nth
                                  # GN iteration (1 = reference-faithful;
                                  # 2 measured AUC-neutral, see EnvConfig;
                                  # 0 = adaptive — re-associate when the
                                  # accumulated pose-motion bound exceeds
                                  # icp_assoc_trigger)
    icp_assoc_trigger: float = 0.004  # adaptive association trigger (m of
                                  # max point motion since last sweep);
                                  # only read when icp_nn_every == 0
    icp_crop_share: str = "label"  # "label" (default since round 5: one
                                  # crop per segment, frame-invariant —
                                  # see EnvConfig.icp_crop_share for the
                                  # paired evidence) | "pose"
                                  # (per-hypothesis crop)
    icp_gather: str = "take"      # cropped packed-target gather: "take"
                                  # (generic gather, 6.25 ms/2048) |
                                  # "onehot" (bit-exact MXU one-hot, 6.57
                                  # ms once exactness is enforced — its
                                  # earlier "win" was an XLA rewrite
                                  # silently bf16-rounding the targets;
                                  # see gather_rows_onehot)
    icp_stagnation_streak: int = 8  # fused-ICP stagnation early exit
                                    # (iterations without best-rmse
                                    # improvement; see EnvConfig)
    icp_gicp_epsilon: float = 0.05  # GICP plane-covariance floor (see
                                    # EnvConfig.icp_gicp_epsilon)
    # D2D-mode convergence thresholds (gicp / fused_d2d). None resolves to
    # icp_*_epsilon * 0.1: the D2D weights shrink near-optimum GN steps,
    # so a step-norm test calibrated for p2p declares convergence early
    # (see icp_gicp_batch's convergence note). Explicit values are passed
    # to the solvers verbatim — the solvers no longer rescale internally.
    icp_d2d_rotation_epsilon: float | None = None
    icp_d2d_transformation_epsilon: float | None = None
    icp_d2d_symmetric: bool = False  # fused_d2d: include the source-
                                    # covariance plane term (pallas_icp
                                    # sym mode; measured off — see
                                    # EnvConfig)
    cost_aug_samples: int = 0       # cost_cloud="transform": cap on the
                                    # explain-only surface samples appended
                                    # per pose (0 = the full per-model
                                    # sample bank; smaller trims the cost
                                    # kernel's point axis)
    cost_cloud: str = "transform"  # "render" | "transform": post-ICP cost
                                 # cloud by rigidly moving the first-pass
                                 # cloud with the ICP delta + explain-only
                                 # surface-sample augmentation (default;
                                 # skips a whole raster+cloud pass,
                                 # paired-AUC-neutral) or from a re-render
                                 # (reference semantics)
    icp_source: str = "render"    # "render": reference-faithful pre-ICP
                                  # render -> visible cloud; "model": skip
                                  # the pre-ICP render and use precomputed
                                  # surface samples with an n.p<0 facing
                                  # mask as the ICP source (fused/nn modes,
                                  # requires bank_icp_samples/_normals)
    cost_crop_targets: int = 256  # static prefix cap on the cost stage's
                                  # target set. Segment clouds are
                                  # valid-prefix compacted (pointcloud.py
                                  # argsort partition), so the slice is
                                  # EXACT whenever the segment has <= cap
                                  # valid points; larger segments lose
                                  # their tail (0 = full segment).
    raster_tile: int = 256
    knn_ref_tile: int = 512
    depth_factor: float = 100.0   # render depth units per metre
    roi_shape: tuple[int, int] | None = None   # (roi_h, roi_w) strided
    backend: str = "auto"         # kernel backend:
                                  # "pallas_direct" | "pallas" | "xla" | "auto"
                                  # (pallas_direct selects the fully-fused
                                  # rasteriser; knn/cost kernels treat any
                                  # pallas* value as the pallas family)
    use_clutter_mode: bool = False
    clutter_regularizer: float = 0.1

    def d2d_epsilons(self) -> tuple[float, float]:
        """Step-norm thresholds for the D2D solvers (gicp / fused_d2d)."""
        rot = self.icp_d2d_rotation_epsilon
        trn = self.icp_d2d_transformation_epsilon
        return (rot if rot is not None else self.icp_rotation_epsilon * 0.1,
                trn if trn is not None
                else self.icp_transformation_epsilon * 0.1)


class PoseScores(NamedTuple):
    total_cost: jax.Array        # [N] int32; -1 invalid (reference sentinel)
    rendered_cost: jax.Array     # [N] float32 (target cost)
    observed_cost: jax.Array     # [N] float32 (source cost)
    points_diff_cost: jax.Array  # [N] float32 (last-level cost)
    adjusted_poses: jax.Array    # [N, 4, 4] post-ICP model->camera
    pose_occluded: jax.Array     # [N] int32
    point_count: jax.Array       # [N] float32 rendered points per pose


def _render_and_cloud(bank_tri_verts, bank_tri_colors, bank_tri_valid,
                      poses, model_ids, proj, scene: ObservedScene,
                      pose_labels, cfg: ScorerConfig,
                      bank_backface=None):
    out = render_pose_batch(
        bank_tri_verts, bank_tri_colors, bank_tri_valid,
        poses, model_ids, proj, bank_backface=bank_backface,
        width=cfg.width, height=cfg.height, stride=cfg.stride,
        source_depth=scene.source_depth, source_label=scene.source_label,
        pose_labels=pose_labels,
        occlusion_threshold=cfg.occlusion_threshold,
        use_segmentation_label=cfg.use_segmentation_label,
        use_tree_occlusion=cfg.use_tree_occlusion,
        tile=cfg.raster_tile, backend=cfg.backend, roi_shape=cfg.roi_shape)
    if cfg.roi_shape is not None:
        cloud = depth_to_cloud_roi(
            out.depth, out.color, out.anchors,
            fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy,
            width=cfg.width, height=cfg.height, stride=cfg.stride,
            depth_factor=cfg.depth_factor)
    else:
        cloud = depth_to_cloud_batch(
            out.depth, out.color,
            fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy,
            width=cfg.width, height=cfg.height, stride=cfg.stride,
            depth_factor=cfg.depth_factor,
            max_points=cfg.max_points_per_pose)
    return out, cloud


def _nn1(cloud_xyz, cloud_valid, tgt_xyz, tgt_valid, cfg: ScorerConfig):
    backend = cfg.backend
    if backend == "auto":
        backend = default_backend()
    if backend.startswith("pallas"):
        from perception_tpu.ops.pallas_knn import nn1_batch_pallas

        return nn1_batch_pallas(cloud_xyz, cloud_valid, tgt_xyz, tgt_valid,
                                interpret=backend.endswith("interpret"))
    return nn1_batch(cloud_xyz, cloud_valid, tgt_xyz, tgt_valid,
                     ref_tile=cfg.knn_ref_tile)


@functools.partial(jax.jit, static_argnames=("cfg",))
def score_pose_batch(
    bank_tri_verts: jax.Array,   # [M, T, 3, 3]
    bank_tri_colors: jax.Array,  # [M, T, 3]
    bank_tri_valid: jax.Array,   # [M, T]
    poses: jax.Array,            # [N, 4, 4] model->camera (m)
    model_ids: jax.Array,        # [N] int32
    pose_labels: jax.Array,      # [N] int32 0-based segment labels
    observed_total: jax.Array,   # [N] float32 observed points for each pose
    proj: jax.Array,             # [4, 4]
    scene: ObservedScene,
    cfg: ScorerConfig,
    bank_backface: jax.Array | None = None,  # [M] watertight-model flags
    bank_icp_samples: jax.Array | None = None,  # [M, K, 3] surface samples
    bank_icp_normals: jax.Array | None = None,  # [M, K, 3] face normals
    bank_tri_lab: jax.Array | None = None,   # [M, T, 3] face colours in Lab
) -> PoseScores:
    """Render + (refine) + score one batch of candidate poses.

    Segment gathering: pose i scores only against observed segment
    pose_labels[i] (6-DoF; reference label-partitioned KNN). For 3-DoF
    callers pass a single segment (L=1) and zero labels.
    """
    labels = jnp.clip(pose_labels, 0, scene.seg_xyz.shape[0] - 1)
    tgt_xyz = scene.seg_xyz[labels]        # [N, S, 3]
    tgt_valid = scene.seg_valid[labels]
    # Cost-stage targets: static prefix slice (exact for segments that fit,
    # see cost_crop_targets). Slicing at the segment level keeps the gather
    # at [N, sc, .] instead of [N, S, .].
    s_full = scene.seg_xyz.shape[1]
    sc = min(cfg.cost_crop_targets or s_full, s_full)
    cost_xyz = scene.seg_xyz[:, :sc][labels]
    cost_valid = scene.seg_valid[:, :sc][labels]
    # Fused-cost eligibility is a static function of the config (cloud
    # capacity = ROI pixels or the point cap), so the colour-channel choice
    # can be made BEFORE rendering: the colour-gated fused kernel consumes
    # CIELAB directly, and converting per-face bank colours once
    # (bank_tri_lab) instead of [N, P, 3] rendered RGB every batch removes
    # an rgb->lab transcendental chain that measured ~2x the whole
    # pipeline. The composed fallback path keeps RGB.
    p_cap = (cfg.roi_shape[0] * cfg.roi_shape[1] if cfg.roi_shape
             else cfg.max_points_per_pose)
    if cfg.cost_cloud == "transform" and bank_icp_samples is not None:
        # transform mode appends K explain-only surface samples to the
        # cost cloud (coverage-hole augmentation below).
        aug_k = bank_icp_samples.shape[1]
        if cfg.cost_aug_samples:
            aug_k = min(aug_k, cfg.cost_aug_samples)
        p_cap += aug_k
    resolved_backend = (cfg.backend if cfg.backend != "auto"
                        else default_backend())
    fused_cost = (resolved_backend.startswith("pallas")
                  and p_cap <= 2048 and sc <= 4096)
    fused_color = fused_cost and cfg.cost_type in (1, 3) \
        and bank_tri_lab is not None
    # ROI clouds keep pixel==point order, so the winning face id from the
    # raster keys lets the cost kernel recover rendered colours in-kernel
    # (no [N, P, 3] colour gathers anywhere — they measured ~27 ms/batch,
    # 3x the colour kernel itself). Without an ROI the cloud is compacted
    # and the Lab-rendered colour channel is used instead.
    tri_color = fused_color and cfg.roi_shape is not None
    render_colors = (bank_tri_lab if (fused_color and not tri_color)
                     else bank_tri_colors)
    cost_rgb = (scene.seg_lab if fused_color
                else scene.seg_rgb)[:, :sc][labels]
    if sc < s_full:
        # Self-consistent crop accounting: both the observed-explained
        # numerator and the rendered-cost NN run against the cropped target
        # subset, so the observed denominator must be the SAME subset — not
        # the full segment count the env passes in. Without this cap,
        # segments larger than the crop give every pose an observed cost
        # floor of (1 - sc/seg_count)*100 and the |target-source|<30
        # validity filter rejects correct poses. The segment packing is an
        # interleaved (coprime-stride) subsample, so the cropped subset is a
        # spatially uniform sample and percentages remain comparable.
        observed_total = jnp.minimum(
            observed_total,
            jnp.sum(cost_valid, axis=1).astype(observed_total.dtype))

    model_source = (cfg.do_icp and cfg.icp_source == "model"
                    and bank_icp_samples is not None
                    and cfg.icp_mode in ("fused", "fused_d2d",
                                         "fused_d2d_exact", "nn", "gicp"))
    coarse = (cfg.do_icp and cfg.icp_render_scale > 1
              and cfg.roi_shape is not None and not model_source)
    if model_source:
        # Render-free ICP source: transformed surface samples, visibility by
        # the front-facing hemisphere test (adequate for mostly-convex
        # objects; the reference renders purely to get a self-occlusion-aware
        # source cloud, renderer.cu:1740-1817). Skips one full render pass.
        render = cloud = None
        samp = bank_icp_samples[model_ids]          # [N, K, 3]
        snrm = bank_icp_normals[model_ids]
        rot = poses[:, :3, :3]
        p_cam = (jnp.einsum("nij,nkj->nki", rot, samp)
                 + poses[:, None, :3, 3])
        n_cam = jnp.einsum("nij,nkj->nki", rot, snrm)
        # Facing-cosine threshold, not just the sign: grazing faces have
        # full area weight in the sample set but ~zero projected area in a
        # render; their bogus correspondences push the GN solve along the
        # near-null directions of H (measured: a 2 cm offset diverged to
        # ~1 m with the plain n.p < 0 test).
        facing = (jnp.sum(n_cam * p_cam, axis=-1)
                  < -0.2 * jnp.linalg.norm(p_cam, axis=-1))
        if bank_backface is not None:
            # Non-winding-consistent models have unsigned normals: accept
            # every sample rather than trust the facing sign.
            facing = facing | ~bank_backface[model_ids][:, None]
        model_src = (p_cam, facing, n_cam)
    elif coarse:
        # Pre-ICP pass: the only consumer is the (downsampled) ICP source
        # cloud, so render it at stride*scale over a proportionally smaller
        # ROI window — same sample positions the ::icp_downsample slice
        # would have kept, at 1/scale^2 the raster cost.
        sc = cfg.icp_render_scale
        coarse_cfg = dataclasses.replace(
            cfg, stride=cfg.stride * sc,
            roi_shape=(cfg.roi_shape[0] // sc, cfg.roi_shape[1] // sc))
        coarse_scene = scene._replace(
            source_depth=scene.source_depth[::sc, ::sc],
            source_label=scene.source_label[::sc, ::sc])
        render, cloud = _render_and_cloud(
            bank_tri_verts, render_colors, bank_tri_valid,
            poses, model_ids, proj, coarse_scene, pose_labels, coarse_cfg,
            bank_backface)
    else:
        render, cloud = _render_and_cloud(
            bank_tri_verts, render_colors, bank_tri_valid,
            poses, model_ids, proj, scene, pose_labels, cfg, bank_backface)

    adjusted = poses
    explain_only = None
    if cfg.do_icp:
        src_nrm = None
        if model_source:
            src_xyz, src_valid, src_nrm = model_src
        else:
            ds = 1 if coarse else cfg.icp_downsample
            src_xyz = cloud.xyz[:, ::ds]
            src_valid = cloud.valid[:, ::ds]
        if cfg.icp_mode in ("fused", "fused_d2d", "fused_d2d_exact"):
            from perception_tpu.ops.icp import crop_targets
            from perception_tpu.ops.pallas_icp import (
                gather_rows_onehot, icp_fused_pallas, pack_targets)

            d2d_mode = cfg.icp_mode in ("fused_d2d", "fused_d2d_exact")

            # Pack targets per segment (cheap: [L, S, 8]), then gather the
            # cropped rows straight from the segment table — one [N, k, 8]
            # gather, never materialising [N, S, 8].
            k = min(cfg.icp_crop_targets or 256, tgt_xyz.shape[1])
            seg_pk = pack_targets(scene.seg_xyz, scene.seg_valid,
                                  scene.seg_normals)
            if k >= tgt_xyz.shape[1]:
                tgt_pk = seg_pk[labels]
            elif (cfg.icp_crop_share == "label"
                    and scene.seg_pk_crop is not None
                    and scene.seg_pk_crop.shape[1] == k):
                # Frame-invariant crop, built once per observation by
                # PerceptionEnv._build_scene: the per-batch prologue is
                # just this row gather.
                tgt_pk = scene.seg_pk_crop[labels]
            elif cfg.icp_crop_share == "label":
                # One crop per SEGMENT, centred on the segment's own valid
                # centroid: the selection work and the element-level gather
                # collapse from N poses to L labels, leaving only a
                # contiguous row gather (the same class the k >= S path
                # ships). Selection differs from per-pose crops only for
                # segments with > k valid targets AND hypotheses far from
                # the segment centroid (candidate generation seeds at the
                # segment, so bench-shape crops are near-identical).
                segc = (jnp.sum(scene.seg_xyz
                                * scene.seg_valid[..., None], axis=1)
                        / jnp.maximum(
                            scene.seg_valid.sum(axis=1), 1)[:, None])
                cidx_l = crop_targets(scene.seg_xyz, scene.seg_valid,
                                      segc, k, mode=cfg.icp_crop_mode)
                tgt_pk = jnp.take_along_axis(
                    seg_pk, cidx_l[..., None], axis=1)[labels]
            else:
                centers = (jnp.sum(src_xyz * src_valid[..., None], axis=1)
                           / jnp.maximum(src_valid.sum(axis=1), 1)[:, None])
                cidx = crop_targets(tgt_xyz, tgt_valid, centers, k,
                                    mode=cfg.icp_crop_mode)
                # Row-level gather (contiguous) + per-row selection. The
                # one-hot MXU alternative is bit-exact but priced slower
                # once its bf16 split is protected from XLA's
                # excess-precision elision (take 6.25 vs onehot 6.57
                # ms/2048 paired on-chip, crop block total — see
                # gather_rows_onehot for the story); "take" is default.
                if cfg.icp_gather == "take":
                    tgt_pk = jnp.take_along_axis(
                        seg_pk[labels], cidx[..., None], axis=1)
                else:
                    tgt_pk = gather_rows_onehot(seg_pk[labels], cidx)
            fused_src_nrm = None
            if (cfg.icp_mode == "fused_d2d_exact"
                    or (cfg.icp_mode == "fused_d2d"
                        and cfg.icp_d2d_symmetric)):
                if src_nrm is None:
                    # Source covariance from k-NN normals on the rendered
                    # cloud, as fast_gicp estimates them
                    # (renderer.cu:1697); model_source already carries
                    # exact bank normals.
                    from perception_tpu.ops.icp import cloud_normals

                    src_nrm = cloud_normals(src_xyz, src_valid)
                fused_src_nrm = src_nrm
            if d2d_mode:
                rot_eps, trn_eps = cfg.d2d_epsilons()
                nn_every = (cfg.icp_exact_nn_every
                            if cfg.icp_mode == "fused_d2d_exact"
                            else cfg.icp_nn_every)
            else:
                rot_eps = cfg.icp_rotation_epsilon
                trn_eps = cfg.icp_transformation_epsilon
                nn_every = cfg.icp_nn_every
            delta_mat = icp_fused_pallas(
                src_xyz, src_valid, tgt_pk, fused_src_nrm,
                max_iterations=cfg.icp_max_iterations,
                max_correspondence=cfg.icp_max_correspondence,
                nn_every=nn_every,
                rotation_epsilon=rot_eps,
                transformation_epsilon=trn_eps,
                stagnation_streak=cfg.icp_stagnation_streak,
                d2d_epsilon=(cfg.icp_gicp_epsilon if d2d_mode else 0.0),
                exact=cfg.icp_mode == "fused_d2d_exact",
                assoc_trigger=cfg.icp_assoc_trigger,
                interpret=resolved_backend.endswith("interpret"))
        elif cfg.icp_mode == "gicp":
            from perception_tpu.ops.icp import cloud_normals, icp_gicp_batch

            backend = cfg.backend
            if backend == "auto":
                backend = default_backend()
            if src_nrm is None:
                # Rendered-source covariances, as fast_gicp estimates them
                # on the rendered cloud (renderer.cu:1697): k-NN normal per
                # source point, computed once (the rigid update rotates
                # them inside the solver).
                src_nrm = cloud_normals(src_xyz, src_valid)
            rot_eps, trn_eps = cfg.d2d_epsilons()
            icp = icp_gicp_batch(
                src_xyz, src_valid, src_nrm,
                tgt_xyz, tgt_valid, scene.seg_normals[labels],
                max_iterations=cfg.icp_max_iterations,
                max_correspondence=cfg.icp_max_correspondence,
                rotation_epsilon=rot_eps,
                transformation_epsilon=trn_eps,
                gicp_epsilon=cfg.icp_gicp_epsilon,
                ref_tile=cfg.knn_ref_tile,
                crop_k=cfg.icp_crop_targets,
                backend=backend)
            delta_mat = icp.delta
        elif cfg.icp_mode == "projective":
            icp = icp_projective_batch(
                src_xyz, src_valid,
                scene.map_xyz, scene.map_normals, scene.map_valid,
                scene.map_label, labels,
                fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy,
                width=cfg.width, height=cfg.height, stride=cfg.stride,
                max_iterations=cfg.icp_max_iterations,
                max_correspondence=cfg.icp_max_correspondence,
                rotation_epsilon=cfg.icp_rotation_epsilon,
                transformation_epsilon=cfg.icp_transformation_epsilon,
                use_labels=cfg.use_segmentation_label)
            delta_mat = icp.delta
        else:
            backend = cfg.backend
            if backend == "auto":
                backend = default_backend()
            icp = icp_point_to_plane_batch(
                src_xyz, src_valid,
                tgt_xyz, tgt_valid, scene.seg_normals[labels],
                max_iterations=cfg.icp_max_iterations,
                max_correspondence=cfg.icp_max_correspondence,
                rotation_epsilon=cfg.icp_rotation_epsilon,
                transformation_epsilon=cfg.icp_transformation_epsilon,
                ref_tile=cfg.knn_ref_tile,
                crop_k=cfg.icp_crop_targets,
                backend=backend)
            delta_mat = icp.delta
        adjusted = jnp.einsum("nij,njk->nik", delta_mat, poses)
        if (cfg.cost_cloud == "transform" and not model_source
                and not coarse):
            # Skip the post-ICP re-render: the refined-pose cloud is the
            # first-pass cloud moved rigidly by the ICP delta. Exact for
            # the surface points themselves; what it forgoes is the
            # re-render's visibility update (self-occlusion changes and
            # source-occludes-render pixel removal under the small ICP
            # delta) — the reference re-renders (renderer.cu:1740-1817)
            # because a CUDA raster pass is cheap there; here it is ~40%
            # of the whole pipeline. Accuracy-priced on the paired zoo
            # harness before defaulting.
            moved = (jnp.einsum("nij,npj->npi", delta_mat[:, :3, :3],
                                cloud.xyz)
                     + delta_mat[:, None, :3, 3])
            cloud = cloud._replace(xyz=jnp.where(
                cloud.valid[..., None], moved, cloud.xyz))
            if bank_icp_samples is not None:
                # Coverage-hole augmentation. The measured failure mode of
                # the bare moved cloud is on the OBSERVED side: surface
                # regions visible at the refined pose but not sampled at
                # the pre-ICP pose leave observed points unexplained
                # (winner observed_cost 7 -> 17 on the zoo probe; rendered
                # cost was FINE, 2.1 -> 0.9). Appending the static
                # per-model surface samples at the adjusted pose — front
                # hemisphere only, flagged explain-only in the cost
                # kernels (they claim observed rows but never count in
                # point_num / rendered cost) — restores coverage with no
                # raster pass and no per-pose dynamic shapes.
                samp = bank_icp_samples[model_ids]          # [N, K, 3]
                snrm = bank_icp_normals[model_ids]
                if cfg.cost_aug_samples and cfg.cost_aug_samples < samp.shape[1]:
                    # The bank samples are stratified along cumulative
                    # surface area (mesh.py surface_samples), so a strided
                    # slice stays uniform over the surface — a prefix
                    # would cover only the first morton-order triangles.
                    step = -(-samp.shape[1] // cfg.cost_aug_samples)
                    samp = samp[:, ::step]
                    snrm = snrm[:, ::step]
                rot = adjusted[:, :3, :3]
                aug_xyz = (jnp.einsum("nij,nkj->nki", rot, samp)
                           + adjusted[:, None, :3, 3])
                n_cam = jnp.einsum("nij,nkj->nki", rot, snrm)
                aug_valid = jnp.sum(n_cam * aug_xyz, axis=-1) < 0.0
                n_b, p_b = cloud.valid.shape
                k_b = aug_xyz.shape[1]
                cloud = cloud._replace(
                    xyz=jnp.concatenate([cloud.xyz, aug_xyz], axis=1),
                    rgb=jnp.concatenate(
                        [cloud.rgb,
                         jnp.zeros((n_b, k_b, 3), cloud.rgb.dtype)], axis=1),
                    valid=jnp.concatenate([cloud.valid, aug_valid], axis=1))
                explain_only = jnp.concatenate(
                    [jnp.zeros((n_b, p_b), bool),
                     jnp.ones((n_b, k_b), bool)], axis=1)
        else:
            # Re-render and re-cloud at the refined poses
            # (renderer.cu:1740-1817).
            render, cloud = _render_and_cloud(
                bank_tri_verts, render_colors, bank_tri_valid,
                adjusted, model_ids, proj, scene, pose_labels, cfg,
                bank_backface)

    backend = resolved_backend
    # The fused cost kernel holds [256, P] tiles in VMEM; beyond ~2k points
    # per pose it would overflow — fall back to the composed path. RGB cost
    # types run the colour-gated fused kernel (the round-2 gap: the one
    # significant accuracy lever was unavailable at the perf defaults);
    # cloud.rgb/cost_rgb already carry Lab in that case (see above).
    if fused_cost and (not cfg.cost_type in (1, 3) or fused_color):
        from perception_tpu.ops.cost import compute_costs_fused

        if tri_color:
            from perception_tpu.ops.pallas_cost import pack_bank_lab

            tri_id_flat = render.tri_id.reshape(render.tri_id.shape[0], -1)
            if explain_only is not None:
                tri_id_flat = jnp.concatenate(
                    [tri_id_flat,
                     jnp.full((tri_id_flat.shape[0],
                               cloud.xyz.shape[1] - tri_id_flat.shape[1]),
                              -1, tri_id_flat.dtype)], axis=1)
            tri_kw = dict(
                cloud_tri_id=tri_id_flat,
                model_ids=model_ids,
                bank_lab8=pack_bank_lab(bank_tri_lab))
        else:
            tri_kw = {}
        costs: CostOutput = compute_costs_fused(
            cloud.xyz, cloud.valid, render.pose_occluded,
            cost_xyz, cost_valid, observed_total,
            sensor_resolution=cfg.sensor_resolution,
            interpret=backend.endswith("interpret"),
            cloud_lab=cloud.rgb, tgt_lab=cost_rgb,
            color_distance_threshold=cfg.color_distance_threshold,
            use_color=fused_color, cloud_explain_only=explain_only,
            **tri_kw)
    else:
        dist_sq, idx = _nn1(cloud.xyz, cloud.valid, cost_xyz, cost_valid, cfg)
        costs = compute_costs(
            dist_sq, idx, cloud.valid, render.pose_occluded,
            cloud.rgb, cost_rgb, observed_total,
            sensor_resolution=cfg.sensor_resolution,
            color_distance_threshold=cfg.color_distance_threshold,
            cost_type=cfg.cost_type, cloud_explain_only=explain_only)

    # Total-cost combination from ComputeGreedyCostsInParallelGPU
    # (search_env.cpp:2022-2036): -1 sentinel propagates; otherwise
    # int(rendered% + observed%), plus the regularised clutter ratio when
    # operating in under-clutter mode (PERCHParams clutter_regularizer).
    invalid = costs.rendered_cost.astype(jnp.int32) < 0
    total_f = costs.rendered_cost + costs.observed_cost
    if cfg.use_clutter_mode:
        total_f = total_f + cfg.clutter_regularizer * render.clutter_ratio
    total = jnp.where(invalid, -1, total_f.astype(jnp.int32))

    return PoseScores(
        total_cost=total,
        rendered_cost=costs.rendered_cost,
        observed_cost=costs.observed_cost,
        points_diff_cost=costs.points_diff_cost,
        adjusted_poses=adjusted,
        pose_occluded=render.pose_occluded,
        point_count=costs.pose_point_num,
    )
