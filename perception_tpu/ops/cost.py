"""Occlusion-aware explained/unexplained pose scoring.

Deterministic re-design of the reference cost kernels
(cuda_renderer/include/cuda_renderer/cuda/compute_costs.cuh:161-457):

  * `compute_render_cost`: every valid rendered point whose 1-NN distance
    exceeds the (squared) sensor resolution — or whose colour mismatches in
    RGB mode — adds 1 to the pose's rendered cost; matching points mark their
    observed neighbour "explained".
  * `compute_observed_cost`: per-pose count of explained observed points.
  * Normalisation to percentages with the reference's -1 sentinel for poses
    with zero rendered points (cost_percentage_functor, cuh:21-55).

The CUDA atomicAdd accumulations become masked segment sums; the per-pose
observed-explained matrix becomes a batched scatter-max.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from perception_tpu.ops.color import ciede2000, rgb_to_lab

COST_TYPE_3DOF_DEPTH = 0
COST_TYPE_3DOF_RGBD = 1
COST_TYPE_6DOF = 2
# 6-DoF with the CIEDE2000 colour gate on explained points — the reference
# kernel applies the same check in its 6-DoF path when colour costing is on
# (compute_costs.cuh:161-290); counter-measure for single-view depth-only
# cost ambiguity.
COST_TYPE_6DOF_RGB = 3


def normalize_costs(raw_rendered, pose_point_num, observed_explained,
                    observed_total, occluded) -> "CostOutput":
    """Shared percentage normalisation + sentinel logic (cuh:362-446).

    Deviation from the reference arithmetic: observed_cost is clamped to
    [0, 100] and an empty observed total scores 100. The reference divides
    raw differences directly (compute_costs.cuh:422-446), which under
    use_cylinder_observed can go negative (NN-explained points outside the
    cylinder) or infinite (zero cylinder count) and then corrupts the
    |target-source| selection filter.
    """
    rendered_explained = pose_point_num - raw_rendered
    rendered_cost = jnp.where(
        pose_point_num == 0, -1.0,
        raw_rendered / jnp.maximum(pose_point_num, 1.0) * 100.0)
    rendered_cost = jnp.where(occluded, -1.0, rendered_cost)
    observed_cost = (observed_total - observed_explained) / jnp.maximum(
        observed_total, 1e-9) * 100.0
    observed_cost = jnp.where(observed_total <= 0, 100.0,
                              jnp.clip(observed_cost, 0.0, 100.0))
    points_diff = rendered_explained - observed_explained
    return CostOutput(
        rendered_cost=rendered_cost,
        observed_cost=observed_cost,
        points_diff_cost=points_diff,
        pose_point_num=pose_point_num,
        observed_explained=observed_explained,
    )


def compute_costs_fused(
    cloud_xyz, cloud_valid, pose_occluded, tgt_xyz, tgt_valid,
    observed_total, *, sensor_resolution: float, interpret: bool = False,
    cloud_lab=None, tgt_lab=None, color_distance_threshold: float = 15.0,
    use_color: bool = False,
    cloud_tri_id=None, model_ids=None, bank_lab8=None,
    cloud_explain_only=None,
) -> "CostOutput":
    """Cost via the fused Pallas NN+count kernel. Depth-only (types 0/2)
    by default; with use_color the CIEDE2000 gate runs fused in-kernel
    (types 1/3) so the colour cost is available at the perf defaults.
    Colour inputs are CIELAB (convert once per bank/scene, not per
    batch — see scorer.py). With cloud_tri_id/model_ids/bank_lab8, the
    rendered colours are recovered in-kernel from the face table instead
    of gathered per batch (the fast path; needs pixel==point order)."""
    if use_color and cloud_tri_id is not None:
        from perception_tpu.ops.pallas_cost import nn_cost_fused_color_tri_pallas

        point_num, unexplained, explained = nn_cost_fused_color_tri_pallas(
            cloud_xyz, cloud_valid, cloud_tri_id, model_ids, bank_lab8,
            tgt_xyz, tgt_valid, tgt_lab,
            sensor_resolution=sensor_resolution,
            color_distance_threshold=color_distance_threshold,
            interpret=interpret, cloud_explain_only=cloud_explain_only)
    elif use_color:
        from perception_tpu.ops.pallas_cost import nn_cost_fused_color_pallas

        point_num, unexplained, explained = nn_cost_fused_color_pallas(
            cloud_xyz, cloud_valid, cloud_lab, tgt_xyz, tgt_valid, tgt_lab,
            sensor_resolution=sensor_resolution,
            color_distance_threshold=color_distance_threshold,
            interpret=interpret, cloud_explain_only=cloud_explain_only)
    else:
        from perception_tpu.ops.pallas_cost import nn_cost_fused_pallas

        point_num, unexplained, explained = nn_cost_fused_pallas(
            cloud_xyz, cloud_valid, tgt_xyz, tgt_valid,
            sensor_resolution=sensor_resolution, interpret=interpret,
            cloud_explain_only=cloud_explain_only)
    occluded = pose_occluded.astype(bool)
    point_num = jnp.where(occluded, 0.0, point_num)
    unexplained = jnp.where(occluded, 0.0, unexplained)
    explained = jnp.where(occluded, 0.0, explained)
    return normalize_costs(unexplained, point_num, explained,
                           observed_total, occluded)


class CostOutput(NamedTuple):
    rendered_cost: jax.Array     # [N] float32, % unexplained rendered (-1 invalid)
    observed_cost: jax.Array     # [N] float32, % unexplained observed
    points_diff_cost: jax.Array  # [N] float32, rendered_explained - observed_explained
    pose_point_num: jax.Array    # [N] float32 rendered points per pose
    observed_explained: jax.Array  # [N] float32


@functools.partial(jax.jit, static_argnames=("cost_type",))
def compute_costs(
    knn_dist_sq: jax.Array,      # [N, P] squared distance to observed NN
    knn_idx: jax.Array,          # [N, P] index into the pose's observed segment
    cloud_valid: jax.Array,      # [N, P] rendered-point validity
    pose_occluded: jax.Array,    # [N] int32
    rendered_rgb: jax.Array,     # [N, P, 3]
    observed_rgb: jax.Array,     # [N, S, 3] per-pose observed segment colours
    observed_total: jax.Array,   # [N] float32 total observed points for pose
    *,
    sensor_resolution: float,    # metres (unsquared; squared here as renderer.cu:1877)
    color_distance_threshold: float = 15.0,
    cost_type: int = COST_TYPE_6DOF,
    cloud_explain_only: jax.Array | None = None,  # [N, P] aug-point mask:
                                  # True rows may explain observed points but
                                  # never count toward point_num/rendered
                                  # cost (and bypass the colour gate) —
                                  # cost_cloud="transform" hole filling
) -> CostOutput:
    n, p = knn_dist_sq.shape
    s = observed_rgb.shape[1]
    thresh_sq = sensor_resolution * sensor_resolution

    occluded = pose_occluded.astype(bool)
    active = cloud_valid & ~occluded[:, None]
    if cloud_explain_only is None:
        counted = active
        aug = None
    else:
        counted = active & ~cloud_explain_only
        aug = cloud_explain_only
    far = knn_dist_sq > thresh_sq

    if cost_type in (COST_TYPE_3DOF_RGBD, COST_TYPE_6DOF_RGB):
        nn_rgb = jnp.take_along_axis(observed_rgb, knn_idx[..., None], axis=1)
        cdist = ciede2000(rgb_to_lab(nn_rgb), rgb_to_lab(rendered_rgb))
        color_bad = cdist > color_distance_threshold
        unexplained = counted & (far | (~far & color_bad))
        explains = active & ~far & ~color_bad
        if aug is not None:
            explains = explains | (active & ~far & aug)
    else:
        unexplained = counted & far
        explains = active & ~far

    raw_rendered = unexplained.sum(axis=1).astype(jnp.float32)
    pose_point_num = counted.sum(axis=1).astype(jnp.float32)

    # Observed-explained matrix [N, S] via batched scatter-max
    # (replaces cuda_observed_explained writes, cuh:238-268).
    def scatter_one(idx, mark):
        return jnp.zeros((s,), jnp.float32).at[idx].max(mark.astype(jnp.float32))

    explained_mat = jax.vmap(scatter_one)(knn_idx, explains)
    observed_explained = explained_mat.sum(axis=1)

    return normalize_costs(raw_rendered, pose_point_num, observed_explained,
                           observed_total, occluded)
